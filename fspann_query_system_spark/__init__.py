"""fspann_query_system_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the fspann-query-system reference
(forward-secure approximate-nearest-neighbour retrieval), re-expressed
Spark-first: DataFrame/SQL plans, Arrow-vectorized UDF kernels, broadcast
routing tables, and range-partitioned index layouts.

Subpackages
-----------
- ``lsh``       : LSH parameter families, bit-interleaved coding, greedy
                  block partitioning (reference ``index/`` module).
- ``index``     : index build orchestration — codes + partition-bounds
                  tables (reference ``PartitionedIndexService``).
- ``query``     : exact-KNN oracle, batched ANN query pipeline, evaluation
                  metrics (reference ``query/`` + ``GroundtruthPrecompute``).
- ``crypto``    : AES-GCM record encryption, versioned key management,
                  selective re-encryption (reference ``crypto/`` +
                  ``keymanagement/``).
- ``sources``   : fvecs/bvecs/ivecs/csv vector file formats (reference
                  ``loader/`` module).
- ``functions`` : scalar/vector kernels — distances, hamming, text analysis.
- ``ops``       : large-scale training-data operators beyond the reference —
                  dedup (exact / minhash / simhash / jaccard), similarity
                  search, multimodal column plumbing.
- ``streaming`` : structured-streaming ingestion with rotation hooks
                  (reference micro-batch ingest).
"""

__version__ = "0.1.0"
