"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock of the headline suite (sum of per-query times).

Queries whose first run lands under MEDIAN3_CUTOFF_SEC are re-run twice
and report the median of 3: single-shot timings at sub-second scale move
±20-50% run-to-run (JVM/GC), which would swamp real regressions; long
queries stay single-shot to bound total wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
# python workers must also see the package regardless of the launch cwd
os.environ["PYTHONPATH"] = "/root/repo" + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")

from fspann_query_system_spark.session import get_spark          # noqa: E402
from fspann_query_system_spark import workloads                  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "top_orders_per_customer",
    "sessionization",
    "asof_enrich",
    "session_attribution",
    "event_window_agg",
    "doc_stats",
    "doc_quantiles",
    "repetition_stats",
    "decontaminate",
    "dsir_weights",
    "bloom_decontaminate",
    "dsir_sample",
    "bm25_scores",
    "hybrid_retrieval",
    "vocab_topk",
    "vocab_topk_salted",
    "unigram_logprob",
    "bigram_logprob",
    "source_kl",
    "chunk_docs",
    "embedding_dim_stats",
    "vocab_overlap",
    "zipf_fit",
    "cardinality_kmv",
    "cms_heavy_hitters",
    "tfidf_topk",
    "edit_near_dups",
    "corpus_mix",
    "sequence_pack",
    "shard_assign",
    "token_budget_mix",
    "minhash",
    "jaccard_pairs",
    "containment_pairs",
    "pii_scrub",
    "simhash",
    "knn_exact",
    "cosine_topk",
    "lsh_codes",
    "lsh_partition_bounds",
    "ann_search",
    "ann_search_selective",
    "ann_search_filtered",
    "dedup_exact",
    "dup_census",
    "winnow_fingerprints",
    "minhash_bands",
    "dedup_clusters",
    "near_dup_pipeline",
    "span_dedup",
    "near_dup_embedding",
    "semantic_decontaminate",
    "near_dup_lsh",
    "near_dup_key",
    "incremental_dedup",
    "reservoir_sample",
    "boilerplate_stats",
    "temperature_mix",
    "gopher_filter",
    "kmeans_centroids",
    "cluster_sample",
    "sq8_quantize",
    "sq8_ann",
    "bq_ann",
    "pq_codebook",
    "pq_ann",
    "ivfpq_ann",
    "ivfpq_residual_ann",
    "ivfbq_ann",
    "ivfbq_sq8_ann",
    "ivfbq_sq8_adaptive",
    "knn_join",
    "knn_join_adaptive",
    "knn_join_incremental",
    "knn_join_sq8",
    "knn_join_sq8_adaptive",
    "label_propagation",
    "hard_negatives",
    "pagerank",
    "mutual_knn",
    "jl_project",
    "jl_ann",
    "graph_coreset",
    "ivf_ann",
    "version_census",
    "streaming_window_agg",
    "streaming_sessionization",
    "streaming_dedup",
    "streaming_minhash",
    "streaming_decontaminate",
]

# below this first-run time, re-run twice and take the median of 3.
# 6 s covers the 2-6 s band (CC loops, index builds, multi-job pipelines)
# that showed the largest single-shot run-to-run swings (±60% between
# same-code suite runs); queries above it are long enough that jitter is
# proportionally small, and re-running them would double total wall.
MEDIAN3_CUTOFF_SEC = 6.0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("fspann-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM, parquet reader, and python workers so per-query times
    # measure the queries, not interpreter/worker startup
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").schema  # footer + listing
    workloads.load_events(spark, f"{sf_dir}/events.parquet").schema  # ts-tolerant
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    import pandas as _pd  # noqa: F401
    (spark.range(100).mapInPandas(lambda it: it, schema="id LONG").count())
    # warm the heavy kernel shapes once at sf0.001 (coding pandas-UDF,
    # routing, search pipeline): per-query times then measure the query,
    # not the first-invocation python-worker/JIT spin-up.  This does NOT
    # cache any sf-dir-under-test state — params/index caches are keyed
    # by sf_dir, so the timed queries still do their full work once.
    warm_sf = "/root/testdata/sf0.001"
    for wq in ("lsh_codes", "ann_search"):
        workloads.QUERIES[wq](spark, warm_sf).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = workloads.QUERIES[name]

        def one_run():
            t0 = time.time()
            n = fn(spark, sf_dir).count()   # full materialization
            return time.time() - t0, n
        # JVM hygiene OUTSIDE the timed region: reclaim shuffle files,
        # broadcast and localCheckpoint blocks accumulated by earlier
        # queries (ContextCleaner only acts on driver GC, which Python
        # rarely triggers) so late-suite queries don't pay earlier
        # queries' garbage debt — observed as 2-3x inflation of the
        # last third of the suite relative to fresh-session runs.
        spark.sparkContext._jvm.System.gc()
        t, n = one_run()
        samples = [t]
        if t < MEDIAN3_CUTOFF_SEC:
            samples += [one_run()[0], one_run()[0]]
        times[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"# {name}: {times[name]}s ({n} rows, {len(samples)} runs)",
              file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
