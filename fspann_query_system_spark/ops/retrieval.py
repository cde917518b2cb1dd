"""Retrieval-stack composition operators (beyond the reference --
SURVEY build mandate: the search side of a training-data/RAG pipeline).

The engine already ships both retrieval families -- lexical
(``ops.quality.bm25_topk``, the inverted-index posting join) and
vector (``ops.similarity.cosine_topk`` / the LSH/IVF ANN tiers).
Production search stacks run BOTH and fuse the rankings; reciprocal-
rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
score-free fusion: it needs only each list's RANKS, so it composes
rankers with incomparable score scales (BM25 logs vs cosines) without
calibration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(*rankings: DataFrame, k: int = 10, c: int = 60,
             q_col: str = "q_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion of per-query rankings:

        rrf(q, d) = sum over lists L of 1 / (c + rank_L(q, d))

    with ``c = 60`` (the paper's constant).  Documents absent from a
    list contribute nothing for it -- the union-outer-join semantics
    every RRF implementation uses.

    Each input must carry (q_col, id_col, rank_col); pass e.g.
    ``bm25_topk(...)`` and a renamed ``cosine_topk(...)``.

    Output: (q_id, doc_id, n_lists, rrf, rank <= k), rank by
    (rrf desc, doc_id) -- fully deterministic, and pure rank
    arithmetic, so the fusion is engine-portable to the last bit.

    Scale shape: inputs are already top-k-bounded per query (each
    ranker's WindowGroupLimit did the heavy lifting), so the union
    carries O(queries x k x lists) skinny rows; one (q, d)-keyed agg
    with map-side combine and one per-query rank window.  The fusion
    itself never touches the corpus.
    """
    parts = [r.select(F.col(q_col).alias("q_id"),
                      F.col(id_col).alias("doc_id"),
                      (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col)
                                     .cast("double"))).alias("_s"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = (u.groupBy("q_id", "doc_id")
           .agg(F.count(F.lit(1)).cast("int").alias("n_lists"),
                F.round(F.sum("_s"), 6).alias("rrf")))
    w = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(),
                                           F.col("doc_id").asc())
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
