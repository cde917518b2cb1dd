"""Exact K-nearest-neighbour oracle (reference
``api/.../GroundtruthPrecompute.run:218-276`` — per-query full scan with a
bounded heap, ties broken by id).

Two implementations:

- ``knn_exact`` (default): *blocked partial top-k*.  Queries are collected
  to the driver (Q is small by construction — the reference runs 20/1k/10k
  queries against 1M+ base) and broadcast as one numpy matrix; a single
  ``mapInPandas`` pass over the base table emits only the per-batch top-k
  per query (Q*k rows per Arrow batch), and a final per-query window rank
  keeps the global top-k.  The shuffle carries O(Q * k * n_batches) rows
  instead of O(Q * N) — this is the plan that survives 100TB: full scan is
  embarrassingly parallel, no crossJoin materialization, merge cost is
  tiny.

- ``knn_exact_crossjoin``: declarative crossJoin + window variant, kept as
  the plan-shape the SQL oracle mirrors (J5/A3 in SURVEY §2) and as a
  cross-check of the blocked kernel.

Distances are computed in float64 as sqrt(sum((a-b)^2)) — the diff-based
form (not ||a||²+||b||²-2ab) to avoid cancellation error, matching the
reference's scalar loop semantics (``GroundtruthPrecompute.l2sq:144-166``).
Ordering ties break by ascending id (reference ``HeapK:173-188``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.plan import rows_cached


def _topk_window(df: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (df.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))


def knn_exact(base: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "id", vector_col: str = "vector",
              q_id_col: str = "q_id", q_vector_col: str = "vector") -> DataFrame:
    """Blocked exact KNN → (q_id, id, distance, rank), rank 1..k."""
    spark = base.sparkSession
    q_rows = rows_cached(queries, q_id_col, q_vector_col)
    if not q_rows:
        return spark.createDataFrame([], "q_id BIGINT, id BIGINT, distance DOUBLE, rank INT")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)   # (q, d)
    bc = spark.sparkContext.broadcast((q_ids, Q, k))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Q_, k_ = bc.value
        nq = len(q_ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vector_col].to_numpy()])   # (n, d)
            ids = pdf[id_col].to_numpy()
            n = B.shape[0]
            kk = min(k_, n)
            out_q, out_i, out_d = [], [], []
            for qi in range(nq):
                d2 = np.square(B - Q_[qi]).sum(axis=1)             # (n,)
                if kk < n:
                    # tie-inclusive cut: emit EVERY row at the boundary
                    # value, else which duplicate survives would depend
                    # on batch partitioning (downstream (distance, id)
                    # window picks the deterministic winner)
                    kth = np.partition(d2, kk - 1)[kk - 1]
                    part = np.flatnonzero(d2 <= kth)
                else:
                    part = np.arange(n)
                out_q.append(np.full(len(part), q_ids_[qi], dtype=np.int64))
                out_i.append(ids[part])
                out_d.append(np.sqrt(d2[part]))
            yield pd.DataFrame({
                "q_id": np.concatenate(out_q),
                "id": np.concatenate(out_i),
                "distance": np.concatenate(out_d),
            })

    id_type = base.schema[id_col].dataType.simpleString()
    partial = base.select(id_col, vector_col).mapInPandas(
        run, schema=f"q_id BIGINT, id {id_type}, distance DOUBLE")
    return _topk_window(partial, k)


def knn_exact_crossjoin(base: DataFrame, queries: DataFrame, k: int = 10,
                        id_col: str = "id", vector_col: str = "vector",
                        q_id_col: str = "q_id", q_vector_col: str = "vector") -> DataFrame:
    """Declarative crossJoin+window exact KNN (oracle plan shape J5).

    Distance via native zip_with/aggregate expressions — stays in
    whole-stage codegen, no Python in the hot loop.
    """
    q = queries.select(F.col(q_id_col).alias("q_id"),
                       F.col(q_vector_col).alias("_qvec"))
    b = base.select(F.col(id_col).alias("id"), F.col(vector_col).alias("_bvec"))
    d2 = F.aggregate(
        F.zip_with(F.col("_qvec"), F.col("_bvec"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    joined = b.crossJoin(F.broadcast(q)).withColumn("distance", F.sqrt(d2))
    return _topk_window(joined.select("q_id", "id", "distance"), k)


def groundtruth_table(base: DataFrame, queries: DataFrame, k: int = 100) -> DataFrame:
    """(q_id, neighbor_ids ARRAY) in ascending (distance, id) order —
    the ivecs-style GT layout (FIXTURES.md §3)."""
    ranked = knn_exact(base, queries, k=k)
    return (ranked.groupBy("q_id")
            .agg(F.sort_array(F.collect_list(F.struct("rank", "id"))).alias("_s"))
            .select("q_id", F.transform("_s", lambda s: s["id"]).alias("neighbor_ids")))
