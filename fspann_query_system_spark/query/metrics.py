"""Evaluation metrics (reference
``ForwardSecureANNSystem.computeMetricsAtK:770-835``,
``query/.../Aggregates.fromProfiler:50-147``).

All metrics are set-at-a-time DataFrame aggregations:
- recall@K (A6/J3): |GT_topK ∩ returned| / K via array_intersect.
- distance-ratio@K (A5): avg_j(d(q, ann_j) / d(q, gt_j)) positionally,
  only counted when all K terms are valid (gt distance > 0).
- candidate-expansion stats (A7) from the pipeline's candidate counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _results_as_arrays(results: DataFrame, k: int) -> DataFrame:
    """(q_id, id, distance, rank) → (q_id, result_ids, result_dists),
    arrays in rank order, truncated to k."""
    return (results.filter(F.col("rank") <= k)
            .groupBy("q_id")
            .agg(F.sort_array(F.collect_list(F.struct("rank", "id", "distance"))).alias("_s"))
            .select(
                "q_id",
                F.transform("_s", lambda s: s["id"]).alias("result_ids"),
                F.transform("_s", lambda s: s["distance"]).alias("result_dists")))


def recall_at_k(results: DataFrame, groundtruth: DataFrame, k: int) -> DataFrame:
    """(q_id, recall) — groundtruth is (q_id, neighbor_ids) ascending."""
    res = _results_as_arrays(results, k)
    gt = groundtruth.select(
        "q_id", F.slice("neighbor_ids", 1, k).alias("gt_ids"))
    return (res.join(gt, on="q_id")
            .select("q_id",
                    (F.size(F.array_intersect(
                        F.col("result_ids").cast("array<long>"),
                        F.col("gt_ids").cast("array<long>")))
                     / F.lit(k)).alias("recall")))


def distance_ratio_at_k(results: DataFrame, gt_dists: DataFrame, k: int) -> DataFrame:
    """(q_id, ratio).  gt_dists is (q_id, gt_dist_array) ascending true
    distances.  Ratio is positional: avg(ann_dist_j / gt_dist_j), null
    unless all k terms are finite and gt > 0 (reference guard at
    ``computeMetricsAtK:796-821``)."""
    res = _results_as_arrays(results, k)
    j = res.join(gt_dists.select("q_id", F.slice("gt_dist_array", 1, k).alias("_g")), "q_id")
    zipped = j.select(
        "q_id",
        F.zip_with(F.slice("result_dists", 1, k), "_g",
                   lambda a, g: F.when(g > 0, a / g)).alias("_terms"))
    return zipped.select(
        "q_id",
        F.when(F.size(F.filter("_terms", lambda t: t.isNotNull())) == k,
               F.aggregate("_terms", F.lit(0.0), lambda acc, t: acc + t) / k)
        .alias("ratio"))


def evaluate(results: DataFrame, base: DataFrame, queries: DataFrame,
             ks: list[int]) -> DataFrame:
    """Headline per-K averages (A4): computes exact GT in-engine (J5) and
    returns one row per K: (k, avg_recall, avg_ratio, n_queries)."""
    from .exact import knn_exact
    kmax = max(ks)
    gt = knn_exact(base, queries, k=kmax)
    gt_arrays = (gt.groupBy("q_id")
                 .agg(F.sort_array(F.collect_list(F.struct("rank", "id", "distance"))).alias("_s"))
                 .select("q_id",
                         F.transform("_s", lambda s: s["id"]).alias("neighbor_ids"),
                         F.transform("_s", lambda s: s["distance"]).alias("gt_dist_array"))
                 ).persist()
    out = None
    for k in ks:
        r = recall_at_k(results, gt_arrays.select("q_id", "neighbor_ids"), k)
        ratio = distance_ratio_at_k(results, gt_arrays.select("q_id", "gt_dist_array"), k)
        row = (r.join(ratio, "q_id")
               .agg(F.lit(k).alias("k"),
                    F.avg("recall").alias("avg_recall"),
                    F.avg("ratio").alias("avg_ratio"),
                    F.count("*").alias("n_queries")))
        out = row if out is None else out.unionByName(row)
    return out
