"""Evaluation profiler + CSV export sinks (reference
``common/.../Profiler.java``, ``query/.../TopKProfiler.java``,
``query/.../Aggregates.fromProfiler:50-147``,
``query/.../EvaluationSummaryPrinter.java`` — S13/A4-A7).

The reference accumulates per-query rows in memory and exports seven CSV
files; here the per-query metric rows are a DataFrame (computed
set-at-a-time by the evaluators) and each sink is a one-line
``coalesce(1).write.csv``."""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exact import knn_exact
from .metrics import recall_at_k, distance_ratio_at_k


def query_metric_rows(results: DataFrame, base: DataFrame, queries: DataFrame,
                      candidates: DataFrame | None, ks: list[int],
                      n_base: int | None = None) -> DataFrame:
    """One row per (q_id, k): recall, ratio, candidate stats (A5-A7).

    candidates: optional (q_id, id, ham) pre-refinement table to derive
    cand_total / expansion factors; n_base enables the scan-fraction
    column (reference SF = cand/N, ``TopKProfiler.recordInternal:141-145``)."""
    kmax = max(ks)
    gt = knn_exact(base, queries, k=kmax)
    gt_arrays = (gt.groupBy("q_id")
                 .agg(F.sort_array(F.collect_list(F.struct("rank", "id", "distance"))).alias("_s"))
                 .select("q_id",
                         F.transform("_s", lambda s: s["id"]).alias("neighbor_ids"),
                         F.transform("_s", lambda s: s["distance"]).alias("gt_dist_array"))
                 ).persist()
    cand_stats = None
    if candidates is not None:
        cand_stats = candidates.groupBy("q_id").agg(
            F.count("*").alias("cand_total"))
    out = None
    for k in ks:
        r = recall_at_k(results, gt_arrays.select("q_id", "neighbor_ids"), k)
        ratio = distance_ratio_at_k(results, gt_arrays.select("q_id", "gt_dist_array"), k)
        returned = (results.filter(F.col("rank") <= k)
                    .groupBy("q_id").agg(F.count("*").alias("returned")))
        row = (r.join(ratio, "q_id").join(returned, "q_id")
               .withColumn("k", F.lit(k)))
        if cand_stats is not None:
            row = (row.join(cand_stats, "q_id", "left")
                   .withColumn("cand_expansion",
                               F.col("cand_total") / F.lit(k)))
            if n_base:
                row = row.withColumn("scan_fraction",
                                     F.col("cand_total") / F.lit(n_base))
        out = row if out is None else out.unionByName(row, allowMissingColumns=True)
    return out


def aggregates(metric_rows: DataFrame) -> DataFrame:
    """A4 headline per-K averages (reference ``Aggregates.fromProfiler``)."""
    aggs = [F.avg("recall").alias("avg_recall"),
            F.avg("ratio").alias("avg_ratio"),
            F.avg("returned").alias("avg_returned"),
            F.count("*").alias("n_queries")]
    if "cand_total" in metric_rows.columns:
        aggs += [F.avg("cand_total").alias("avg_candidates"),
                 F.avg("cand_expansion").alias("avg_expansion")]
    if "scan_fraction" in metric_rows.columns:
        aggs.append(F.avg("scan_fraction").alias("avg_scan_fraction"))
    return metric_rows.groupBy("k").agg(*aggs).orderBy("k")


def stabilization_rows(results: DataFrame,
                       queries: DataFrame | None = None) -> DataFrame:
    """Collapse ``search_batch(..., with_diagnostics=True)`` output into
    the reference's stabilization diagnostic — raw vs final candidate
    counts per query (``QueryServiceImpl.StabilizationCallback
    .accept(rawCount, finalCount)``, ``QueryServiceImpl.java:87-94``;
    exercised by the reference's StabilizationTest/CandidatePipelineTest).

    Output: (q_id, cand_raw, cand_kept, cand_decrypted, returned) —
    candTotal / candKept / candDecrypted / |results| in the reference's
    vocabulary.  The counters ride on result rows, so a query with zero
    returned rows has no row to carry them; pass the query set via
    ``queries`` (any DataFrame with a ``q_id`` column) to left-join it in
    and surface those queries with ``returned = 0`` — the reference
    records counters for every executed search, and zero-result queries
    are exactly the diagnostically interesting case."""
    agg = (results.groupBy("q_id")
           .agg(F.max("_cand_raw").alias("cand_raw"),
                F.max("_cand_kept").alias("cand_kept"),
                F.max("_cand_decrypted").alias("cand_decrypted"),
                F.count(F.lit(1)).alias("returned")))
    if queries is not None:
        agg = (queries.select("q_id").distinct()
               .join(agg, "q_id", "left")
               .fillna(0, subset=["returned"]))
    return agg.orderBy("q_id")


class Profiler:
    """Wall-clock phase timing + sink export (reference ``Profiler`` +
    ``EvaluationSummaryPrinter``)."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self._t0: dict[str, float] = {}

    def start(self, phase: str):
        self._t0[phase] = time.time()

    def stop(self, phase: str):
        self.phases[phase] = self.phases.get(phase, 0.0) + time.time() - self._t0.pop(phase)

    def export(self, out_dir: str, metric_rows: DataFrame | None = None,
               summary: DataFrame | None = None,
               config_hash: str | None = None,
               accuracy: DataFrame | None = None,
               reencrypt_metrics: dict | None = None,
               retrieved_samples: DataFrame | None = None,
               diagnostics: DataFrame | None = None) -> dict:
        """S13 sinks, one per reference CSV (``Profiler.exportQueryMetricsCsv``,
        ``EvaluationSummaryPrinter``, ``TopKProfiler.export``,
        ``SelectiveReencCoordinator`` reenc CSV):
        query_metrics, summary, accuracy (per-K aggregates), cost
        (phases.csv), reencrypt_metrics, retrieved_samples,
        query_diagnostics, plus metrics_summary.txt with the config hash."""
        os.makedirs(out_dir, exist_ok=True)
        written = {}

        def _sink(df: DataFrame | None, name: str):
            if df is None:
                return
            p = os.path.join(out_dir, name)
            df.coalesce(1).write.mode("overwrite").option("header", True).csv(p)
            written[name] = p

        _sink(metric_rows, "query_metrics")
        _sink(summary, "summary")
        _sink(accuracy, "accuracy")
        _sink(retrieved_samples, "retrieved_samples")
        _sink(diagnostics, "query_diagnostics")
        if reencrypt_metrics is not None:
            p = os.path.join(out_dir, "reencrypt_metrics.csv")
            with open(p, "w") as f:
                f.write("key,value\n")
                for k, v in sorted(reencrypt_metrics.items(), key=lambda kv: str(kv[0])):
                    f.write(f"{k},{v}\n")
            written["reencrypt_metrics"] = p
        with open(os.path.join(out_dir, "phases.csv"), "w") as f:
            f.write("phase,seconds\n")
            for k, v in sorted(self.phases.items()):
                f.write(f"{k},{v:.4f}\n")
        written["phases"] = os.path.join(out_dir, "phases.csv")
        with open(os.path.join(out_dir, "metrics_summary.txt"), "w") as f:
            f.write(f"exported_at={time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
            if config_hash:
                f.write(f"config_sha256={config_hash}\n")
            for k, v in sorted(self.phases.items()):
                f.write(f"phase.{k}={v:.4f}s\n")
        written["metrics_summary"] = os.path.join(out_dir, "metrics_summary.txt")
        return written
