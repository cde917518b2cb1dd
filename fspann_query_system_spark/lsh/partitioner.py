"""Greedy block partitioning of sorted code keys (reference
``index/.../GreedyPartitioner.java:37-76``).

Per (table, division): sort codes by (code_key, id) and chunk into blocks
of ``block_size`` consecutive rows.  Each block becomes one routing
partition with inclusive [min_key, max_key] bounds, a center key, and a
representative code — the code of the middle element
(mid = i + ((end-i-1) >> 1), reference ``GreedyPartitioner.java:60-71``).

Deviation from the reference: the reference sorts by key only (unstable
for equal keys); we tie-break by id so block membership is deterministic
across runs/engines.

Spark layout: instead of materializing per-partition id lists (reference
``Partition.ids``), the id→partition assignment stays distributed as a
``part_idx`` column on the codes table, and the per-partition *bounds*
form a tiny separate table (N/block rows) that is broadcast at query
time.  This is the layout that scales: the bounds table for 1B vectors is
~16M rows ≈ a few hundred MB, still driver-collectable per (table,
division); beyond that, routing becomes a bucketed range join.

Scale path: the global per-(table, division) rank is computed in TWO
passes so no single task ever sees a whole group — (1) range-partition
by the full sort key and rank *locally* inside each range slice (the
window's partition key includes the slice id, so every slice ranks in
parallel), (2) add per-(slice, table, division) start offsets computed
from a tiny count aggregate (≤ slices × L × D rows, driver-collected
and broadcast-joined).  Slice ordering follows range ordering, so
``offset + local_rank`` is exactly the global sort rank — this is the
standard distributed ranking scheme (zipWithIndex's plan, kept in the
DataFrame API).  A 10^9-code group costs two shuffles of the codes
table and never a hot task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_rank(codes: DataFrame, id_col: str) -> DataFrame:
    """Add ``rn``: 0-based rank of each row within its (table, division)
    group under ORDER BY (code_key, id) — no single-task window."""
    spark = codes.sparkSession
    # slice count: full shuffle parallelism at scale, but no more slices
    # than the input has partitions (each extra slice is sampling + task
    # overhead with nothing to parallelize)
    n_slices = min(int(spark.conf.get("spark.sql.shuffle.partitions")),
                   max(4, codes.rdd.getNumPartitions()))
    sliced = (codes
              .repartitionByRange(n_slices, "table", "division",
                                  "code_key", id_col)
              .withColumn("_slice", F.spark_partition_id()))
    w_local = (Window.partitionBy("_slice", "table", "division")
               .orderBy("code_key", id_col))
    # persist BEFORE the counts job: _slice comes from the physical
    # partitioning, so downstream reads must see the same materialization
    # the offsets were computed from (a re-planned recompute could slice
    # differently and silently skew every rank)
    local = (sliced.withColumn("_lrn", F.row_number().over(w_local) - F.lit(1))
             .persist())
    counts = (local.groupBy("_slice", "table", "division").count()
              .collect())
    offsets, running = [], {}
    for r in sorted(counts, key=lambda r: (r.table, r.division, r._slice)):
        td = (r.table, r.division)
        offsets.append((r._slice, r.table, r.division, running.get(td, 0)))
        running[td] = running.get(td, 0) + r["count"]
    off_df = codes.sparkSession.createDataFrame(
        offsets, "_slice INT, table INT, division INT, _off LONG")
    return (local.join(F.broadcast(off_df), on=["_slice", "table", "division"])
            .withColumn("rn", F.col("_lrn") + F.col("_off"))
            .drop("_slice", "_lrn", "_off"))


#: below this many code rows the two-pass ranking's extra jobs (range
#: sampling + counts collect) cost more than the single-task window saves
DISTRIBUTED_RANK_THRESHOLD = 2_000_000


def build_partitions(codes: DataFrame, block_size: int = 64,
                     id_col: str = "id",
                     n_codes: int | None = None) -> tuple[DataFrame, DataFrame]:
    """codes(id, table, division, code_key, code_bits) →
    (codes_with_part, bounds).

    codes_with_part adds ``part_idx``; bounds has one row per (table,
    division, part_idx): min_key, max_key, center_key, rep_bits, n_ids.

    ``n_codes`` is an optional row-count hint: when given and small, the
    rank is one window (fewer jobs); when absent or large, the two-pass
    distributed ranking runs — the safe default at scale.
    """
    if n_codes is not None and n_codes <= DISTRIBUTED_RANK_THRESHOLD:
        w = Window.partitionBy("table", "division").orderBy("code_key", id_col)
        ranked = codes.withColumn("rn", F.row_number().over(w) - F.lit(1))
    else:
        ranked = _global_rank(codes, id_col)
    with_part = ranked.withColumn(
        "part_idx", (F.col("rn") / F.lit(block_size)).cast("int"))

    agg = with_part.groupBy("table", "division", "part_idx").agg(
        F.min("code_key").alias("min_key"),
        F.max("code_key").alias("max_key"),
        F.count("*").alias("n_ids"),
        F.min("rn").alias("_first_rn"),
    )
    # representative element: mid = first + ((n-1) >> 1)
    mid = agg.withColumn(
        "_mid_rn",
        F.col("_first_rn") + F.floor((F.col("n_ids") - 1) / 2).cast("long"))
    # bounds-sized side of the rep join: broadcast it explicitly while it
    # fits (N/block rows — 312k at 10M/b512 ≈ 12 MB, just past the 10 MB
    # auto threshold, where Spark would otherwise SORT the full codes
    # table for a sort-merge join); past ~5M bounds rows fall back to
    # the shuffled join a >1B-vector build genuinely needs
    n_bounds_est = (n_codes // block_size) if n_codes else None
    if n_bounds_est is not None and n_bounds_est <= 5_000_000:
        mid = F.broadcast(mid)
    reps = with_part.select(
        "table", "division", "rn",
        F.col("code_key").alias("center_key"),
        F.col("code_bits").alias("rep_bits"))
    bounds = (
        mid.join(reps, on=[mid.table == reps.table,
                           mid.division == reps.division,
                           mid._mid_rn == reps.rn], how="inner")
        .select(mid.table, mid.division, "part_idx", "min_key", "max_key",
                "center_key", "rep_bits", "n_ids")
    )
    return with_part.drop("rn"), bounds
