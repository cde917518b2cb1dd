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

Scale note: the row_number window below puts each (table, division) group
in a single task.  Fine to ~10^8 codes per group; the two-pass
repartitionByRange + offset variant is the 100TB path (tracked for a
later round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_partitions(codes: DataFrame, block_size: int = 64,
                     id_col: str = "id") -> tuple[DataFrame, DataFrame]:
    """codes(id, table, division, code_key, code_bits) →
    (codes_with_part, bounds).

    codes_with_part adds ``part_idx``; bounds has one row per (table,
    division, part_idx): min_key, max_key, center_key, rep_bits, n_ids.
    """
    w = Window.partitionBy("table", "division").orderBy("code_key", id_col)
    ranked = codes.withColumn("rn", F.row_number().over(w) - F.lit(1))
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
