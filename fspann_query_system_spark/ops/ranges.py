"""Interval containment join at scale (beyond-reference mandate op).

``point BETWEEN start AND end`` predicates make Spark fall back to a
BroadcastNestedLoopJoin (or a cartesian product) — a scan of every
interval per point.  The scale-correct shape is *time binning*: each
interval explodes map-side into the fixed-width bins it overlaps, points
compute their single bin, and the match becomes a plain equi-join on
(by-key, bin) followed by the exact containment filter.

Cost model: intervals add ``ceil(width / bin_width) + 1`` rows each;
every point joins through exactly ONE bin, so a (point, interval)
containment pair appears exactly once — no post-join dedup.  Pick
``bin_width`` near the typical interval width: shuffle volume is then
~2x the input rows, vs the |points| x |intervals| product of the naive
plan.  Skewed bins (a hot hour) are ordinary equi-join skew — AQE
handles them; the nested-loop plan has no such escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str = "t", start_col: str = "start",
               end_col: str = "end", by: str | None = None,
               bin_width: int = 3600_000_000) -> DataFrame:
    """Inner containment join → every (point row × containing interval
    row), each pair exactly once.  ``point_col``/``start_col``/
    ``end_col`` are integer-comparable (e.g. epoch micros); bounds are
    inclusive.  ``by`` optionally co-keys the join (e.g. user_id)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    bw = F.lit(int(bin_width))
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(start_col) / bw),
            F.floor(F.col(end_col) / bw))))
    pt = points.withColumn("_bin", F.floor(F.col(point_col) / bw))
    keys = ["_bin"] if by is None else [by, "_bin"]
    return (pt.join(iv, on=keys)
            .filter(F.col(point_col).between(F.col(start_col),
                                             F.col(end_col)))
            .drop("_bin"))
