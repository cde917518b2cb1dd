"""Point-in-time-correct as-of join (beyond-reference mandate op: the
enrichment join feature pipelines need that Spark lacks natively).

For each left row, attach the LAST right row with ``right.on <= left.on``
(per ``by`` key; ``direction="forward"`` flips to the first right row
at-or-after).  This is the point-in-time-correct state lookup of feature
engineering — "the user's most recent click before this purchase" — where
a plain range join would both explode (left × all earlier rights) and
leak future state.

100TB shape — the sort-merge "union trick", same family as the engine's
internal distributed as-of routing (``query/ann.py:_route_probes_join``):
tag both sides, ONE shuffle on the by-key, one ordered window pass
carrying the last right payload forward.  No range-join product, no
per-row probe, no driver state; skewed by-keys are one window partition
(AQE-splittable at the exchange, single-pass within).

Determinism: rows order by (ts, side, right-payload); at equal
timestamps the right row sorts before the left (inclusive semantics) and
duplicate right timestamps resolve to the greatest payload tuple.  For
oracle-grade determinism keep the right side unique per (by, on) —
pre-aggregate upstream (the registry workload does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", value_cols: list[str] | None = None,
              suffix: str = "_right",
              direction: str = "backward") -> DataFrame:
    """Left as-of join → all left columns + each right value column
    (suffixed on collision) + ``{on}{suffix}`` (the matched right
    timestamp; NULL where no right row qualifies)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', "
                         f"got {direction!r}")
    value_cols = value_cols or [c for c in right.columns
                                if c not in (on, by)]
    rv = F.struct(F.col(on).alias("_rts"),
                  *[F.col(c) for c in value_cols])
    r = right.select(F.col(by).alias("_by"), F.col(on).alias("_ts"),
                     rv.alias("_rv"), F.lit(0).alias("_side"),
                     F.lit(None).cast(
                         left.select(F.struct(*left.columns).alias("s"))
                         .schema["s"].dataType.simpleString()).alias("_lv"))
    l = left.select(F.col(by).alias("_by"), F.col(on).alias("_ts"),
                    F.lit(None).cast(
                        right.select(rv.alias("s"))
                        .schema["s"].dataType.simpleString()).alias("_rv"),
                    F.lit(1).alias("_side"),
                    F.struct(*left.columns).alias("_lv"))
    u = r.unionByName(l, allowMissingColumns=False)
    ts_key = F.col("_ts").asc() if direction == "backward" \
        else F.col("_ts").desc()
    w = (Window.partitionBy("_by")
         .orderBy(ts_key, F.col("_side").asc(), F.col("_rv").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("_c", F.last("_rv", ignorenulls=True).over(w))
    out_left = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    taken = set(left.columns)
    out_right = []
    for c in value_cols:
        name = c + suffix if c in taken else c
        out_right.append(F.col(f"_c.{c}").alias(name))
    matched_ts = F.col("_c._rts").alias(on + suffix)
    return (carried.filter(F.col("_side") == 1)
            .select(*out_left, *out_right, matched_ts))
