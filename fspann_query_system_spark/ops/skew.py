"""Skew-mitigation utilities: salted aggregation and salted broadcast-side
replication join.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``) handles
sort-merge joins automatically; these helpers cover the cases AQE does not:
- hot-key *aggregation* (one reducer drowns): two-phase salted agg;
- hot-key *join against a medium dim* (too big to broadcast whole, too
  skewed to shuffle): replicate the dim rows per salt bucket.

Both are plan-shape transforms over public DataFrame ops — no state, no
UDFs — so they compose with Catalyst (filters still push through the
pre-aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that distribute over a two-phase (partial → final) rewrite:
# final(expr) applied to the column of partials.  count re-aggregates with
# sum; min/max/sum are idempotent under re-application.
_REAGG = {
    "sum": F.sum,
    "count": lambda c: F.sum(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation with a random salt: phase 1 groups on
    (keys + salt) so a hot key spreads over ``n_salts`` reducers; phase 2
    merges the partials on the true keys.

    ``aggs`` maps output column → (op, input column), op in
    {sum, count, min, max}.  avg is deliberately absent: express it as
    sum/count at the call site (the two-phase rewrite of avg needs a
    weighted merge, which is exactly sum/count anyway).

    At 100TB this is the difference between a 5-minute stage and a
    one-straggler hour when e.g. one document fingerprint or one LSH
    bucket holds 1% of all rows."""
    for op, _ in aggs.values():
        if op not in _REAGG:
            raise ValueError(f"unsupported op {op!r}; use {sorted(_REAGG)}")
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(*[
        (F.count("*") if op == "count" and col == "*"
         else getattr(F, op)(col)).alias(out)
        for out, (op, col) in aggs.items()])
    return phase1.groupBy(*keys).agg(*[
        _REAGG[op](out).alias(out) for out, (op, col) in aggs.items()])


def salted_join(big: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skewed equi-join: salt the big side randomly, replicate every dim
    row across all ``n_salts`` buckets, join on (key, salt).  Each hot-key
    partition now holds 1/n of the hot rows.  The dim side is inflated
    n_salts× — use only when broadcast is impossible and AQE skew-split
    doesn't apply (e.g. the dim arrives pre-shuffled from an upstream agg).
    """
    salts = dim.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn("_salt", (F.rand(seed=11) * n_salts).cast("int"))
    dim_s = dim.crossJoin(salts)
    return big_s.join(dim_s, on=[on, "_salt"], how=how).drop("_salt")


def explain_shuffles(df: DataFrame) -> int:
    """Count exchange operators in the physical plan (test/diagnostic aid:
    assert an optimization actually removed a shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
