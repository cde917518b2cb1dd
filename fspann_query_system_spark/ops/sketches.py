"""Mergeable sketch operators (beyond the reference -- SURVEY build
mandate: large-scale pipeline statistics).

KMV (k-minimum-values) cardinality sketch, Bar-Yossef et al. 2002 /
Beyer et al. SIGMOD'07: keep the k smallest values of a uniform hash of
the distinct items; with t_k = the k-th smallest hash mapped into
(0, 1), the unbiased distinct-count estimate is (k - 1) / t_k.

Why KMV and not HyperLogLog here: Spark's ``approx_count_distinct``
and DuckDB's HLL are different sketch implementations, so their
estimates can never hash-match in a cross-engine oracle.  KMV over a
DETERMINISTIC hash (md5) is engine-independent arithmetic -- the same
k-th order statistic and the same estimate to the last bit on both
sides -- so the registry entry gets a FULL oracle, while keeping the
property that makes sketches matter at 100 TB: per-partition k-min
sets merge by union+truncate (a map-side partial aggregate).

Scale shape: hash is map-side; the per-group k-th order statistic runs
as one (group, hash)-keyed distinct (combiner-friendly, the same
shuffle any exact-distinct needs) followed by a per-group window over
at most the distinct set.  For unbounded groups swap the window for a
partial top-k aggregate; group count here is small (per-source
corpus stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

# fraction of the hash space covered by the first 15 hex digits
_HEX15_SPACE = float(16 ** 15)


def kmv_cardinality(docs: DataFrame, group_col: str = "source",
                    text_col: str = "text", k: int = 64) -> DataFrame:
    """Per-group distinct-token cardinality: exact count + KMV estimate.

    Output: (group, n_distinct_exact, kmv_estimate).  When a group has
    fewer than ``k`` distinct tokens the sketch is exact by definition
    and the estimate equals the count.

    The estimate is deterministic: md5 is the hash, the first 15 hex
    digits (60 bits) map the k-th smallest hash into (0, 1), and
    (k - 1) / t_k is plain double arithmetic -- identical in any
    engine, hence fully oracle-checkable.
    """
    toks = (docs.select(F.col(group_col).alias("grp"),
                        F.explode(T.tokens(text_col)).alias("tok"))
            .distinct())
    hashed = toks.select("grp", F.md5("tok").alias("h"))
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    per_grp = (ranked.groupBy("grp")
               .agg(F.count(F.lit(1)).alias("n_distinct_exact"),
                    F.min(F.when(F.col("rn") == k, F.col("h")))
                     .alias("kth_hash")))
    t_k = (F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast("double")
           / F.lit(_HEX15_SPACE))
    return per_grp.select(
        F.col("grp").alias(group_col),
        "n_distinct_exact",
        F.round(
            F.when(F.col("kth_hash").isNull(),
                   F.col("n_distinct_exact").cast("double"))
            .otherwise(F.lit(float(k - 1)) / t_k),
            4).alias("kmv_estimate"))
