"""Corpus-assembly operators for training-data pipelines (beyond-
reference mandate): deterministic stratified sampling (data-mixing
ratios) and sequence packing (context-window assembly).

Both are engine-portable by construction — the sampling decision is a
pure hash of the row key and the packing is a deterministic prefix sum —
so train/test splits and pack layouts are exactly reproducible across
runs, engines, and cluster sizes (Bernoulli ``df.sample``/``sampleBy``
give none of these guarantees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_DENOM = 10_000


def sample_bucket(key, salt: str = "") -> "F.Column":
    """Deterministic per-row bucket in [0, SAMPLE_DENOM): first 15 md5
    hex chars of salt||key as a BIGINT, mod the denominator.  Pure
    function of the key → identical in ANSI SQL
    (``('0x' || substr(md5(..), 1, 15))::BIGINT % denom``)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % SAMPLE_DENOM)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's
    rate — the data-mixing step of corpus assembly ("20% of web, all of
    books"), entirely map-side (no shuffle, no RNG state), stable under
    re-runs and appends: a row's fate depends only on (salt, key).
    ``salt`` derives independent samples (e.g. train vs holdout)."""
    expr = F.lit(int(round(default_rate * SAMPLE_DENOM)))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == stratum,
                      F.lit(int(round(rate * SAMPLE_DENOM)))).otherwise(expr)
    return df.filter(sample_bucket(F.col(key_col), salt) < expr)


def pack_sequences(df: DataFrame, size_col: str = "n_chars",
                   id_col: str = "doc_id", by: str = "source",
                   window: int = 2048) -> DataFrame:
    """Sequence packing: concatenate documents in deterministic
    (by, id) order and split at fixed ``window`` boundaries — the
    context-window assembly step of a pretraining pipeline (documents
    straddling a boundary are split, exactly like concat-and-chunk
    training data).  → one row per doc: (by, id, size, pack_id,
    pack_offset), where pack_id is the window the document STARTS in.

    Plan: one cumulative-sum window per ``by`` group.  A prefix sum is
    the same two-pass distributed-ranking problem the LSH partitioner
    solves (``lsh/partitioner.py:_global_rank``: per-slice partials +
    broadcast carry-ins); groups bigger than one task's comfort should
    route through that scheme — the native window here is the
    oracle-checkable spec."""
    w = Window.partitionBy(by).orderBy(id_col)
    cum = F.sum(size_col).over(w)
    off = (cum - F.col(size_col)).alias("pack_offset_global")
    return (df.select(F.col(by), F.col(id_col), F.col(size_col),
                      off)
            .withColumn("pack_id",
                        F.floor(F.col("pack_offset_global") / window))
            .withColumn("pack_offset",
                        F.col("pack_offset_global") % window)
            .drop("pack_offset_global"))
