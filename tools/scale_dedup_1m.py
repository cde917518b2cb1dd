"""1M-document near-dup dedup measurement (SCALE.md §9).

The text-dedup family's 100 TB story is argued from plan shape
(banding bounds pairs, CC is log-round); this script adds the measured
point: end-to-end `near_dup_pipeline` over a 1M-doc synthetic corpus
with planted near-duplicates — wall time, docs/s, candidate volume,
CC rounds, and planted-pair recall.

Corpus (generated DISTRIBUTED, no driver materialization): every doc is
``n_tokens`` pseudo-random vocabulary words derived from xxhash64 of
(base_id, position).  A ``dup_frac`` fraction of docs are near-dups of a
base doc: same text with the final token replaced by a unique token
(Jaccard over 3-shingles ≈ 0.85 — above the 0.5 verify threshold, below
exact-dup).  Expected outcome: every planted (base, dup) pair lands in
one cluster; keep=0 for the dup side.

Usage: python3 tools/scale_dedup_1m.py [n] [dup_frac]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F                             # noqa: E402

from fspann_query_system_spark.session import get_spark            # noqa: E402
from fspann_query_system_spark.ops.dedup import near_dup_pipeline  # noqa: E402

N_TOKENS = 40
VOCAB = 30_000


def gen_corpus(spark, n: int, dup_frac: float):
    """(doc_id, text) with the last ``dup_frac`` of ids near-duplicating
    base ids 0..n_dups-1.  Pure column expressions — generation scales
    with the cluster like any other map-only stage."""
    n_uniq = int(n * (1 - dup_frac))

    def toks_of(idcol):
        return F.transform(
            F.sequence(F.lit(1), F.lit(N_TOKENS)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.concat_ws(":", idcol.cast("string"),
                                              j.cast("string"))),
                       F.lit(VOCAB))))

    df = spark.range(n).withColumn(
        "base",
        F.when(F.col("id") < n_uniq, F.col("id"))
        .otherwise(F.pmod(F.col("id") - n_uniq, F.lit(n_uniq))))
    toks = toks_of(F.col("base"))
    text = F.when(
        F.col("id") < F.lit(n_uniq), F.concat_ws(" ", toks)
    ).otherwise(
        # near-dup: same text, last token swapped for a unique one
        F.concat_ws(" ", F.concat(
            F.slice(toks, 1, N_TOKENS - 1),
            F.array(F.concat(F.lit("u"), F.col("id"))))))
    return (df.select(F.col("id").alias("doc_id"), text.alias("text"))
            .repartition(32)), n_uniq


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    spark = get_spark("scale-dedup",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs, n_uniq = gen_corpus(spark, n, dup_frac)
    docs = docs.persist()
    t0 = time.time()
    docs.count()
    gen_s = time.time() - t0
    print(f"corpus: {n} docs ({n - n_uniq} planted near-dups), "
          f"generated+persisted in {gen_s:.1f}s", flush=True)

    stats: dict = {}
    t0 = time.time()
    out = near_dup_pipeline(docs, stats=stats)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(1 - F.col("keep")).alias("n_dropped")).first()
    wall = time.time() - t0
    # planted-pair recall: a dup doc is detected iff its canonical is its
    # base id (min of the pair); count dup-side rows labeled keep=0
    detected = (out.filter((F.col("doc_id") >= n_uniq) & (F.col("keep") == 0))
                .count())
    planted = n - n_uniq
    print(json.dumps({
        "metric": "near_dup_pipeline_1m",
        "n_docs": n,
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n / wall),
        "n_candidates": stats.get("n_candidates"),
        "cc_rounds": stats.get("rounds"),
        "rows_out": agg.rows,
        "n_dropped": int(agg.n_dropped),
        "planted_pairs": planted,
        "planted_recall": round(detected / planted, 4) if planted else None,
    }), flush=True)

    # --- edit-distance verify at the same scale: banding blocks, the
    # thresholded Levenshtein kernel verifies candidates only (the
    # kernel_partitions row-balancing makes the verify stage scale with
    # cores instead of shuffle bytes).  A planted dup differs from its
    # base by one swapped trailing token → small positive edit distance.
    from fspann_query_system_spark.ops.dedup import edit_near_dups
    t0 = time.time()
    ed = edit_near_dups(docs, "text", "doc_id",
                        k=3, n_hashes=8, bands=8, max_dist=80)
    ed_agg = ed.agg(F.count(F.lit(1)).alias("pairs"),
                    F.max("edit_distance").alias("max_d"),
                    F.min("edit_distance").alias("min_d")).first()
    ed_wall = time.time() - t0
    print(json.dumps({
        "metric": "edit_near_dups_1m",
        "n_docs": n,
        "wall_sec": round(ed_wall, 1),
        "docs_per_sec": round(n / ed_wall),
        "verified_pairs": ed_agg.pairs,
        "edit_distance_range": [ed_agg.min_d, ed_agg.max_d],
        "planted_pairs": planted,
        "planted_recall": round(ed_agg.pairs / planted, 4) if planted else None,
    }), flush=True)


if __name__ == "__main__":
    main()
