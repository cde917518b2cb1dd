"""1M-document scale measurement for the round-6 text operators
(SCALE.md §9e): ``span_dedup`` (C4 span-granular dedup) and
``gopher_filter`` (composite quality gate).

Reuses the distributed corpus generator from ``scale_dedup_1m``: every
planted near-dup shares all but its final token with its base doc, so
at span_tokens=5 the dup loses ~7 of its 8 spans to the base (all but
the final partial span, which contains the swapped unique token).
Expected outcome: dup docs keep only their final span; unique docs
keep everything (their spans are globally unique by construction).

``gopher_filter`` is map-only — its number here is the pure scan rate
of the full rule chain (tokenize + 6 rules) per core.

Usage: python3 tools/scale_text_ops_1m.py [n] [dup_frac]
Appends JSON lines to tools/scale_text_ops_1m.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F                             # noqa: E402

from fspann_query_system_spark.session import get_spark            # noqa: E402
from scale_dedup_1m import gen_corpus                              # noqa: E402

OUT = "/root/repo/tools/scale_text_ops_1m.jsonl"


def emit(row: dict):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    spark = get_spark("scale-text-ops",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs, n_uniq = gen_corpus(spark, n, dup_frac)
    docs = docs.persist()
    t0 = time.time()
    docs.count()
    print(f"corpus: {n} docs ({n - n_uniq} planted near-dups), "
          f"generated+persisted in {time.time() - t0:.1f}s", flush=True)

    # ---- span_dedup ----
    from fspann_query_system_spark.ops.dedup import span_dedup
    t0 = time.time()
    out = span_dedup(docs, span_tokens=5)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_kept").alias("kept"),
        # dup docs (id >= n_uniq) should keep ONLY their final partial
        # span (the one holding the swapped unique token)
        F.sum(F.when(F.col("doc_id") >= n_uniq, F.col("n_kept"))
              .otherwise(F.lit(0))).alias("dup_kept"),
        F.sum(F.when(F.col("doc_id") >= n_uniq, F.col("n_spans"))
              .otherwise(F.lit(0))).alias("dup_spans")).first()
    wall = time.time() - t0
    emit({"metric": "span_dedup_1m", "n_docs": n, "span_tokens": 5,
          "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
          "rows_out": agg.rows, "spans": int(agg.spans),
          "kept": int(agg.kept),
          "kept_frac": round(agg.kept / agg.spans, 4),
          "dup_kept_per_doc": round(agg.dup_kept / max(n - n_uniq, 1), 3),
          "dup_spans_per_doc": round(agg.dup_spans / max(n - n_uniq, 1), 3)})

    # ---- gopher_filter ----
    from fspann_query_system_spark.ops.quality import gopher_filter
    t0 = time.time()
    gf = gopher_filter(docs)
    gagg = gf.agg(F.count(F.lit(1)).alias("rows"),
                  F.sum("keep").alias("kept")).first()
    gwall = time.time() - t0
    emit({"metric": "gopher_filter_1m", "n_docs": n,
          "wall_sec": round(gwall, 1), "docs_per_sec": round(n / gwall),
          "rows_out": gagg.rows, "keep_frac": round(gagg.kept / gagg.rows, 4)})

    # ---- training_corpus_prep (the capstone composite, end-to-end) ----
    # gate relaxed to this corpus: 40-token docs, no stopwords, distinct
    # ratio high (w#### vocab) — quality passes everything, so the
    # composite's cost is gate-scan + dedup + mix, the realistic shape.
    from fspann_query_system_spark.ops.dedup import near_dup_pipeline
    from fspann_query_system_spark.ops.sampling import temperature_mix
    docs_l = docs.withColumn("lang", F.concat(
        F.lit("l"), F.pmod(F.col("doc_id"), F.lit(5))))
    t0 = time.time()
    qual = (gopher_filter(docs_l, min_tokens=30, min_stop_hits=0,
                          min_distinct_ratio=0.35)
            .filter(F.col("keep") == 1).select("doc_id"))
    # persist the stage boundary: the dedup stage consumes its input
    # several times (banding checkpoint, candidate re-shingle, final
    # labeling join) and the mix stage twice more — without the persist
    # each consumer re-runs the full tokenize+rule chain (measured:
    # 934 s vs the persisted number; any real pipeline materializes
    # between quality gate and dedup)
    clean = docs_l.join(qual, "doc_id", "leftsemi").persist()
    clean.count()
    canon = (near_dup_pipeline(clean, threshold=0.5)
             .filter(F.col("keep") == 1).select("doc_id"))
    surv = clean.join(canon, "doc_id", "leftsemi")
    mixed = temperature_mix(surv, alpha=0.3, budget_frac=0.7,
                            strata_col="lang")
    n_out = mixed.count()
    wall = time.time() - t0
    clean.unpersist()
    emit({"metric": "training_corpus_prep_1m", "n_docs": n,
          "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
          "rows_out": n_out})


if __name__ == "__main__":
    main()
