"""Incremental corpus-vs-batch dedup measurement (SCALE.md §9d).

The claim behind ``incremental_near_dups``: once the corpus's band
table is materialized, admitting a new batch costs O(batch) shingling
plus one corpus-bands pass — and with ``broadcast_batch=True`` the
corpus side never exchanges at all.  This script measures it: corpus of
``n`` unique docs (same generator as tools/scale_dedup_1m.py), batch of
``b`` docs of which half near-duplicate corpus docs and half are new.

Reports: one-time corpus banding wall; per-batch wall in both join
modes (shuffle vs broadcast-batch); batch docs/s; planted recall
(every planted dup found against its corpus original); candidate
volume.  Run at two corpus sizes to verify per-batch cost is ~flat in
corpus size for the broadcast mode:

    python3 tools/scale_incremental_1m.py 1000000 100000
    python3 tools/scale_incremental_1m.py 4000000 100000

Appends one JSON line per run to tools/scale_incremental_1m.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F                                # noqa: E402

from fspann_query_system_spark.session import get_spark               # noqa: E402
from fspann_query_system_spark.ops.dedup import (band_table,          # noqa: E402
                                                 incremental_near_dups)

N_TOKENS = 40
VOCAB = 30_000
K, N_HASHES, BANDS = 3, 8, 8


def _toks_of(idcol):
    return F.transform(
        F.sequence(F.lit(1), F.lit(N_TOKENS)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.concat_ws(":", idcol.cast("string"),
                                          j.cast("string"))),
                   F.lit(VOCAB))))


def gen_corpus(spark, n: int):
    """n unique docs, doc_id in [0, n)."""
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.concat_ws(" ", _toks_of(F.col("id"))).alias("text")))


def gen_batch(spark, n_corpus: int, b: int):
    """b docs with ids >= 10^9; the first half near-duplicate corpus
    docs 0..b/2-1 (same text, last token swapped — Jaccard ≈ 0.85 over
    3-shingles), the rest are brand-new."""
    half = b // 2
    df = spark.range(b).select(
        (F.col("id") + 1_000_000_000).alias("doc_id"), F.col("id").alias("_i"))
    dup_toks = _toks_of(F.col("_i"))           # duplicates corpus doc _i
    new_toks = _toks_of(F.col("_i") + n_corpus + 7)      # disjoint stream
    text = F.when(
        F.col("_i") < half,
        F.concat_ws(" ", F.concat(
            F.slice(dup_toks, 1, N_TOKENS - 1),
            F.array(F.concat(F.lit("uniq"), F.col("doc_id").cast("string"))))),
    ).otherwise(F.concat_ws(" ", new_toks))
    return df.select("doc_id", text.alias("text"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("scale-incremental",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    corpus = gen_corpus(spark, n)
    batch = gen_batch(spark, n, b).persist()
    batch.count()

    out = {"n_corpus": n, "n_batch": b, "k": K, "n_hashes": N_HASHES,
           "bands": BANDS}

    t0 = time.time()
    cb = band_table(corpus, k=K, n_hashes=N_HASHES, bands=BANDS).persist()
    cb.count()
    out["corpus_band_s"] = round(time.time() - t0, 1)

    half = b // 2
    for mode, bc in (("shuffle", False), ("broadcast", True)):
        t0 = time.time()
        res = incremental_near_dups(
            corpus, batch, k=K, n_hashes=N_HASHES, bands=BANDS,
            corpus_bands=cb, broadcast_batch=bc)
        pairs = res.count()
        hits = (res.filter(
            (F.col("new_id") - 1_000_000_000 == F.col("corpus_id"))
            & (F.col("corpus_id") < half)).count())
        w = time.time() - t0
        out[f"{mode}_batch_s"] = round(w, 1)
        out[f"{mode}_batch_docs_s"] = round(b / w)
        out[f"{mode}_candidate_pairs"] = pairs
        out[f"{mode}_planted_recall"] = round(hits / half, 4)
        print(json.dumps(out), flush=True)

    with open("/root/repo/tools/scale_incremental_1m.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
