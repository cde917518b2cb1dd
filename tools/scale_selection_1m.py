"""1M-scale measurement for the round-6 data-selection family
(SCALE.md §9f): ``dsir_weights`` (hashed-n-gram importance
resampling), ``semantic_decontaminate`` (embedding-level benchmark
decontamination) and ``cluster_sample`` (cluster-balanced diversity
subsampling).

Corpora reuse the established distributed generators:

  * text — ``scale_dedup_1m.gen_corpus`` (32-token docs, hashed
    vocab); DSIR target slice = ``doc_id % 20 == 0`` (the slice shares
    the corpus distribution, so the sanity check is that weights
    center near 0 and the histogram/ratio stages stay bounded — the
    measurement is the throughput of the full gram→bucket→score
    plan);
  * embeddings — ``scale_embed_1m.gen_embeddings`` (256 natural
    clusters, planted near-dups at cosine >= 0.999).  Benchmark for
    decontamination = base rows id < 1000 (collected, broadcast);
    corpus = rows id >= 1000, so the planted leaks are EXACTLY the
    1000 dup rows whose base id < 1000 (dup bases enumerate
    0..n_dups-1).  Recall/precision against that planted set.

Usage: python3 tools/scale_selection_1m.py [n] [dup_frac] [stages]
``stages`` is a comma list of {dsir,bloom,bigram,retrieval,decon,cluster}
(default all).
Appends JSON lines to tools/scale_selection_1m.jsonl.
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
from scale_embed_1m import gen_embeddings                          # noqa: E402

OUT = "/root/repo/tools/scale_selection_1m.jsonl"


def emit(row: dict):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    stages = set((sys.argv[3] if len(sys.argv) > 3
                  else "dsir,bloom,bigram,retrieval,decon,cluster").split(","))
    spark = get_spark("scale-selection",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- dsir_weights over 1M docs ----------------
    if stages & {"dsir", "bloom", "bigram", "retrieval"}:
        docs, n_uniq = gen_corpus(spark, n, 0.0)
        docs = docs.persist()
        t0 = time.time()
        docs.count()
        print(f"text corpus: {n} docs in {time.time()-t0:.1f}s", flush=True)

    from fspann_query_system_spark.ops.quality import dsir_weights
    for h in ("md5", "xxhash64") if "dsir" in stages else ():
        t0 = time.time()
        out = dsir_weights(docs, F.col("doc_id") % 20 == 0,
                           n_buckets=4096, bucket_hash=h)
        agg = out.agg(F.count(F.lit(1)).alias("rows"),
                      F.avg("dsir_logw").alias("mean_w"),
                      F.stddev_samp("dsir_logw").alias("sd_w")).first()
        wall = time.time() - t0
        emit({"metric": f"dsir_weights_1m_{h}", "n_docs": n,
              "n_buckets": 4096, "wall_sec": round(wall, 1),
              "docs_per_sec": round(n / wall), "rows_out": agg.rows,
              "mean_logw": round(agg.mean_w, 4),
              "sd_logw": round(agg.sd_w, 4)})
    # bloom decontamination: fixed m-bit budget; bench slice = 1/50 of
    # the corpus, so the position table is capped at m_bits rows no
    # matter how many benchmark grams exist
    if "bloom" in stages:
        from fspann_query_system_spark.ops.quality import bloom_decontaminate
        t0 = time.time()
        out = bloom_decontaminate(docs, m_bits=1 << 22, k_hashes=4)
        agg = out.agg(F.count(F.lit(1)).alias("rows"),
                      F.sum("n_hit").alias("hits"),
                      F.sum("contaminated").alias("flagged")).first()
        wall = time.time() - t0
        emit({"metric": "bloom_decontaminate_1m", "n_docs": n,
              "m_bits": 1 << 22, "k_hashes": 4,
              "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
              "rows_out": agg.rows, "gram_hits": int(agg.hits),
              "flagged_docs": int(agg.flagged)})
    if "bigram" in stages:
        from fspann_query_system_spark.ops.quality import bigram_logprob
        t0 = time.time()
        out = bigram_logprob(docs)
        agg = out.agg(F.count(F.lit(1)).alias("rows"),
                      F.avg("avg_nll").alias("mean_nll")).first()
        wall = time.time() - t0
        emit({"metric": "bigram_logprob_1m", "n_docs": n,
              "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
              "rows_out": agg.rows, "mean_nll": round(agg.mean_nll, 4)})
    if "retrieval" in stages:
        # BM25 multi-query retrieval at corpus scale: 10 queries of 3
        # terms drawn from one sampled document (guaranteed non-empty
        # posting lists); measures the posting-join + WindowGroupLimit
        from fspann_query_system_spark.ops.quality import bm25_topk
        sample_toks = (docs.limit(10)
                       .select(F.explode(F.split(F.lower("text"), "\\s+"))
                               .alias("t")).distinct().limit(30).collect())
        terms = [r.t for r in sample_toks]
        queries = spark.createDataFrame(
            [(q, terms[3 * q:3 * q + 3]) for q in range(10)],
            "q_id LONG, terms ARRAY<STRING>")
        t0 = time.time()
        out = bm25_topk(docs, queries, k=10)
        rows = out.count()
        wall = time.time() - t0
        emit({"metric": "bm25_topk_1m", "n_docs": n, "n_queries": 10,
              "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
              "rows_out": rows})
    if stages & {"dsir", "bloom", "bigram", "retrieval"}:
        docs.unpersist()
    if not (stages & {"decon", "cluster"}):
        return

    # ---------------- embedding family ----------------
    n_uniq = int(n * (1 - dup_frac))
    n_dups = n - n_uniq
    t0 = time.time()
    if n > 2_000_000:
        # 10M+: JVM-native generator (the per-row numpy-rng path is the
        # bottleneck and can crash workers) + scratch-parquet
        # materialization instead of an in-memory cache of array rows
        from scale_embed_1m import gen_embeddings_native
        scratch = f"/tmp/scale_sel_emb_{n}_{dup_frac}"
        import os
        if not os.path.isdir(scratch):
            (gen_embeddings_native(spark, n, dup_frac)
             .write.mode("overwrite").parquet(scratch))
        emb = spark.read.parquet(scratch)
    else:
        emb = gen_embeddings(spark, n, dup_frac)
    emb.count()
    print(f"embeddings: {n} ({n_dups} planted dups) in "
          f"{time.time()-t0:.1f}s", flush=True)

    # semantic_decontaminate: bench = base rows id < 1000
    from fspann_query_system_spark.ops.similarity import (
        kmeans_fit, semantic_decontaminate)
    if "decon" in stages:
        n_bench = min(1000, n_uniq)
        bench = emb.filter(F.col("id") < n_bench)
        corpus = emb.filter(F.col("id") >= n_bench)
        planted = {n_uniq + b for b in range(min(n_bench, n_dups))}
        t0 = time.time()
        flagged = (semantic_decontaminate(corpus, bench, threshold=0.999)
                   .select("id").distinct())
        got = {r.id for r in flagged.collect()}
        wall = time.time() - t0
        emit({"metric": "semantic_decontaminate_1m",
              "n_corpus": n - n_bench,
              "n_bench": n_bench, "threshold": 0.999,
              "wall_sec": round(wall, 1),
              "docs_per_sec": round((n - n_bench) / wall),
              "flagged": len(got),
              "recall": round(len(got & planted) / max(len(planted), 1), 4),
              "precision": round(len(got & planted) / max(len(got), 1), 4)})

    # cluster_sample: k ~ n/64 cells (the SemDeDup geometry), capped at
    # 20k cells for 10M+ runs (fit cost is O(n*k); past the cap the
    # knob that grows with n is per-cell occupancy, not k — the same
    # budget-vs-n framing as SCALE.md §8b)
    if "cluster" not in stages:
        return
    from fspann_query_system_spark.ops.sampling import cluster_sample
    k_cells = max(16, min(n // 64, 20_000))
    t0 = time.time()
    cents = kmeans_fit(emb, k=k_cells, iters=2).persist()
    cents.count()
    t_fit = time.time() - t0
    t0 = time.time()
    kept = cluster_sample(emb, cents, per_cell=16)
    stats = kept.agg(F.count(F.lit(1)).alias("rows"),
                     F.countDistinct("cell").alias("cells"),
                     F.max("rk").alias("max_rk")).first()
    wall = time.time() - t0
    emit({"metric": "cluster_sample_1m", "n": n, "k_cells": k_cells,
          "per_cell": 16, "kmeans_fit_sec": round(t_fit, 1),
          "wall_sec": round(wall, 1), "docs_per_sec": round(n / wall),
          "rows_kept": stats.rows, "cells_hit": stats.cells,
          "max_rk": stats.max_rk,
          "kept_frac": round(stats.rows / n, 4)})


if __name__ == "__main__":
    main()
