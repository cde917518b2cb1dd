"""1M-embedding scale measurement for the SEMANTIC dedup family
(SCALE.md §9b — the embedding mirror of §9's text measurement).

Round-5 verdict: `semantic_dedup` and the bucketed
`embedding_near_dups` rested on plan-shape argument alone.  This
script publishes the measured point: 1M × 64-d embeddings with planted
near-duplicates, through BOTH scale paths —

  * SemDeDup (`kmeans_fit` coarse quantizer + in-cell pairs only):
    wall, docs/s, cell-size distribution, in-cell candidate-pair
    count (the O(n²/k) bound made concrete), planted-pair recall;
  * LSH-bucketed `embedding_near_dups` (AnnIndex partitions as the
    blocking key): wall, docs/s, candidate-pair volume, planted
    recall.

Corpus: 256 natural clusters (sigma 0.35 of center scale); a
``dup_frac`` fraction of ids are near-dups of a base id (base vector +
N(0, 1e-3) → cosine ≥ 0.999).  Every vector derives deterministically
from its (base) id alone, so generation is map-only distributed — no
driver materialization, same discipline as tools/scale_dedup_1m.py.

Usage: python3 tools/scale_embed_1m.py [n] [dup_frac]
(1M fits the default session heap; raise SPARK_GRAFT_DRIVER_MEM for
10M.)
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F                               # noqa: E402

from fspann_query_system_spark.session import get_spark              # noqa: E402

DIM = 64
N_CENTERS = 256
DUP_NOISE = 1e-3


def gen_embeddings(spark, n: int, dup_frac: float):
    """(id, vector) with ids >= n_uniq near-duplicating base ids.
    Deterministic per id (vector = f(base_id) [+ tiny dup noise]), so
    the planted ground truth needs no shuffle to reconstruct."""
    n_uniq = int(n * (1 - dup_frac))
    centers = np.random.default_rng(42).normal(0, 4.0, (N_CENTERS, DIM))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = np.where(ids < n_uniq, ids, (ids - n_uniq) % n_uniq)
            V = np.empty((len(ids), DIM))
            for i, b in enumerate(base):
                V[i] = centers[b % N_CENTERS] + \
                    np.random.default_rng(int(b)).normal(0, 1.4, DIM)
            dup = ids >= n_uniq
            if dup.any():
                rng = np.random.default_rng(int(ids[0]) + 1_000_003)
                V[dup] += rng.normal(0, DUP_NOISE, (int(dup.sum()), DIM))
            yield pd.DataFrame({"id": ids, "vector": list(V)})

    return (spark.range(n).repartition(64)
            .mapInPandas(run, schema="id LONG, vector ARRAY<DOUBLE>")
            .persist())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    n_uniq = int(n * (1 - dup_frac))
    n_dups = n - n_uniq
    spark = get_spark("scale-embed",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    emb = gen_embeddings(spark, n, dup_frac)
    emb.count()
    print(f"materialize {n} embeddings ({n_dups} planted dups): "
          f"{time.time()-t0:.1f}s", flush=True)

    # planted ground truth: (base, dup) id pairs, id_a < id_b
    planted = {(int(b), int(n_uniq + i)) for i, b in
               enumerate((np.arange(n_dups) % n_uniq))}

    # ---------------- SemDeDup path ----------------
    from fspann_query_system_spark.ops.similarity import (
        kmeans_fit, semantic_dedup, _nearest_cells)
    k_cells = max(16, n // 64)          # target ~64 vectors/cell
    t0 = time.time()
    cents = kmeans_fit(emb, k=k_cells, iters=2).persist()
    cents.count()
    t_fit = time.time() - t0
    print(f"kmeans_fit k={k_cells} iters=2: {t_fit:.1f}s", flush=True)

    t0 = time.time()
    pairs = semantic_dedup(emb, cents, threshold=0.999).persist()
    n_pairs = pairs.count()
    t_dedup = time.time() - t0
    got = {(r.id_a, r.id_b) for r in
           pairs.select("id_a", "id_b").collect()} if n_pairs < 5_000_000 \
        else set()
    sem_recall = len(got & planted) / len(planted) if planted else 1.0

    # cell-size distribution + the in-cell candidate bound
    assign = _nearest_cells(emb, cents, 1, "id", "vector",
                            "cell", "vector", False)
    sizes = (assign.groupBy("cell").count()
             .agg(F.expr("percentile(count, 0.5)").alias("p50"),
                  F.expr("percentile(count, 0.95)").alias("p95"),
                  F.max("count").alias("max"),
                  F.sum(F.expr("count*(count-1)/2")).alias("cand_pairs"))
             .first())
    print(f"semantic_dedup: {t_dedup:.1f}s ({n/t_dedup:,.0f} docs/s), "
          f"{n_pairs} pairs, planted recall {sem_recall:.3f}", flush=True)
    print(f"cells: p50 {sizes.p50:.0f}, p95 {sizes.p95:.0f}, "
          f"max {sizes['max']}, in-cell candidate pairs "
          f"{int(sizes.cand_pairs)} (vs n^2/2 = {n*n//2})", flush=True)

    # ---------------- LSH-bucketed embedding_near_dups ----------------
    from fspann_query_system_spark.lsh.params import LshConfig
    from fspann_query_system_spark.query.ann import AnnIndex
    from fspann_query_system_spark.ops.similarity import embedding_near_dups
    cfg = LshConfig(dim=DIM, m=22, lam=2, tables=2, divisions=1, seed=11,
                    block_size=16, probes=4, refinement_limit=1000)
    t0 = time.time()
    idx = AnnIndex.build(emb, cfg)
    idx.codes.count()
    t_build = time.time() - t0
    blocks = idx.bounds.count()
    print(f"lsh index build (T2 D1 b16): {t_build:.1f}s, {blocks} blocks",
          flush=True)
    out = {"n": n, "planted": len(planted),
           "semdedup": {"fit_s": round(t_fit, 1),
                        "dedup_s": round(t_dedup, 1),
                        "docs_per_s": round(n / t_dedup),
                        "pairs": n_pairs, "recall": round(sem_recall, 4),
                        "cell_p50": sizes.p50, "cell_p95": sizes.p95,
                        "cell_max": sizes["max"],
                        "cand_pairs": int(sizes.cand_pairs)}}
    bsz = cfg.block_size
    for mode in ("block", "key"):
        t0 = time.time()
        nd = embedding_near_dups(emb, threshold=0.999, index=idx,
                                 bucket=mode).persist()
        n_nd = nd.count()
        t_nd = time.time() - t0
        got_nd = {(r.id_a, r.id_b) for r in
                  nd.select("id_a", "id_b").collect()} \
            if n_nd < 5_000_000 else set()
        nd_recall = len(got_nd & planted) / len(planted) if planted else 1.0
        cand_bound = (blocks * bsz * (bsz - 1) // 2 if mode == "block"
                      else None)
        print(f"embedding_near_dups bucket={mode}: {t_nd:.1f}s "
              f"({n/t_nd:,.0f} docs/s), {n_nd} pairs, planted recall "
              f"{nd_recall:.3f}"
              + (f", candidate bound {cand_bound} pairs "
                 f"(vs n^2/2 = {n*n//2})" if cand_bound else ""),
              flush=True)
        out[f"lsh_{mode}"] = {"build_s": round(t_build, 1),
                              "dedup_s": round(t_nd, 1),
                              "docs_per_s": round(n / t_nd),
                              "pairs": n_nd,
                              "recall": round(nd_recall, 4)}
        nd.unpersist()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()


def gen_embeddings_native(spark, n: int, dup_frac: float,
                          dim: int = DIM, n_centers: int = N_CENTERS):
    """JVM-native twin of :func:`gen_embeddings` for 10M+ runs: every
    component is Box-Muller over two xxhash64-derived uniforms — no
    Python worker in the generation path (the per-row numpy-rng loop
    is the harness bottleneck at 10M and can OOM-crash workers).  Same
    planted structure: ids >= n_uniq are base + N(0, DUP_NOISE)
    (cosine >= 0.999); clusters have center scale 4.0, member noise
    sigma 1.4 — the §9b geometry with a different (hash) RNG."""
    import math
    n_uniq = int(n * (1 - dup_frac))

    def unif(tag, key, d, salt):
        h = F.xxhash64(F.concat_ws(":", F.lit(tag), key.cast("string"),
                                   d.cast("string"), F.lit(salt)))
        return (F.shiftrightunsigned(h, 11).cast("double") + 0.5) / (2.0 ** 53)

    def gauss(tag, key, d):
        u1, u2 = unif(tag, key, d, "a"), unif(tag, key, d, "b")
        return (F.sqrt(-2.0 * F.log(u1))
                * F.cos(F.lit(2.0 * math.pi) * u2))

    df = (spark.range(n).repartition(64)
          .withColumn("base",
                      F.when(F.col("id") < n_uniq, F.col("id"))
                      .otherwise(F.pmod(F.col("id") - n_uniq,
                                        F.lit(n_uniq)))))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (4.0 * gauss("c", F.pmod(F.col("base"), F.lit(n_centers)), d)
                   + 1.4 * gauss("m", F.col("base"), d)
                   + F.when(F.col("id") >= n_uniq,
                            DUP_NOISE * gauss("n", F.col("id"), d))
                   .otherwise(F.lit(0.0))))
    return df.select("id", comp.alias("vector"))
