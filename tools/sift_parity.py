"""SIFT1M recall-parity harness — the reference's own benchmark, same
geometry, same metrics (SCALE.md §8c).

The reference publishes Recall@100 / ART / distance-Ratio on SIFT1M for
six named profiles (`config/src/main/resources/config_sift1m.json`,
results `logs/New Results:22-54`).  This script runs OUR engine at the
SAME (m, lambda, tables, divisions, probes, refinement_limit,
block_size=64, hamming_threshold=0) geometry over the SAME file formats
(fvecs base+query, ivecs ground truth, through the record-aligned
parallel `vecfile` reader) on the ENCRYPTED path, and prints each
profile next to the reference's published numbers.

Real-data mode (the thesis-grade comparison — needs the public TEXMEX
corpus, http://corpus-texmex.irisa.fr/, on any machine with network):

    python3 tools/sift_parity.py \
        --base sift/sift_base.fvecs --query sift/sift_query.fvecs \
        --gt sift/sift_groundtruth.ivecs [--nq 10000] [--profiles all]

Synthetic fallback (this build container has NO network — DNS fails —
so the real corpus cannot be fetched here; the fallback generates a
SIFT-SHAPED corpus: 128-d, uint8-valued 0..255, clustered, written to
REAL fvecs/ivecs files and read back through the identical reader +
search path, proving the harness end-to-end; numbers from it are
labeled SYNTHETIC and are NOT the parity claim):

    python3 tools/sift_parity.py --synthetic 1000000 [--nq 1000]

Reference baseline context: its best SIFT1M point is SIFT_P10_HIGH,
Recall@100 = 0.771 at ART 4185.6 ms/query (10k queries, single node).

Budget asymmetry caveat (ADVICE r07): the geometry mapping covers
(m, lambda, tables, divisions, probes, refinement_limit) but NOT the
reference profiles' additional candidate caps — config_sift1m.json's
`maxGlobalCandidates`, `maxCandidateFactor`, `maxRelaxationDepth` —
which bound the reference's shortlist growth beyond refinementLimit
and hence shape its recall/ART.  Our engine has no equivalent knobs
(its candidate pool is exactly the refinement budget), so the
side-by-side table is matched on coding geometry and refinement
budget, not on every shortlist-bounding cap; see SCALE.md §8c.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from fspann_query_system_spark.session import get_spark              # noqa: E402
from fspann_query_system_spark.lsh.params import LshConfig, fit_params  # noqa: E402
from fspann_query_system_spark.query.ann import AnnIndex, search_batch  # noqa: E402
from fspann_query_system_spark.sources.vecfiles import (              # noqa: E402
    read_fvecs, read_ivecs, write_fvecs, write_ivecs)

K = 100
DIM = 128
BLOCK = 64          # reference PartitionedIndexService.java:92
RATIO_SAMPLE = 150  # reference config_sift1m.json ratio.gtSample

# Geometry + published numbers per profile:
# config_sift1m.json profiles[*] -> (paper.m, paper.lambda, paper.tables,
# paper.divisions, runtime.probeOverride, runtime.refinementLimit);
# ref = (Recall@100, ART ms, Ratio) from logs/New Results:22-54.
PROFILES = {
    "SIFT_P4_FAST": dict(m=20, lam=2, tables=5, divisions=8, probes=4,
                         refinement_limit=8000,
                         ref=(0.550634, 1429.8, 1.027552)),
    "SIFT_P6_BALANCED": dict(m=24, lam=2, tables=6, divisions=8, probes=6,
                             refinement_limit=16000,
                             ref=(0.711652, 2827.7, 1.013466)),
    "SIFT_M28_HIGH": dict(m=28, lam=2, tables=6, divisions=8, probes=6,
                          refinement_limit=20000,
                          ref=(0.720616, 3231.8, 1.012796)),
    "SIFT_LAMBDA3": dict(m=24, lam=3, tables=6, divisions=8, probes=8,
                         refinement_limit=22000,
                         ref=(0.748940, 3798.6, 1.010611)),
    "SIFT_DIV6_COARSE": dict(m=24, lam=2, tables=6, divisions=6, probes=6,
                             refinement_limit=14000,
                             ref=(0.613510, 2442.4, 1.020566)),
    "SIFT_P10_HIGH": dict(m=26, lam=2, tables=7, divisions=8, probes=10,
                          refinement_limit=22000,
                          ref=(0.771397, 4185.6, 1.009719)),
}
DEFAULT_PROFILES = ["SIFT_P4_FAST", "SIFT_P6_BALANCED", "SIFT_P10_HIGH"]


def make_sift_shaped(n: int, rng: np.random.Generator) -> np.ndarray:
    """SIFT-shaped synthetic: 128-d, non-negative, uint8-valued,
    gradient-histogram-like sparsity (many near-zero components, a few
    large), 256 natural clusters.  SYNTHETIC — stands in for the real
    corpus only to exercise the identical code path."""
    centers = rng.gamma(shape=0.6, scale=60.0, size=(256, DIM))
    assign = rng.integers(0, 256, n)
    X = centers[assign] + rng.gamma(0.5, 25.0, (n, DIM)) - 12.0
    return np.clip(np.rint(X), 0, 255).astype(np.float32)


def exact_gt(X: np.ndarray, Q: np.ndarray, k: int):
    """Blocked BLAS exact top-k: ids (nq,k) and L2 distances (nq,k)."""
    Xd = X.astype(np.float64)
    sq = (Xd * Xd).sum(1)
    ids = np.empty((len(Q), k), dtype=np.int64)
    dist = np.empty((len(Q), k))
    for i, q in enumerate(Q.astype(np.float64)):
        d2 = sq - 2.0 * (Xd @ q) + (q * q).sum()
        top = np.argpartition(d2, k)[:k]
        order = top[np.argsort(d2[top], kind="stable")]
        ids[i] = order
        dist[i] = np.sqrt(np.maximum(d2[order], 0.0))
    return ids, dist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base"); ap.add_argument("--query"); ap.add_argument("--gt")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a SIFT-shaped corpus of this size instead "
                         "of reading real files (harness proof, not parity)")
    ap.add_argument("--nq", type=int, default=1000)
    ap.add_argument("--profiles", nargs="*", default=DEFAULT_PROFILES,
                    help="profile names or 'all'")
    args = ap.parse_args()
    names = list(PROFILES) if args.profiles == ["all"] else args.profiles

    spark = get_spark("sift-parity",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    synthetic = args.synthetic > 0 or not args.base
    if synthetic:
        n = args.synthetic or 100_000
        rng = np.random.default_rng(13)
        X = make_sift_shaped(n, rng)
        qi = rng.choice(n, args.nq, replace=False)
        Q = np.clip(X[qi] + rng.normal(0, 4.0, (args.nq, DIM)), 0, 255) \
            .astype(np.float32)
        d = tempfile.mkdtemp(prefix="sift_shaped_")
        base_p, query_p = os.path.join(d, "base.fvecs"), os.path.join(d, "query.fvecs")
        gt_p = os.path.join(d, "gt.ivecs")
        t0 = time.time()
        write_fvecs(base_p, X)
        write_fvecs(query_p, Q)
        gt_ids, gt_dist = exact_gt(X, Q, K)
        write_ivecs(gt_p, [r.tolist() for r in gt_ids])
        print(f"[SYNTHETIC n={n}] fvecs/ivecs written + exact GT: "
              f"{time.time()-t0:.1f}s -> {d}", flush=True)
    else:
        base_p, query_p, gt_p = args.base, args.query, args.gt

    # --- identical ingest path real or synthetic: the vecfile reader ---
    t0 = time.time()
    base = read_fvecs(spark, base_p).repartition(32) \
        .withColumnRenamed("vector", "vector").persist()
    n = base.count()
    queries_df = (read_fvecs(spark, query_p)
                  .withColumnRenamed("id", "q_id").limit(args.nq))
    qrows = queries_df.collect()
    Q = np.array([r.vector for r in qrows], dtype=np.float64)
    print(f"read base {n} + {len(qrows)} queries via vecfile reader: "
          f"{time.time()-t0:.1f}s", flush=True)
    if not synthetic:
        gt_rows = read_ivecs(spark, gt_p).limit(args.nq).collect()
        gt_ids = np.array([r.neighbors[:K] for r in
                           sorted(gt_rows, key=lambda r: r.id)])
        # gt distances for the ratio metric: recompute from base vectors
        X = np.array([r.vector for r in
                      sorted(base.collect(), key=lambda r: r.id)],
                     dtype=np.float32)
        _, gt_dist = exact_gt(X, Q[:RATIO_SAMPLE], K)

    from fspann_query_system_spark.crypto.keys import KeyManager
    from fspann_query_system_spark.crypto.aes import encrypt_vectors
    km = KeyManager(master=bytes(32))
    keys_bc = spark.sparkContext.broadcast(km.key_map())
    t0 = time.time()
    enc = encrypt_vectors(base, keys_bc, km.current_version).persist()
    enc.count()
    print(f"AES-GCM encrypt all {n}: {time.time()-t0:.1f}s", flush=True)

    qdf = spark.createDataFrame(
        [(int(i), Q[i].tolist()) for i in range(len(Q))],
        "q_id LONG, vector ARRAY<DOUBLE>")
    sample = X[np.random.default_rng(5).choice(n, min(10000, n), replace=False)]

    hdr = (f"{'profile':<18} {'recall@100':>10} {'ref':>8} "
           f"{'ART ms/q':>9} {'ref':>8} {'ratio':>7} {'ref':>7}")
    print("\n" + hdr + "\n" + "-" * len(hdr), flush=True)
    for name in names:
        p = PROFILES[name]
        cfg = LshConfig(dim=DIM, m=p["m"], lam=p["lam"], tables=p["tables"],
                        divisions=p["divisions"], probes=p["probes"],
                        refinement_limit=p["refinement_limit"],
                        block_size=BLOCK, hamming_threshold=0, seed=13)
        t0 = time.time()
        idx = AnnIndex.build(base, cfg, params=fit_params(sample, cfg))
        idx.codes.count(); idx.routing()
        t_build = time.time() - t0
        idx_enc = idx.with_encrypted_points(enc, keys_bc)
        t0 = time.time()
        res = search_batch(idx_enc, qdf, k=K).collect()
        art = 1000.0 * (time.time() - t0) / len(Q)
        by_q: dict[int, list] = {}
        for r in res:
            by_q.setdefault(r.q_id, []).append((r.rank, r.id, r.distance))
        rec = float(np.mean([
            len({i for _, i, _ in by_q.get(qi_, [])} & set(gt_ids[qi_])) / K
            for qi_ in range(len(Q))]))
        # distance ratio on the first RATIO_SAMPLE queries (reference
        # gtSample): mean over returned ranks of d_i / d*_i, d*=0 -> 1
        ratios = []
        for qi_ in range(min(RATIO_SAMPLE, len(Q))):
            got = sorted(by_q.get(qi_, []))
            g = gt_dist[qi_]
            rs = [dd / g[j] if g[j] > 0 else 1.0
                  for j, (_, _, dd) in enumerate(got[:K])]
            if rs:
                ratios.append(float(np.mean(rs)))
        ratio = float(np.mean(ratios)) if ratios else float("nan")
        rr, ra, rt = p["ref"]
        print(f"{name:<18} {rec:>10.4f} {rr:>8.3f} {art:>9.1f} {ra:>8.0f} "
              f"{ratio:>7.4f} {rt:>7.4f}   (build {t_build:.0f}s)",
              flush=True)
    if synthetic:
        print("\nNOTE: SYNTHETIC SIFT-shaped corpus (no network in this "
              "container) — harness proof only; run with --base/--query/--gt "
              "on the real TEXMEX files for the parity claim.", flush=True)


if __name__ == "__main__":
    main()
