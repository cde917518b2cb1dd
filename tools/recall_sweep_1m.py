"""Recall sweep at 1M vectors (SCALE.md §8): vary the candidate-coverage
knobs (tables, probes, lam, block) at the reference SIFT_P4_FAST refine
budget (8000) and record recall@100 + amortized query latency.

Key sizing fact: max candidate pool = tables*divisions*probes*block; the
round-1 config (6*2*8*64 = 6144) never even filled the 8000 refine
budget, so recall was coverage-bound, not budget-bound.

Usage: python3 tools/recall_sweep_1m.py [n] [nq] — appends JSON lines to
tools/recall_sweep_1m.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from fspann_query_system_spark.session import get_spark            # noqa: E402
from fspann_query_system_spark.lsh.params import LshConfig, fit_params  # noqa: E402
from fspann_query_system_spark.query.ann import AnnIndex, search_batch  # noqa: E402

DIM = 64
K = 100
REFINE = 8000          # matched budget: reference SIFT_P4_FAST

SWEEP = [
    # round-4c: clean re-measure of the 0.805 config (first reading's
    # latency was GC-noisy) and its m28 sibling
    dict(m=26, lam=2, tables=10, divisions=2, probes=8, block_size=128),
    dict(m=28, lam=2, tables=10, divisions=2, probes=8, block_size=128),
]

# round-2 sweep (pool 16k):
# m18 λ2 T8 p8  b128 → 0.726 @ 103 ms/q
# m18 λ2 T8 p16 b64  → 0.734 @  71 ms/q
# m20 λ2 T8 p8  b128 → 0.746 @  62 ms/q   ← winner

# round-1 sweep (results in recall_sweep_1m.jsonl / SCALE.md §8):
# baseline m18 λ2 T6 p8 b64 pool 6k   → 0.475   (coverage-bound: pool < refine)
# m18 λ2 T6 p16 b64        pool 12k  → 0.693 @ 116 ms/q
# m18 λ2 T8 p10 b64        pool 10k  → 0.629 @  84 ms/q
# m16 λ3 T8 p10 b64        pool 10k  → 0.605 @  66 ms/q
# m12 λ3 T8 p10 b64        pool 10k  → 0.435   (too few bits: fuzzy keys)
# m18 λ2 T8 p6  b128       pool 12k  → 0.683 @  79 ms/q


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("recall-sweep-1m",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 4.0, (64, DIM)).astype(np.float32)
    assign = rng.integers(0, 64, n)
    X = (centers[assign] + rng.normal(0, 1.0, (n, DIM)).astype(np.float32))

    vec = spark.createDataFrame(
        ((i, X[i].tolist()) for i in range(n)), "id LONG, vector ARRAY<DOUBLE>")
    vec = vec.repartition(32).persist()
    vec.count()

    qi = rng.choice(n, nq, replace=False)
    queries = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in qi], "q_id LONG, vector ARRAY<DOUBLE>")
    # exact ground truth once (numpy blocked)
    sub = qi[:50]
    gt = {}
    for q in sub:
        d2 = ((X - X[q]) ** 2).sum(1)
        gt[int(q)] = set(np.argsort(d2, kind="stable")[:K].tolist())

    out_path = "/root/repo/tools/recall_sweep_1m.jsonl"
    for cfg_kw in SWEEP:
        cfg = LshConfig(dim=DIM, seed=11, refinement_limit=REFINE, **cfg_kw)
        pool = cfg.tables * cfg.divisions * cfg.probes * cfg.block_size
        t0 = time.time()
        params = fit_params(X[:10000], cfg)
        idx = AnnIndex.build(vec, cfg, params=params)
        idx.codes.count()
        idx.routing()
        t_build = time.time() - t0

        t0 = time.time()
        res = search_batch(idx, queries, k=K).collect()
        t_q = time.time() - t0
        got: dict[int, set] = {}
        for r in res:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(q, set()) & gt[q]) / K for q in gt]))

        row = dict(n=n, nq=nq, refine=REFINE, **cfg_kw, pool=pool,
                   build_s=round(t_build, 1), query_s=round(t_q, 1),
                   ms_per_q=round(1000 * t_q / nq, 1),
                   recall_at_100=round(rec, 3))
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        idx.codes.unpersist()
        idx.bounds.unpersist()


if __name__ == "__main__":
    main()
