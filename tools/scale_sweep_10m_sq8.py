"""SQ8 compressed-refine sweep at 10M (SCALE.md §8b follow-up).

The first 10M sweep showed recall is REFINE-BUDGET-bound, not
probe-bound: at fixed refine=8000 recall stalls at ~0.20 regardless of
probes; doubling refine to 16k nearly doubles recall.  Holding recall
as n grows therefore means scaling the refinement budget ~ with n —
which is exactly what the SQ8 compressed-refine path makes affordable:
the budget is ranked on int8 codes (cheap, 4x smaller than floats) and
only k*rerank survivors are fully scored/decrypted.

This sweep measures the refine-budget curve with and without SQ8 on
one m26/b128 build.  Usage: SPARK_GRAFT_DRIVER_MEM=96g python3
tools/scale_sweep_10m_sq8.py [n] [nq]; appends to
tools/scale_sweep_10m.jsonl (rows tagged "sq8_rerank").
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from fspann_query_system_spark.session import get_spark            # noqa: E402
from fspann_query_system_spark.lsh.params import LshConfig, fit_params  # noqa: E402
from fspann_query_system_spark.query.ann import AnnIndex, search_batch  # noqa: E402
from scale_bench import DIM, K, make_data, materialize             # noqa: E402

BUILD = dict(m=26, lam=2, tables=8, divisions=2, block_size=128)
# (probes, refine, sq8_rerank | None)
POINTS = [
    # run 2: pool-matched scaled budgets (run 1's refine=128k point was
    # pool-bound at p32*b128 = 65,536 — recall froze at 0.679 with half
    # the nominal budget unreachable).  pool = 8*2*probes*128.
    (64, 131_072, 16),     # pool 131k = 10x the 1M flagship's 16k/8k
    (96, 196_608, 16),
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("scale-sweep-10m-sq8",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    X = make_data(n, rng)
    t0 = time.time()
    vec = materialize(spark, X)
    print(f"materialize {n}: {time.time()-t0:.1f}s", flush=True)

    qi = rng.choice(n, nq, replace=False)
    queries = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in qi], "q_id LONG, vector ARRAY<DOUBLE>")

    sub = qi[:50]
    Xd = X.astype(np.float64)
    sq = (Xd * Xd).sum(1)
    gt = {}
    for q in sub:
        d2 = sq - 2.0 * (Xd @ Xd[q])
        gt[int(q)] = set(np.argsort(d2, kind="stable")[:K].tolist())
    del Xd
    print("oracle ready", flush=True)

    cfg = LshConfig(dim=DIM, seed=11, refinement_limit=8000, **BUILD)
    t0 = time.time()
    params = fit_params(X[:10000], cfg)
    idx = AnnIndex.build(vec, cfg, params=params)
    idx.codes.count()
    idx.routing()
    print(f"build: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    idx8 = idx.with_sq8()
    idx8.sq8_codes.count()
    print(f"sq8 shadow: {time.time()-t0:.1f}s", flush=True)

    out_path = "/root/repo/tools/scale_sweep_10m.jsonl"
    for probes, refine, rerank in POINTS:
        use = idx8 if rerank else idx
        t0 = time.time()
        res = search_batch(use, queries, k=K, probes=probes,
                           refinement_limit=refine,
                           sq8_rerank=rerank).collect()
        t_q = time.time() - t0
        got: dict[int, set] = {}
        for r in res:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(q, set()) & gt[q]) / K
                             for q in gt]))
        row = dict(n=n, nq=nq, **BUILD, probes=probes, refine=refine,
                   sq8_rerank=rerank,
                   ms_per_q=round(1000 * t_q / nq, 1),
                   recall_at_100=round(rec, 3))
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
