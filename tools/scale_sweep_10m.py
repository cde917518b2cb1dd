"""Query-knob recall sweep at 10M vectors (SCALE.md §8b).

At 10M with the 1M flagship config (m26 T8 D2 p8 b128, refine 8000),
recall@100 drops to ~0.20: each LSH block now covers 10x more points,
so a fixed probes x block pool reaches a 10x smaller fraction of the
corpus.  probes and refinement_limit are QUERY-TIME knobs
(`search_batch(probes=..., refinement_limit=...)`), so one index build
serves the whole sweep; block_size is a build knob, so configs that
change it trigger a rebuild.

Usage: python3 tools/scale_sweep_10m.py [n] [nq] — appends JSON lines
to tools/scale_sweep_10m.jsonl.  Run with SPARK_GRAFT_DRIVER_MEM=96g.
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

# (build_cfg, [(probes, refine), ...]) — query knobs share the build
SWEEP = [
    (dict(m=26, lam=2, tables=8, divisions=2, block_size=128),
     [(16, 8000), (24, 8000), (24, 16000), (32, 16000), (48, 24000)]),
    (dict(m=26, lam=2, tables=8, divisions=2, block_size=512),
     [(8, 16000), (12, 16000), (16, 24000)]),
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("scale-sweep-10m",
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

    # exact oracle once (norm trick, BLAS)
    sub = qi[:50]
    Xd = X.astype(np.float64)
    sq = (Xd * Xd).sum(1)
    gt = {}
    for q in sub:
        d2 = sq - 2.0 * (Xd @ Xd[q])
        gt[int(q)] = set(np.argsort(d2, kind="stable")[:K].tolist())
    del Xd
    print("oracle ready", flush=True)

    out_path = "/root/repo/tools/scale_sweep_10m.jsonl"
    for build_kw, query_knobs in SWEEP:
        cfg = LshConfig(dim=DIM, seed=11, refinement_limit=8000, **build_kw)
        t0 = time.time()
        params = fit_params(X[:10000], cfg)
        idx = AnnIndex.build(vec, cfg, params=params)
        idx.codes.count()
        idx.routing()
        t_build = time.time() - t0
        print(f"build {build_kw}: {t_build:.1f}s", flush=True)

        for probes, refine in query_knobs:
            pool = cfg.tables * cfg.divisions * probes * cfg.block_size
            t0 = time.time()
            res = search_batch(idx, queries, k=K, probes=probes,
                               refinement_limit=refine).collect()
            t_q = time.time() - t0
            got: dict[int, set] = {}
            for r in res:
                got.setdefault(r.q_id, set()).add(r.id)
            rec = float(np.mean([len(got.get(q, set()) & gt[q]) / K
                                 for q in gt]))
            row = dict(n=n, nq=nq, **build_kw, probes=probes, refine=refine,
                       pool=pool, build_s=round(t_build, 1),
                       ms_per_q=round(1000 * t_q / nq, 1),
                       recall_at_100=round(rec, 3))
            print(json.dumps(row), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
        idx.codes.unpersist()
        idx.bounds.unpersist()


if __name__ == "__main__":
    main()
