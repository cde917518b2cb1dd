"""Recall/latency sweep for the flagship ANN config.

Builds the LSH index at $SPARK_GRAFT_SF_DIR (default sf0.1) for a grid of
configs, runs search_batch over a query sample, and reports recall@10 +
scan fraction + wall time per config.  Ground truth is exact brute force
(numpy, driver-side — the base sets here are small).

Usage: python3 tools/recall_sweep.py [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from fspann_query_system_spark.session import get_spark          # noqa: E402
from fspann_query_system_spark.lsh.params import LshConfig, fit_params  # noqa: E402
from fspann_query_system_spark.query.ann import AnnIndex, search_batch  # noqa: E402
from fspann_query_system_spark.workloads import _emb, _emb_matrix       # noqa: E402

K = 10

GRID = [
    # (m, lam, tables, divisions, probes, refine)
    (10, 2, 8, 2, 8, 600),     # current FLAGSHIP_CFG
    (10, 2, 8, 2, 12, 600),
    (10, 2, 12, 2, 8, 600),
    (12, 2, 8, 2, 8, 600),
    (8, 3, 8, 2, 8, 600),
    (10, 2, 8, 4, 8, 600),
    (10, 2, 8, 2, 8, 900),
    (12, 3, 10, 2, 10, 800),
    (14, 2, 10, 2, 10, 800),
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    X = _emb_matrix(sf_dir)
    n, dim = X.shape
    Q = X[:nq]
    # exact GT: full distance matrix (fine for sweep-sized base sets)
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :K]

    base = _emb(spark, sf_dir)
    queries = (base.filter(base.id < nq)
               .selectExpr("id as q_id", "vector"))

    print(f"# base={n} dim={dim} queries={nq} k={K}")
    for (m, lam, tables, div, probes, refine) in GRID:
        cfg = LshConfig(dim=dim, m=m, lam=lam, tables=tables, divisions=div,
                        seed=123, block_size=64, probes=probes,
                        refinement_limit=refine)
        t0 = time.time()
        params = fit_params(X, cfg)
        idx = AnnIndex.build(base, cfg, params=params)
        t_build = time.time() - t0
        t0 = time.time()
        res = search_batch(idx, queries, k=K).collect()
        t_search = time.time() - t0
        got: dict[int, set] = {}
        for r in res:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = np.mean([len(got.get(q, set()) & set(gt[q])) / K
                       for q in range(nq)])
        idx.codes.unpersist()
        idx.bounds.unpersist()
        print(f"m={m:2d} lam={lam} T={tables:2d} D={div} probes={probes:2d} "
              f"refine={refine:4d} | recall@10={rec:.3f} "
              f"scan≈{min(1.0, refine / n):.0%} "
              f"build={t_build:.1f}s search={t_search:.1f}s")


if __name__ == "__main__":
    main()
