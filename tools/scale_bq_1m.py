"""1M-vector scale measurement for the binary-quantization family
(SCALE.md §9e): ``bq_encode`` throughput and ``bq_topk`` amortized
ms/query + recall@100 vs exact ground truth, at increasing rerank.

Same corpus/GT harness as the PQ tool (``scale_bench.make_data``:
64 clusters, sigma 1.0, dim 64).  1-bit codes collapse each cluster
onto a near-constant sign pattern, so recall is a direct function of
whether rerank covers the intra-cluster tie plateau (n/64 vectors) —
the measured curve quantifies the documented BQ trade.

Usage: python3 tools/scale_bq_1m.py [n] [nq] [fit_fraction]
                                    [--three-tier-only]
Appends one JSON line to tools/scale_bq_1m.jsonl.

Round-8 additions (verdict r07 Next #3/#4):
  * fit_fraction (3rd positional, default 0.1 past 1M): sample-based
    kmeans quantizer fit — cuts the 10M setup tax ~4x at equal
    downstream recall (re-validated by the fixed three-tier points).
  * --three-tier-only: skip the standalone-BQ and IVF-BQ sweeps (their
    curves are published; at 10M they dominate wall time) and run the
    three-tier fixed + ADAPTIVE-probe sweeps only.
  * adaptive sweep: probe_mass ∈ {32k, 64k, 96k} rows/query — the
    §9e-addendum-2 routing-ceiling fix measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F                   # noqa: E402

from fspann_query_system_spark.session import get_spark  # noqa: E402
from scale_bench import DIM, K, make_data, materialize   # noqa: E402
from scale_pq_1m import exact_gt                         # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 1_000_000
    nq = int(args[1]) if len(args) > 1 else 100
    fit_fraction = (float(args[2]) if len(args) > 2
                    else (0.1 if n > 1_000_000 else 1.0))
    three_tier_only = "--three-tier-only" in sys.argv
    spark = get_spark("scale-bq-1m",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from fspann_query_system_spark.ops.similarity import (bq_encode,
                                                          bq_thresholds,
                                                          bq_topk,
                                                          sq8_stats)

    X = make_data(n)
    vec = materialize(spark, X)
    rng = np.random.default_rng(11)
    q_ids = np.sort(rng.choice(n, nq, replace=False))
    queries = (vec.filter(F.col("id").isin([int(q) for q in q_ids]))
               .select(F.col("id").alias("q_id"), "vector").persist())
    queries.count()
    print("computing exact GT...", flush=True)
    gt = exact_gt(X, q_ids)

    out = {"n": n, "nq": nq, "dim": DIM}

    t0 = time.time()
    mins, maxs = sq8_stats(vec)
    thr = bq_thresholds(mins, maxs)
    out["thresholds_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    codes = bq_encode(vec, thr).persist()
    codes.count()
    out["encode_s"] = round(time.time() - t0, 1)

    bq_sweep = () if ("--ivf-only" in sys.argv or three_tier_only) \
        else (16, 64, 256)
    for rr in bq_sweep:
        t0 = time.time()
        rows = bq_topk(vec, queries, thr, k=K, rerank=rr,
                       codes=codes).collect()
        w = time.time() - t0
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(int(q), set()) & gt[int(q)]) / K
                             for q in q_ids]))
        out[f"bq_r{rr}_ms_q"] = round(w / nq * 1000, 1)
        out[f"bq_r{rr}_recall"] = round(rec, 3)
        print(f"rerank={rr}: {out[f'bq_r{rr}_ms_q']} ms/q "
              f"recall {rec:.3f}", flush=True)

    # ---- IVF-BQ: the composition that bounds the tie plateau ----
    # cells sized so nprobe * cell ~ k * rerank can cover the probed
    # candidates (the §9e law); |C| = n/1000 -> ~1000-member cells.
    from fspann_query_system_spark.ops.similarity import (ivf_assign,
                                                          ivf_bq_topk,
                                                          kmeans_fit)
    n_cells = max(64, n // 1000)
    t0 = time.time()
    cents = kmeans_fit(vec, k=n_cells, iters=1,
                       fit_fraction=fit_fraction).persist()
    cents.count()
    out["ivf_cells"] = n_cells
    out["fit_fraction"] = fit_fraction
    out["kmeans_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    assigned = ivf_assign(vec, cents, c_id_col="cell",
                          c_vector_col="vector").persist()
    assigned.count()
    out["assign_s"] = round(time.time() - t0, 1)
    print(f"ivf: {n_cells} cells, kmeans {out['kmeans_s']}s, "
          f"assign {out['assign_s']}s", flush=True)

    ivfbq_sweep = () if ("--sq8-only" in sys.argv or three_tier_only) \
        else ((8, 16), (8, 64), (16, 64), (32, 64))
    for nprobe, rr in ivfbq_sweep:
        t0 = time.time()
        rows = ivf_bq_topk(vec, queries, cents, thr, k=K, nprobe=nprobe,
                           rerank=rr, c_id_col="cell",
                           c_vector_col="vector",
                           assigned=assigned, codes=codes).collect()
        w = time.time() - t0
        got = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(int(q), set()) & gt[int(q)]) / K
                             for q in q_ids]))
        tag = f"ivfbq_p{nprobe}_r{rr}"
        out[f"{tag}_ms_q"] = round(w / nq * 1000, 1)
        out[f"{tag}_recall"] = round(rec, 3)
        print(f"ivfbq nprobe={nprobe} rerank={rr}: "
              f"{out[f'{tag}_ms_q']} ms/q recall {rec:.3f}", flush=True)

    # ---- IVF-BQ-SQ8 three-tier: BQ pre-screens, SQ8 ranks (§9e's
    # plateau fix — 1-bit codes cap ~0.31 at 10M because they cannot
    # rank within a cell; SQ8 can, at 1/4 the float bytes, and only
    # k*rerank true vectors are touched) ----
    from fspann_query_system_spark.ops.similarity import (ivf_bq_sq8_topk,
                                                          sq8_quantize)
    t0 = time.time()
    sq8c = sq8_quantize(vec, mins, maxs).select("id", "codes").persist()
    sq8c.count()
    out["sq8_encode_s"] = round(time.time() - t0, 1)
    print(f"sq8 shadow encode: {out['sq8_encode_s']}s", flush=True)
    tier3_sweep = ((16, 16, 4), (16, 64, 4), (16, 256, 4), (32, 256, 4))
    if os.environ.get("BQSQ8_SWEEP"):        # e.g. "32:512:4,32:1024:4"
        tier3_sweep = tuple(tuple(int(x) for x in s.split(":"))
                            for s in os.environ["BQSQ8_SWEEP"].split(","))
    for nprobe, keep, rr in tier3_sweep:
        t0 = time.time()
        rows = ivf_bq_sq8_topk(vec, queries, cents, thr, mins, maxs,
                               k=K, nprobe=nprobe, bq_keep=keep, rerank=rr,
                               c_id_col="cell", c_vector_col="vector",
                               assigned=assigned, codes=codes,
                               sq8_codes=sq8c).collect()
        w = time.time() - t0
        got = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(int(q), set()) & gt[int(q)]) / K
                             for q in q_ids]))
        tag = f"ivfbqsq8_p{nprobe}_k{keep}_r{rr}"
        out[f"{tag}_ms_q"] = round(w / nq * 1000, 1)
        out[f"{tag}_recall"] = round(rec, 3)
        print(f"ivfbq-sq8 nprobe={nprobe} bq_keep={keep} rerank={rr}: "
              f"{out[f'{tag}_ms_q']} ms/q recall {rec:.3f}", flush=True)

    # ---- three-tier with ADAPTIVE probing (§9e-addendum-2 ceiling
    # fix): per-query cell lists until cumulative member mass covers
    # the budget — same scanned-row total as fixed probes of
    # mass/avg_cell, allocated where each query needs it ----
    avg_cell = n / n_cells
    adapt_sweep = ((32, 256, 4), (64, 256, 4), (96, 256, 4))
    if os.environ.get("BQSQ8_ADAPT_SWEEP"):  # e.g. "64:1024:4"
        adapt_sweep = tuple(tuple(int(x) for x in s.split(":"))
                            for s in os.environ["BQSQ8_ADAPT_SWEEP"].split(","))
    for mass_cells, keep, rr in adapt_sweep:
        mass = int(mass_cells * avg_cell)
        t0 = time.time()
        rows = ivf_bq_sq8_topk(vec, queries, cents, thr, mins, maxs,
                               k=K, bq_keep=keep, rerank=rr,
                               c_id_col="cell", c_vector_col="vector",
                               assigned=assigned, codes=codes,
                               sq8_codes=sq8c,
                               probe_mass=mass).collect()
        w = time.time() - t0
        got = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.id)
        rec = float(np.mean([len(got.get(int(q), set()) & gt[int(q)]) / K
                             for q in q_ids]))
        tag = f"ivfbqsq8_adapt_m{mass_cells}_k{keep}_r{rr}"
        out[f"{tag}_ms_q"] = round(w / nq * 1000, 1)
        out[f"{tag}_recall"] = round(rec, 3)
        print(f"ivfbq-sq8 ADAPTIVE mass={mass} (~{mass_cells} cells) "
              f"bq_keep={keep} rerank={rr}: {out[f'{tag}_ms_q']} ms/q "
              f"recall {rec:.3f}", flush=True)

    print(json.dumps(out), flush=True)
    with open("/root/repo/tools/scale_bq_1m.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
