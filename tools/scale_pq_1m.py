"""1M-vector scale measurement for the PQ family (SCALE.md §9c):
``pq_fit`` (m_sub=8, k=256 → 8 bytes/vector, 64× smaller than the
float64 column), ``pq_encode``, standalone ADC ``pq_topk``, and the
IVF-PQ composition (``kmeans_fit`` coarse quantizer + probed-cell ADC).

Measures wall per stage, amortized ms/query, and recall@100 against an
exact blocked-BLAS ground truth on the same corpus every scale tool
uses (``scale_bench.make_data``: 64 clusters, sigma 1.0).

Usage: python3 tools/scale_pq_1m.py [n] [nq]  (defaults 1_000_000, 100)
Appends one JSON line per configuration to tools/scale_pq_1m.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F                   # noqa: E402

from fspann_query_system_spark.session import get_spark  # noqa: E402
from scale_bench import DIM, K, make_data, materialize   # noqa: E402

M_SUB = 8
PQ_K = 256
ITERS = 2
COARSE_K = 256
COARSE_ITERS = 2


def exact_gt(X: np.ndarray, q_ids: np.ndarray) -> dict[int, set]:
    """Exact top-K per query in ONE pass over X: per chunk, the
    (chunk × nq) GEMM |x|² − 2x·q (|q|² is rank-invariant), per-query
    per-chunk partial top-K kept, merged at the end.  10M × 100 queries
    fits in ~200 MB of chunk workspace."""
    Q = X[q_ids].astype(np.float64)              # (nq, d)
    nq = len(q_ids)
    cand_d = [[] for _ in range(nq)]
    cand_i = [[] for _ in range(nq)]
    step = 250_000
    for lo in range(0, len(X), step):
        hi = min(lo + step, len(X))
        B = X[lo:hi].astype(np.float64)
        D = np.square(B).sum(axis=1)[:, None] - 2.0 * (B @ Q.T)
        take = min(K, hi - lo)
        part = np.argpartition(D, take - 1, axis=0)[:take]   # (take, nq)
        for qi in range(nq):
            cand_d[qi].append(D[part[:, qi], qi])
            cand_i[qi].append(part[:, qi] + lo)
    gt = {}
    for qi, q in enumerate(q_ids):
        d = np.concatenate(cand_d[qi])
        i = np.concatenate(cand_i[qi])
        order = np.lexsort((i, d))[:K]
        gt[int(q)] = set(i[order].tolist())
    return gt


def recall(rows, gt) -> float:
    by_q: dict[int, set] = {}
    for r in rows:
        by_q.setdefault(int(r["q_id"]), set()).add(int(r["id"]))
    return float(np.mean([len(by_q.get(q, set()) & gt[q]) / K for q in gt]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("scale-pq-1m",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from fspann_query_system_spark.ops.pq import (pq_fit, pq_encode,
                                                  pq_topk, ivfpq_topk)
    from fspann_query_system_spark.ops.similarity import ivf_assign, kmeans_fit

    X = make_data(n)
    vec = materialize(spark, X)
    rng = np.random.default_rng(11)
    q_ids = np.sort(rng.choice(n, nq, replace=False))
    queries = (vec.filter(F.col("id").isin([int(q) for q in q_ids]))
               .select(F.col("id").alias("q_id"), "vector").persist())
    queries.count()
    print("computing exact GT...", flush=True)
    gt = exact_gt(X, q_ids)

    out = {"n": n, "nq": nq, "dim": DIM, "m_sub": M_SUB, "pq_k": PQ_K,
           "iters": ITERS}

    t0 = time.time()
    cb = pq_fit(vec, m_sub=M_SUB, k=PQ_K, iters=ITERS)
    cb.count()
    out["pq_fit_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    codes = pq_encode(vec, cb).persist()
    codes.count()
    out["pq_encode_s"] = round(time.time() - t0, 1)

    slim = n > 2_000_000      # 10M: one full-ADC point, IVF does the rest
    for rr in ((256,) if slim else (4, 16, 64, 256)):
        t0 = time.time()
        rows = pq_topk(vec, queries, cb, k=K, rerank=rr,
                       codes=codes).collect()
        w = time.time() - t0
        out[f"adc_r{rr}_ms_q"] = round(1000 * w / nq, 1)
        out[f"adc_r{rr}_recall"] = round(recall(rows, gt), 3)
        print(json.dumps(out), flush=True)

    t0 = time.time()
    cents = kmeans_fit(vec, k=COARSE_K, iters=COARSE_ITERS)
    cents = (cents.select(F.col("cell").alias("id"), "vector"))
    out["coarse_fit_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    assigned = ivf_assign(vec, cents).persist()
    assigned.count()
    out["coarse_assign_s"] = round(time.time() - t0, 1)

    for nprobe, rr in (((32, 256),) if slim
                       else ((16, 64), (32, 64), (32, 256))):
        t0 = time.time()
        rows = ivfpq_topk(vec, queries, cents, cb, k=K, nprobe=nprobe,
                          rerank=rr, assigned=assigned,
                          codes=codes).collect()
        w = time.time() - t0
        out[f"ivfpq_p{nprobe}_r{rr}_ms_q"] = round(1000 * w / nq, 1)
        out[f"ivfpq_p{nprobe}_r{rr}_recall"] = round(recall(rows, gt), 3)
        print(json.dumps(out), flush=True)

    # residual encoding (faiss by_residual): same budgets, finer codes
    from fspann_query_system_spark.ops.pq import residual_table
    t0 = time.time()
    res = residual_table(vec, cents, assigned=assigned)
    cb_r = pq_fit(res, m_sub=M_SUB, k=PQ_K, iters=ITERS)
    codes_r = pq_encode(res, cb_r).persist()
    codes_r.count()
    out["residual_fit_encode_s"] = round(time.time() - t0, 1)
    for nprobe, rr in (((32, 16), (32, 64)) if slim
                       else ((16, 4), (32, 4), (32, 16), (32, 64))):
        t0 = time.time()
        rows = ivfpq_topk(vec, queries, cents, cb_r, k=K, nprobe=nprobe,
                          rerank=rr, assigned=assigned, codes=codes_r,
                          by_residual=True).collect()
        w = time.time() - t0
        out[f"ivfpqR_p{nprobe}_r{rr}_ms_q"] = round(1000 * w / nq, 1)
        out[f"ivfpqR_p{nprobe}_r{rr}_recall"] = round(recall(rows, gt), 3)
        print(json.dumps(out), flush=True)

    with open("/root/repo/tools/scale_pq_1m.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
