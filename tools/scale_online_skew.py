"""Online ANN query paths under HEAVY cell-size skew — per-query
latency tails, fixed nprobe vs adaptive probe_mass (SCALE.md §9i
addendum; verdict r10 Next #5).

§9i proved the per-prober scanned-mass bound for the SELF-JOIN; the
latency-SLA claim for the ONLINE paths (`ivf_topk` / `ivfpq_topk`
share `_nearest_cells`) was an argument, not a measurement.  This
script measures it: on the §9i fixture (10M rows, Zipf cell masses,
quantizer trained before the drift), each sampled query runs as its
OWN Spark job (one query per ivf_topk call against the persisted
assignment) and the wall is recorded — the single-query latency a
serving layer would see, including the probe computation, the
candidate equi-join, and the top-k window.

Query sample: stratified by the query's NEAREST CELL mass (heavy /
median / tail thirds by the actual census), because that is the axis
the skew attacks — a dense-region query under fixed nprobe scans the
huge cell end to end; the mass budget hard-bounds it.

Usage: python3 tools/scale_online_skew.py [n] [k] [nprobe] [mass,mass...]
                                          [zipf_s] [per_stratum]
       PQ=1 additionally measures ivfpq_topk (codebook fit + encode
       add ~minutes of setup).
(10M needs SPARK_GRAFT_DRIVER_MEM=96g.)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
# executor python workers must import the generator module too
os.environ["PYTHONPATH"] = os.pathsep.join(
    ["/root/repo", "/root/repo/tools"]
    + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else []))

from pyspark.sql import functions as F                               # noqa: E402

from fspann_query_system_spark.session import get_spark              # noqa: E402
from scale_knn_join import (TARGET_CELL, _zipf_cum,                  # noqa: E402
                            gen_embeddings)


def _tails(walls: list[float]) -> str:
    a = np.array(sorted(walls))
    return (f"p50 {np.percentile(a, 50):.3f}s p99 "
            f"{np.percentile(a, 99):.3f}s max {a[-1]:.3f}s "
            f"(n={len(a)})")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    masses = ([int(x) for x in sys.argv[4].split(",")]
              if len(sys.argv) > 4 else [8000])
    zipf_s = float(sys.argv[5]) if len(sys.argv) > 5 else 0.7
    per_stratum = int(sys.argv[6]) if len(sys.argv) > 6 else 12
    n_cells = max(64, n // TARGET_CELL)
    spark = get_spark("scale-online-skew",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from fspann_query_system_spark.ops.similarity import (
        ivf_assign, ivf_topk, kmeans_fit)

    skew_cum = _zipf_cum(zipf_s)
    t0 = time.time()
    emb = gen_embeddings(spark, n, skew_cum)
    emb.count()
    print(f"materialize {n} embeddings (zipf s={zipf_s}): "
          f"{time.time()-t0:.1f}s", flush=True)

    # §9i regime: quantizer trained BEFORE the drift (balanced sample)
    t0 = time.time()
    fit_src = gen_embeddings(spark, n, None, persist=False)
    cent = kmeans_fit(fit_src, k=n_cells, iters=2,
                      fit_fraction=0.1 if n > 1_000_000 else 1.0
                      ).persist()
    cent.count()
    print(f"kmeans_fit |C|={n_cells} (trained-before-drift): "
          f"{time.time()-t0:.1f}s", flush=True)

    # ivf_topk/ivfpq_topk take centroids on the BASE id column name
    cent_iv = cent.select(F.col("cell").alias("id"), "vector")
    t0 = time.time()
    assigned = ivf_assign(emb, cent, c_id_col="cell").persist()
    assigned.count()
    # the adaptive path collects this census per call; persist the
    # 10k-row aggregate so the per-query collect is a cache hit (a
    # serving layer precomputes it — the residual per-call job is
    # reported honestly in the adaptive walls)
    census_df = assigned.groupBy("cell").count().persist()
    census = {r["cell"]: r["count"] for r in census_df.collect()}
    sizes = np.array(sorted(census.values()))
    print(f"assign + census: {time.time()-t0:.1f}s; cell size p50 "
          f"{np.percentile(sizes, 50):.0f} p99 "
          f"{np.percentile(sizes, 99):.0f} max {sizes[-1]} "
          f"(skew max/p50 {sizes[-1]/np.percentile(sizes, 50):.1f}x)",
          flush=True)

    # stratified query sample by NEAREST-CELL mass: probe a base-row
    # sample once (cheap, one job), bucket by its own cell's census
    # count, take per_stratum ids per third
    probe_rows = (assigned.select("id", "cell")
                  .filter(F.col("id") % (n // 4096) == 0).collect())
    ranked = sorted(census.values())
    lo_cut = ranked[len(ranked) // 3]
    hi_cut = ranked[2 * len(ranked) // 3]
    strata = {"heavy": [], "median": [], "tail": []}
    for r in probe_rows:
        m = census[r.cell]
        key = ("tail" if m <= lo_cut else
               "heavy" if m >= hi_cut else "median")
        if len(strata[key]) < per_stratum:
            strata[key].append(int(r.id))
    print({s: len(v) for s, v in strata.items()}, flush=True)

    pq_on = bool(os.environ.get("PQ"))
    pq_extra = {}
    if pq_on:
        from fspann_query_system_spark.ops.pq import pq_fit, pq_encode
        t0 = time.time()
        codebook = pq_fit(emb, m_sub=8, k=256, iters=2).persist()
        codebook.count()
        codes = pq_encode(emb, codebook).persist()
        codes.count()
        pq_extra = {"codebook": codebook, "codes": codes}
        print(f"pq fit+encode: {time.time()-t0:.1f}s", flush=True)

    # single-row query tables built driver-side (a serving layer has
    # the query vector in hand; deriving it via a join would add an
    # unrelated 10M scan to every latency sample)
    qvec = {int(r.id): list(r.vector) for r in
            emb.filter(F.col("id").isin(
                [i for v in strata.values() for i in v])).collect()}

    def one_query(qid: int, **knobs) -> float:
        q = spark.createDataFrame([(int(qid), qvec[qid])],
                                  "q_id LONG, vector ARRAY<DOUBLE>")
        t0 = time.time()
        ivf_topk(emb, q, cent_iv, k=k,
                 assigned=assigned, **knobs).collect()
        return time.time() - t0

    modes = [("FIXED  nprobe=%d" % nprobe, dict(nprobe=nprobe))]
    modes += [("ADAPTIVE mass=%d" % m, dict(probe_mass=m))
              for m in masses]
    for label, knobs in modes:
        all_walls = []
        for s, ids in strata.items():
            walls = [one_query(i, **knobs) for i in ids]
            all_walls += walls
            print(f"{label}  {s:>6}: {_tails(walls)}", flush=True)
        print(f"{label}  ALL   : {_tails(all_walls)}", flush=True)

    if pq_on:
        from fspann_query_system_spark.ops.pq import ivfpq_topk

        def one_pq(qid: int, **knobs) -> float:
            q = spark.createDataFrame([(int(qid), qvec[qid])],
                                      "q_id LONG, vector ARRAY<DOUBLE>")
            t0 = time.time()
            ivfpq_topk(emb, q, cent_iv, pq_extra["codebook"], k=k,
                       rerank=4, assigned=assigned,
                       codes=pq_extra["codes"], **knobs).collect()
            return time.time() - t0

        for label, knobs in modes:
            all_walls = []
            for s, ids in strata.items():
                walls = [one_pq(i, **knobs) for i in ids]
                all_walls += walls
                print(f"PQ {label}  {s:>6}: {_tails(walls)}", flush=True)
            print(f"PQ {label}  ALL   : {_tails(all_walls)}", flush=True)


if __name__ == "__main__":
    main()
