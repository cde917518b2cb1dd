"""kNN self-join (kNN-graph builder) scale measurement — SCALE.md §9g.

Round-6 verdict Missing #3: `knn_join` (ops/similarity.py) — the
SemDeDup/label-propagation graph primitive — had plan-shape arguments
(cell co-partitioned equi-join, nothing broadcast/collected, no
CartesianProduct) but no published scale point.  This script measures
at 1M and 10M embeddings:

  * wall + edges/s for the full n-row kNN graph (k, nprobe knobs);
  * the PAIR-EXPANSION FACTOR: scored candidate pairs vs the balanced
    prediction n²·nprobe/|C| — the number that decides whether the
    plan survives 100×;
  * graph recall vs an exact numpy oracle on a row sample (does
    nprobe-cell blocking find the true neighbours?).

Corpus: §9b's deterministic map-only generator (256 natural clusters,
vector = f(id), no driver materialization).  The quantizer is
`kmeans_fit` at |C| = n/target_cell cells — |C| grows WITH n (the §9b
discipline), so per-cell work stays bounded at any corpus size.

Usage: python3 tools/scale_knn_join.py [n] [k] [nprobe] [fit_fraction]
                                       [shuffle_dtype]
(10M needs SPARK_GRAFT_DRIVER_MEM=96g.)

Round-8 additions (verdict r07 Next #2/#3):
  * fit_fraction (default 0.1 past 1M, 1.0 below): kmeans_fit trains
    Lloyd on a deterministic hash sample — the 10M quantizer fit was a
    234 s setup tax on every IVF-family run; sampling cuts it linearly
    at equal downstream recall (centroids depend on cluster geometry,
    which a uniform sample preserves).
  * shuffle_dtype (default "float"): the probe side of knn_join ships
    n·nprobe FULL vectors; at 10M × nprobe 8 the float64 form spilled
    ~90 GB against 68 GB free /tmp and died.  The generator emits
    float32-REPRESENTABLE doubles (the at-rest contract), so the
    float shuffle is lossless here — emitted distances bit-identical.
  * shuffle_dtype "sq8" switches to knn_join_sq8 (probe side = dim
    BYTES per row, 8x under float64; member side float32; rerank 2
    exact re-rank) — the nprobe-16+ single-box path where even the
    float32 probe shuffle would exceed the filesystem.

Round-8 graph-consumer step (env KNN_LP=1): after the graph is built
and persisted, time 2 rounds of ops/graph.label_propagate over it
with a 1% seed set labeled by the generator's TRUE natural cluster
(id % 256), and report coverage (nodes reached in 2 hops) and
accuracy (propagated label == true cluster) — the end-to-end cost of
the semi-supervised classification pass a curation pipeline runs on
top of the graph it already built.

Late-r8 consumer steps: KNN_PR=1 times 2 integer PageRank rounds over
the persisted graph (the coreset/centrality pass) and reports the
score spread; KNN_MUTUAL=1 times the mutual-kNN symmetrization and
reports the reciprocated-edge fraction (the hubness diagnostic).

Round-9 additions (verdict r08 Next #4/#5):
  * KNN_PROBE_MASS=<m> switches probing (either dtype path) to the
    per-row ADAPTIVE mass budget (knn_join(probe_mass=)): every
    prober scans ≥ m candidate mass, cells in quantized-distance
    order — nprobe is then only a label in the output.  The skew
    premium fixed nprobe pays (the measured ×1.19–1.24 pair
    expansion) collapses to the half-cell overshoot.
  * KNN_LP_ITERS="4,6,8" measures label_propagate at each depth
    (checkpoint_every=2) over the built graph: coverage + accuracy +
    wall per depth — the iteration-depth law (§9h addendum).
"""

from __future__ import annotations

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
TARGET_CELL = 1000           # rows per coarse cell: |C| = max(64, n/1000)
# per-row work = nprobe × TARGET_CELL GEMM distances; |C| grows with n
# so this stays constant at any corpus size (the §9b discipline)


def gen_embeddings(spark, n: int):
    """§9b generator, dup-free: (id, vector), vector = f(id) map-side."""
    centers = np.random.default_rng(42).normal(0, 4.0, (N_CENTERS, DIM))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            V = np.empty((len(ids), DIM))
            for i, b in enumerate(ids):
                V[i] = centers[b % N_CENTERS] + \
                    np.random.default_rng(int(b)).normal(0, 1.4, DIM)
            # float32-representable doubles (the at-rest contract):
            # makes shuffle_dtype="float" a LOSSLESS compaction
            V = V.astype(np.float32).astype(np.float64)
            yield pd.DataFrame({"id": ids, "vector": list(V)})

    return (spark.range(n).repartition(64)
            .mapInPandas(run, schema="id LONG, vector ARRAY<DOUBLE>")
            .persist())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    fit_fraction = (float(sys.argv[4]) if len(sys.argv) > 4
                    else (0.1 if n > 1_000_000 else 1.0))
    shuffle_dtype = sys.argv[5] if len(sys.argv) > 5 else "float"
    n_cells = max(64, n // TARGET_CELL)
    spark = get_spark("scale-knn-join",
                      extra_conf={
                          "spark.ui.showConsoleProgress": "false",
                          # staged sq8 runs checkpoint group partials to
                          # disk; let the cleaner delete superseded ones
                          # and compress what lives
                          "spark.cleaner.referenceTracking.cleanCheckpoints":
                              "true",
                          "spark.checkpoint.compress": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    # stale scratch from a previous crashed run eats the budget this
    # run's shuffle needs (a hard-killed JVM leaves its blockmgr dir
    # and checkpoint tree behind — measured 33 GB of a 94 GB fs)
    import shutil
    shutil.rmtree("/tmp/knn_join_ckpt", ignore_errors=True)
    spark.sparkContext.setCheckpointDir("/tmp/knn_join_ckpt")

    from fspann_query_system_spark.ops.similarity import (
        kmeans_fit, ivf_assign, knn_join)

    t0 = time.time()
    emb = gen_embeddings(spark, n)
    emb.count()
    print(f"materialize {n} embeddings: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    cent = kmeans_fit(emb, k=n_cells, iters=2,
                      fit_fraction=fit_fraction).persist()
    cent.count()
    print(f"kmeans_fit |C|={n_cells} (iters=2, fit_fraction="
          f"{fit_fraction}): {time.time()-t0:.1f}s "
          f"(one-off quantizer train, shared with the whole IVF family)",
          flush=True)

    # cell balance + the predicted pair expansion Σ|cell|² ≈ n²/|C|
    assigned = ivf_assign(emb, cent, c_id_col="cell").persist()
    sizes = (assigned.groupBy("cell").count()
             .agg(F.count("*").alias("cells"),
                  F.max("count").alias("max"),
                  F.expr("percentile(count, 0.5)").alias("p50"),
                  F.expr("percentile(count, 0.99)").alias("p99"),
                  F.sum(F.col("count") * F.col("count")).alias("sum_sq"))
             .collect()[0])
    import os as _os
    if _os.environ.get("KNN_PROBE_MASS"):
        # adaptive budget: every prober scans >= probe_mass candidates
        # (plus its last cell's overshoot) — prediction is n·mass
        pred_pairs = n * int(_os.environ["KNN_PROBE_MASS"])
    else:
        pred_pairs = nprobe * n * n / n_cells
    print(f"cells hit {sizes.cells}/{n_cells}, size p50 {sizes.p50:.0f} "
          f"p99 {sizes.p99:.0f} max {sizes['max']}; Σ|cell|² = "
          f"{sizes.sum_sq:.3g} (balanced n²/|C| = {n*n/n_cells:.3g})",
          flush=True)

    import os
    probe_mass = (int(os.environ["KNN_PROBE_MASS"])
                  if os.environ.get("KNN_PROBE_MASS") else None)
    if probe_mass:
        print(f"ADAPTIVE probing: probe_mass={probe_mass} "
              f"(nprobe arg ignored)", flush=True)
    t0 = time.time()
    if shuffle_dtype == "sq8":
        from fspann_query_system_spark.ops.similarity import (knn_join_sq8,
                                                              sq8_stats)
        mins, maxs = sq8_stats(emb)
        pg = int(os.environ.get("KNN_PROBE_GROUPS", "1"))
        graph = knn_join_sq8(emb, cent, mins, maxs, k=k, nprobe=nprobe,
                             rerank=2, c_id_col="cell", assigned=assigned,
                             shuffle_dtype="float", probe_groups=pg,
                             checkpoint_mode="reliable" if pg > 1
                             else "local", probe_mass=probe_mass)
    else:
        graph = knn_join(emb, cent, k=k, nprobe=nprobe,
                         c_id_col="cell", assigned=assigned,
                         shuffle_dtype=shuffle_dtype,
                         probe_mass=probe_mass)
    # persist: the recall sample below joins against the graph — an
    # unpersisted graph RE-RUNS the entire join for it (measured ~17
    # wasted minutes at 10M).  The materialized graph is n·k skinny
    # rows (~3 GB at 10M), cheap next to the join it saves.
    graph = graph.persist()
    edges = graph.count()
    wall = time.time() - t0
    print(f"knn_join k={k} nprobe={nprobe} shuffle_dtype={shuffle_dtype}: "
          f"{wall:.1f}s -> {edges} edges "
          f"= {edges/wall:,.0f} edges/s ({n/wall:,.0f} rows/s)", flush=True)

    # graph recall vs exact: sample rows, exact kNN by blocked BLAS over
    # the deterministic generator (no corpus collect).  Runs BEFORE the
    # expansion census so the headline number survives a wall-clock
    # kill of a long run.
    sample = np.random.default_rng(9).choice(n, 200, replace=False)
    rows = (graph.join(
        emb.sparkSession.createDataFrame([(int(s),) for s in sample],
                                         "q_id LONG"), "q_id")
        .collect())
    got = {}
    for r in rows:
        got.setdefault(r.q_id, set()).add(r.id)
    # exact oracle: materialize X once, driver-side (10M x 64 f32 = 2.4GB)
    t0 = time.time()
    X = np.empty((n, DIM), dtype=np.float32)
    centers = np.random.default_rng(42).normal(0, 4.0, (N_CENTERS, DIM))
    step = 1_000_000
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        for i in range(lo, hi):
            X[i] = centers[i % N_CENTERS] + \
                np.random.default_rng(i).normal(0, 1.4, DIM)
    Xd = X.astype(np.float64)
    sq = (Xd * Xd).sum(1)
    rec = []
    for s in sample:
        d2 = sq - 2.0 * (Xd @ Xd[s])
        d2[s] = np.inf                     # exclude_self semantics
        top = np.argpartition(d2, k)[:k]
        gt = set(top[np.argsort(d2[top], kind="stable")].tolist())
        rec.append(len(got.get(int(s), set()) & gt) / k)
    print(f"graph recall@{k} vs exact (200-row sample): "
          f"{float(np.mean(rec)):.4f} (oracle build {time.time()-t0:.0f}s)",
          flush=True)

    # actual candidate expansion: per-cell probers × members
    from fspann_query_system_spark.ops.similarity import _nearest_cells
    _mass = None
    if probe_mass:
        _mass = ({r["cell"]: r["count"] for r in
                  assigned.groupBy("cell").count().collect()}, probe_mass)
    pc = (_nearest_cells(emb, cent, nprobe, "id", "vector", "cell", "vector",
                         keep_vector=False, mass=_mass)
          .groupBy("cell").agg(F.count("*").alias("np_")))
    mc = assigned.groupBy("cell").agg(F.count("*").alias("nm"))
    actual = (pc.join(mc, "cell")
              .agg(F.sum(F.col("np_").cast("double") * F.col("nm")))
              .collect()[0][0])
    print(f"scored pairs {actual:.3g} vs balanced prediction "
          f"{pred_pairs:.3g} -> expansion factor x{actual/pred_pairs:.2f} "
          f"of prediction, {actual/(n*n):.2e} of n²", flush=True)

    if os.environ.get("KNN_LP_ITERS"):
        # iteration-depth law (verdict r08 Next #4): coverage/accuracy/
        # wall at each depth, checkpoint_every=2 cutting the lineage
        from fspann_query_system_spark.ops.graph import label_propagate
        seeds = (emb.filter(F.col("id") % 100 == 0)
                 .select("id", (F.col("id") % N_CENTERS).alias("label")))
        g6 = (graph.select("q_id", "id", F.round("dist", 6).alias("dist"))
              .persist())
        g6.count()
        for it in [int(x) for x in
                   os.environ["KNN_LP_ITERS"].split(",")]:
            t0 = time.time()
            lp = label_propagate(g6, seeds, iters=it,
                                 checkpoint_every=2).persist()
            reached = lp.count()
            lp_wall = time.time() - t0
            correct = lp.filter(
                F.col("label") == (F.col("id") % N_CENTERS)).count()
            print(f"label_propagate iters={it} (checkpoint_every=2) over "
                  f"{edges} edges, {n//100} seeds: {lp_wall:.1f}s -> "
                  f"{reached} reached ({reached/n:.3f} of corpus), "
                  f"accuracy {correct/reached:.4f}", flush=True)
            lp.unpersist()
        g6.unpersist()

    if os.environ.get("KNN_LP") == "1":
        from fspann_query_system_spark.ops.graph import label_propagate
        seeds = (emb.filter(F.col("id") % 100 == 0)
                 .select("id", (F.col("id") % N_CENTERS).alias("label")))
        t0 = time.time()
        lp = label_propagate(
            graph.select("q_id", "id", F.round("dist", 6).alias("dist")),
            seeds, iters=2).persist()
        reached = lp.count()
        lp_wall = time.time() - t0
        correct = lp.filter(
            F.col("label") == (F.col("id") % N_CENTERS)).count()
        print(f"label_propagate iters=2 over {edges} edges, "
              f"{n//100} seeds: {lp_wall:.1f}s -> {reached} nodes reached "
              f"({reached/n:.3f} of corpus), accuracy vs true cluster "
              f"{correct/reached:.4f}", flush=True)
        lp.unpersist()

    if os.environ.get("KNN_PR") == "1":
        from fspann_query_system_spark.ops.graph import pagerank
        t0 = time.time()
        pr = pagerank(graph.select("q_id", "id"), nodes=emb,
                      iters=2).persist()
        n_pr = pr.count()
        pr_wall = time.time() - t0
        stats = pr.agg(F.min("score"), F.expr("percentile(score, 0.5)"),
                       F.expr("percentile(score, 0.99)"),
                       F.max("score")).collect()[0]
        print(f"pagerank iters=2 over {edges} edges: {pr_wall:.1f}s -> "
              f"{n_pr} nodes, score min {stats[0]:.3f} p50 {stats[1]:.3f} "
              f"p99 {stats[2]:.3f} max {stats[3]:.3f}", flush=True)
        pr.unpersist()

    if os.environ.get("KNN_MUTUAL") == "1":
        from fspann_query_system_spark.ops.graph import mutual_knn
        t0 = time.time()
        n_mut = mutual_knn(graph).count()
        print(f"mutual_knn over {edges} edges: {time.time()-t0:.1f}s -> "
              f"{n_mut} mutual pairs (reciprocated fraction "
              f"{2*n_mut/edges:.3f})", flush=True)

    if os.environ.get("KNN_CORESET") == "1":
        # the coreset MARGINAL over an already-built graph: pagerank +
        # one reuse of the persisted assignment + one cell-keyed window
        from fspann_query_system_spark.ops.graph import pagerank
        from pyspark.sql.window import Window as W
        t0 = time.time()
        pr = pagerank(graph.select("q_id", "id"), nodes=emb, iters=2)
        rk = W.partitionBy("cell").orderBy(F.col("score").desc(), "id")
        kept = (pr.join(assigned.select("id", "cell"), "id")
                .withColumn("cr", F.row_number().over(rk))
                .filter(F.col("cr") <= 10).count())
        print(f"graph_coreset marginal (PR + window, keep 10/cell): "
              f"{time.time()-t0:.1f}s -> {kept} rows kept", flush=True)


if __name__ == "__main__":
    main()
