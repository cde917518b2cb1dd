"""ops/graph.py: label propagation + hard-negative mining over the
knn_join graph."""

import pytest

from pyspark.sql import functions as F

from fspann_query_system_spark.ops.graph import (label_propagate,
                                                 hard_negatives,
                                                 graph_coreset,
                                                 mutual_knn, pagerank,
                                                 M_SCALE, W_SCALE,
                                                 PR_SCALE)


def _hand_graph(spark):
    # q pulls from n: 2<-1, 3<-2, 4<-5, 6<-{2 (near), 5 (far)};
    # 7 has no inbound edges and is unreachable
    edges = [(2, 1, 0.1), (3, 2, 0.1), (4, 5, 0.1),
             (6, 2, 0.1), (6, 5, 0.3)]
    seeds = [(1, 0), (5, 1)]     # node 1 -> class 0, node 5 -> class 1
    e = spark.createDataFrame(edges, "q_id LONG, id LONG, dist DOUBLE")
    s = spark.createDataFrame(seeds, "id LONG, label INT")
    return e, s


def _mirror(edges, seeds, iters):
    """Pure-Python mirror of the documented integer algorithm."""
    w = {(q, n): round(W_SCALE / (1 + d)) for q, n, d in edges}
    seed_lab = dict(seeds)
    mass = {(i, lab): M_SCALE for i, lab in seeds}
    for _ in range(iters):
        raw = {}
        for (q, n), wt in w.items():
            for (i, lab), m in mass.items():
                if i == n:
                    raw[(q, lab)] = raw.get((q, lab), 0) + wt * m
        tot = {}
        for (q, lab), m in raw.items():
            tot[q] = tot.get(q, 0) + m
        mass = {(q, lab): m * M_SCALE // tot[q]
                for (q, lab), m in raw.items()
                if m * M_SCALE // tot[q] > 0 and q not in seed_lab}
        mass.update({(i, lab): M_SCALE for i, lab in seeds})
    best = {}
    for (i, lab), m in mass.items():
        cur = best.get(i)
        if cur is None or (m, -lab) > (cur[1], -cur[0]):
            best[i] = (lab, m)
    return {i: (lab, round(m / M_SCALE, 6), i in seed_lab)
            for i, (lab, m) in best.items()}


def test_label_propagate_matches_integer_mirror(spark):
    """The Spark plan reproduces the documented integer algorithm
    EXACTLY (same masses, argmax, confidence) on a hand graph with a
    mixed-neighbourhood node, and hop semantics hold: node 3 is two
    hops from its seed, so it appears at iters=2 but not iters=1;
    node 7 (no inbound path) never appears."""
    e, s = _hand_graph(spark)
    edges = [(r.q_id, r.id, r.dist) for r in e.collect()]
    seeds = [(r.id, r.label) for r in s.collect()]

    for iters in (1, 2):
        got = {r.id: (r.label, r.confidence, r.is_seed)
               for r in label_propagate(e, s, iters=iters).collect()}
        assert got == _mirror(edges, seeds, iters), f"iters={iters}"

    one_hop = {r.id for r in label_propagate(e, s, iters=1).collect()}
    two_hop = {r.id for r in label_propagate(e, s, iters=2).collect()}
    assert 3 not in one_hop and 3 in two_hop
    assert 7 not in two_hop


def test_label_propagate_seeds_clamped_and_mixed_node_weighted(spark):
    """Seeds keep their label at confidence 1.0 even when surrounded
    by other-label mass; the mixed node (6) takes the NEARER seed's
    class (weights decay with distance)."""
    e, s = _hand_graph(spark)
    out = {r.id: r for r in label_propagate(e, s, iters=2).collect()}
    assert out[1].label == 0 and out[1].confidence == 1.0 and out[1].is_seed
    assert out[5].label == 1 and out[5].confidence == 1.0 and out[5].is_seed
    assert out[6].label == 0 and not out[6].is_seed
    assert 0.5 < out[6].confidence < 1.0


def test_label_propagate_recovers_clusters(spark, clustered):
    """On the 8-cluster fixture with ONE seed per cluster, every
    labeled non-seed node gets its own cluster's label (the kNN graph
    never crosses the well-separated clusters)."""
    from fspann_query_system_spark.ops.similarity import knn_join
    df, X = clustered
    small = df.filter(F.col("id") < 1000)                  # 4 clusters
    cents = small.filter(F.col("id") % 250 == 0)           # 1 per cluster
    graph = (knn_join(small, cents, k=5, nprobe=2)
             .select("q_id", "id", F.round("dist", 6).alias("dist")))
    seeds = (small.filter(F.col("id") % 250 == 1)
             .select("id", (F.col("id") / 250).cast("int").alias("label")))
    out = label_propagate(graph, seeds, iters=3).collect()
    assert len(out) > 8                                    # spread happened
    assert all(r.label == r.id // 250 for r in out)
    assert all(0.0 < r.confidence <= 1.0 for r in out)


def test_hard_negatives_equals_filtered_reranked_pool(spark, clustered):
    """hard_negatives == the knn_join pool_k pool, label-filtered and
    re-ranked (exact row equality), every pair label-mismatched, ranks
    contiguous from 1, at most k per anchor."""
    from fspann_query_system_spark.ops.similarity import knn_join
    df, X = clustered
    small = df.filter(F.col("id") < 600)
    cents = small.filter(F.col("id") % 100 == 0)
    labels = small.select("id", (F.col("id") % 4).alias("label"))
    got = sorted((r.q_id, r.id, r.dist, r.rank) for r in
                 hard_negatives(small, cents, labels, k=3, pool_k=10,
                                nprobe=2).collect())

    pool = knn_join(small, cents, k=10, nprobe=2).collect()
    want, per_q = [], {}
    for r in sorted(pool, key=lambda r: (r.q_id, r.dist, r.id)):
        if (r.q_id % 4) != (r.id % 4):
            n = per_q.get(r.q_id, 0) + 1
            per_q[r.q_id] = n
            if n <= 3:
                want.append((r.q_id, r.id, r.dist, n))
    assert got == sorted(want)
    ranks = {}
    for q, i, d, rk in got:
        ranks.setdefault(q, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in ranks.values())
    assert all(len(v) <= 3 for v in ranks.values())


def test_hard_negatives_k_gt_pool_raises(spark, clustered):
    df, X = clustered
    small = df.limit(50)
    labels = small.select("id", F.lit(0).alias("label"))
    with pytest.raises(ValueError):
        hard_negatives(small, small.limit(2), labels, k=30, pool_k=10)


def test_label_propagate_symmetric_reaches_upstream(spark):
    """symmetric=True propagates along both edge directions (the
    coverage lever of SCALE.md §9h's depth law): on a directed chain
    0->1->2 with the seed at node 0, the directed pass can NEVER
    label anything (mass flows q <- n, and no node pulls from 0's
    upstream side... rather: nodes pull from their kNN; only nodes
    whose edges point AT the seed are reached), while the symmetric
    pass reaches the whole chain.  Equality with the directed pass
    on an already-symmetric edge set pins that the option only adds
    the reversed copies."""
    # chain: q pulls from n — node 1 pulls from 0, node 2 pulls from 1
    e = spark.createDataFrame([(1, 0, 1.0), (2, 1, 1.0)],
                              "q_id LONG, id LONG, dist DOUBLE")
    s = spark.createDataFrame([(0, 7)], "id LONG, label LONG")
    directed = {r.id for r in label_propagate(e, s, iters=2).collect()}
    assert directed == {0, 1, 2}          # downstream pulls work
    # reverse the chain: 0 pulls from 1, 1 pulls from 2 — seed 0 now
    # has no path TO anyone (nobody pulls from 0)
    er = spark.createDataFrame([(0, 1, 1.0), (1, 2, 1.0)],
                               "q_id LONG, id LONG, dist DOUBLE")
    directed_r = {r.id for r in label_propagate(er, s, iters=2).collect()}
    assert directed_r == {0}              # frontier dead on arrival
    sym = {r.id: r for r in label_propagate(er, s, iters=2,
                                            symmetric=True).collect()}
    assert set(sym) == {0, 1, 2}          # symmetrization crosses it
    assert sym[1].label == 7 and sym[2].label == 7
    # on an already-symmetric edge set, symmetric=True only doubles
    # each weight — same normalized masses, same output
    both = e.unionByName(er)
    a = sorted((r.id, r.label, r.confidence) for r in
               label_propagate(both, s, iters=2).collect())
    b = sorted((r.id, r.label, r.confidence) for r in
               label_propagate(both, s, iters=2,
                               symmetric=True).collect())
    assert a == b


def test_label_propagate_bad_iters_raises(spark):
    e, s = _hand_graph(spark)
    with pytest.raises(ValueError):
        label_propagate(e, s, iters=0)


def _pr_mirror(edges, nodes, iters):
    """Pure-Python mirror of pagerank's documented integer algorithm."""
    deg = {}
    for q, n in edges:
        deg[q] = deg.get(q, 0) + 1
    base = PR_SCALE * 15 // 100
    r = {v: PR_SCALE for v in nodes}
    for _ in range(iters):
        recv = {}
        for q, n in edges:
            recv[n] = recv.get(n, 0) + r[q] // deg[q]
        r = {v: base + 85 * recv.get(v, 0) // 100 for v in nodes}
    return {v: round(m / PR_SCALE, 6) for v, m in r.items()}


def test_pagerank_matches_integer_mirror(spark):
    """The Spark plan reproduces the documented integer algorithm
    EXACTLY on a hand graph with a hub, a chain, and an isolated node
    (which must hold exactly the damped base score)."""
    # 1->3, 2->3, 4->3 (3 is a hub); 3->1; 5 isolated (in nodes only)
    edges = [(1, 3), (2, 3), (4, 3), (3, 1),
             (1, 2), (2, 1), (4, 1)]
    nodes = [1, 2, 3, 4, 5]
    e = spark.createDataFrame(edges, "q_id LONG, id LONG")
    n = spark.createDataFrame([(v,) for v in nodes], "id LONG")
    for iters in (1, 2, 3):
        got = {r.id: r.score
               for r in pagerank(e, nodes=n, iters=iters).collect()}
        assert got == _pr_mirror(edges, nodes, iters), f"iters={iters}"
    out = {r.id: r.score for r in pagerank(e, nodes=n, iters=2).collect()}
    assert out[5] == round((PR_SCALE * 15 // 100) / PR_SCALE, 6)
    assert out[3] > out[4]                      # hub outranks a leaf


def test_pagerank_release_modes_equal(spark):
    """release=False (lazy, composed/bench mode) returns the identical
    integer-exact result as the default eager-hygiene mode, and the
    lazy mode adds NO job before the caller's action (its plan is
    unevaluated on return).  Same for graph_coreset's passthrough."""
    edges = [(1, 3), (2, 3), (4, 3), (3, 1), (1, 2), (2, 1), (4, 1)]
    e = spark.createDataFrame(edges, "q_id LONG, id LONG")
    n = spark.createDataFrame([(v,) for v in range(1, 6)], "id LONG")
    eager = {r.id: r.score
             for r in pagerank(e, nodes=n, iters=2).collect()}
    lazy_df = pagerank(e, nodes=n, iters=2, release=False)
    # lazy mode must return a PLAN (joins still visible), not the
    # eager mode's checkpointed scan — that laziness IS the fix
    assert "Join" in lazy_df._jdf.queryExecution().optimizedPlan() \
        .toString()
    lazy = {r.id: r.score for r in lazy_df.collect()}
    assert lazy == eager


def test_graph_coreset_release_modes_equal(spark, clustered):
    df, X = clustered
    small = df.filter(F.col("id") < 600)
    cents = small.filter(F.col("id") % 200 == 0)
    kw = dict(keep_per_cell=2, k=5, nprobe=2, iters=2)
    eager = sorted(map(tuple, graph_coreset(small, cents, **kw).collect()))
    lazy = sorted(map(tuple, graph_coreset(small, cents, release=False,
                                           **kw).collect()))
    assert lazy == eager


def test_pagerank_default_nodes_and_bad_iters(spark):
    """Without an explicit node set, the universe is the distinct edge
    endpoints; iters=0 raises."""
    e = spark.createDataFrame([(1, 2), (2, 1), (1, 3)],
                              "q_id LONG, id LONG")
    got = {r.id for r in pagerank(e, iters=1).collect()}
    assert got == {1, 2, 3}
    with pytest.raises(ValueError):
        pagerank(e, iters=0)


def test_pagerank_centrality_on_knn_graph(spark, clustered):
    """Over a real kNN graph, every node holds at least the damped
    base score and cluster cores outrank the global median (scores
    spread, not constant)."""
    from fspann_query_system_spark.ops.similarity import knn_join
    df, X = clustered
    small = df.filter(F.col("id") < 1000)
    cents = small.filter(F.col("id") % 250 == 0)
    graph = knn_join(small, cents, k=5, nprobe=2).select("q_id", "id")
    out = pagerank(graph, nodes=small, iters=2).collect()
    assert len(out) == 1000
    base = round((PR_SCALE * 15 // 100) / PR_SCALE, 6)
    scores = sorted(r.score for r in out)
    assert scores[0] >= base
    assert scores[-1] > 2 * scores[0]           # real spread


def test_mutual_knn_hand_graph(spark):
    """Only reciprocated pairs survive, one row per unordered pair,
    with both direction ranks carried."""
    edges = [(1, 2, 0.5, 1), (2, 1, 0.5, 2),     # mutual
             (1, 3, 0.7, 2), (3, 1, 0.7, 1),     # mutual
             (2, 3, 0.9, 3),                     # one-way only
             (4, 1, 0.2, 1)]                     # one-way only
    e = spark.createDataFrame(
        edges, "q_id LONG, id LONG, dist DOUBLE, rank LONG")
    got = sorted((r.id_a, r.id_b, r.dist, r.rank_ab, r.rank_ba)
                 for r in mutual_knn(e).collect())
    assert got == [(1, 2, 0.5, 1, 2), (1, 3, 0.7, 2, 1)]


def test_graph_coreset_equals_composed_pieces(spark, clustered):
    """graph_coreset == knn_join -> pagerank -> ivf_assign -> per-cell
    top-m by (score desc, id), exact row equality; per-cell keep bound
    holds and kept rows are each cell's score maxima."""
    from fspann_query_system_spark.ops.similarity import ivf_assign, knn_join
    df, X = clustered
    small = df.filter(F.col("id") < 800)
    cents = small.filter(F.col("id") % 200 == 0)
    got = sorted((r.id, r.cell, r.score, r.cell_rank) for r in
                 graph_coreset(small, cents, keep_per_cell=3, k=5,
                               nprobe=2, iters=2).collect())

    graph = knn_join(small, cents, k=5, nprobe=2).select("q_id", "id")
    pr = {r.id: r.score for r in
          pagerank(graph, nodes=small, iters=2).collect()}
    cell = {r.id: r.cell for r in ivf_assign(small, cents).collect()}
    by_cell = {}
    for i, s in pr.items():
        by_cell.setdefault(cell[i], []).append((-s, i))
    want = []
    for c, rows in by_cell.items():
        for rk, (neg_s, i) in enumerate(sorted(rows)[:3], start=1):
            want.append((i, c, -neg_s, rk))
    assert got == sorted(want)
    per_cell = {}
    for i, c, s, rk in got:
        per_cell.setdefault(c, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_cell.values())
    assert all(len(v) <= 3 for v in per_cell.values())


def test_mutual_knn_subset_of_knn_join(spark, clustered):
    """Every mutual edge exists in both directions of the knn_join
    output, and hub suppression holds: mutual edge count <= directed
    edge count / 2 (each unordered pair once)."""
    from fspann_query_system_spark.ops.similarity import knn_join
    df, X = clustered
    small = df.filter(F.col("id") < 600)
    cents = small.filter(F.col("id") % 100 == 0)
    g = knn_join(small, cents, k=5, nprobe=2)
    directed = {(r.q_id, r.id) for r in g.collect()}
    mut = mutual_knn(g).collect()
    assert 0 < len(mut) <= len(directed) // 2
    for r in mut:
        assert (r.id_a, r.id_b) in directed and (r.id_b, r.id_a) in directed
        assert r.id_a < r.id_b and 1 <= r.rank_ab <= 5 and 1 <= r.rank_ba <= 5


def test_graph_coreset_eager_mode_runs_overflow_guard(spark, clustered,
                                                      monkeypatch):
    """release=True must run pagerank's int64 budget guard at the
    composition boundary (advice r10: it previously inherited the
    guard by calling pagerank(), then lost it with the release= split).
    The guard exists for the SILENT-WRAP regime — under ANSI mode
    Spark already fails loudly on long overflow — so ANSI is disabled
    here and a huge PR_SCALE (budget → 0 nodes) must make the guard
    itself raise; the lazy mode documents the skipped guard instead."""
    import pytest
    from fspann_query_system_spark.ops import graph as G
    df, X = clustered
    small = df.filter(F.col("id") < 300)
    cents = small.filter(F.col("id") % 100 == 0)
    monkeypatch.setattr(G, "PR_SCALE", 2 ** 62)   # budget -> 0 nodes
    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(ValueError, match="overflow"):
            G.graph_coreset(small, cents, keep_per_cell=3, k=5,
                            nprobe=2, iters=1)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)
    # lazy mode: no guard, returns a plan (caller owns the check)
    out = G.graph_coreset(small, cents, keep_per_cell=3, k=5, nprobe=2,
                          iters=1, release=False)
    assert out.columns == ["id", "cell", "score", "cell_rank"]
    spark.catalog.clearCache()
