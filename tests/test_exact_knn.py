"""Exact-KNN oracle (J5/A3): blocked == crossJoin == numpy brute force;
deterministic tie-break by id."""

import numpy as np

from pyspark.sql import functions as F

from fspann_query_system_spark.query.exact import (knn_exact,
                                                   knn_exact_crossjoin,
                                                   groundtruth_table)


def numpy_knn(X, Q, k):
    out = []
    for qi in range(len(Q)):
        d = np.sqrt(np.square(X - Q[qi]).sum(axis=1))
        order = np.lexsort((np.arange(len(X)), d))[:k]
        out.append(order.tolist())
    return out


def test_blocked_matches_numpy_and_crossjoin(spark, clustered):
    df, X = clustered
    rng = np.random.default_rng(9)
    Q = X[:7] + rng.normal(0, 0.1, (7, X.shape[1]))
    qdf = spark.createDataFrame(
        [(i, Q[i].tolist()) for i in range(7)], "q_id LONG, vector ARRAY<DOUBLE>")

    got = knn_exact(df, qdf, k=5).orderBy("q_id", "rank").collect()
    want = numpy_knn(X, Q, 5)
    got_ids = {}
    for r in got:
        got_ids.setdefault(r.q_id, []).append(r.id)
    assert all(got_ids[q] == want[q] for q in range(7))

    cj = knn_exact_crossjoin(df, qdf, k=5).orderBy("q_id", "rank").collect()
    assert [r.id for r in cj] == [r.id for r in got]
    assert max(abs(a.distance - b.distance) for a, b in zip(cj, got)) < 1e-9


def test_k_larger_than_n(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)], "id LONG, vector ARRAY<DOUBLE>")
    q = spark.createDataFrame([(0, [0.0, 0.0])], "q_id LONG, vector ARRAY<DOUBLE>")
    rows = knn_exact(df, q, k=10).collect()
    assert len(rows) == 3


def test_groundtruth_table_layout(spark, clustered):
    df, X = clustered
    q = df.limit(3).select(F.col("id").alias("q_id"), "vector")
    gt = groundtruth_table(df, q, k=4).collect()
    assert len(gt) == 3
    for r in gt:
        assert len(r.neighbor_ids) == 4
        assert r.neighbor_ids[0] == r.q_id  # self is nearest
