"""Greedy block partitioning invariants (reference GreedyPartitioner.build)."""

import numpy as np

from pyspark.sql import functions as F

from fspann_query_system_spark.lsh.coding import code_vectors
from fspann_query_system_spark.lsh.params import LshConfig, fit_params
from fspann_query_system_spark.lsh.partitioner import build_partitions


def test_blocks_cover_sorted_keys(spark):
    rng = np.random.default_rng(3)
    sample = rng.normal(0, 1, (300, 8))
    cfg = LshConfig(dim=8, m=4, lam=2, tables=1, divisions=1, seed=5, block_size=32)
    params = fit_params(sample, cfg)
    df = spark.createDataFrame(
        [(i, sample[i].tolist()) for i in range(300)], "id LONG, vector ARRAY<DOUBLE>")
    codes = code_vectors(df, params)
    with_part, bounds = build_partitions(codes, cfg.block_size)

    b = {r.part_idx: r for r in bounds.collect()}
    # 300 rows / 32 => 10 blocks; last has 12
    assert len(b) == 10
    assert sum(r.n_ids for r in b.values()) == 300
    assert b[9].n_ids == 300 - 9 * 32

    # bounds ordered + consistent with membership
    rows = with_part.collect()
    for r in rows:
        assert b[r.part_idx].min_key <= r.code_key <= b[r.part_idx].max_key
    for i in range(9):
        assert b[i].max_key <= b[i + 1].min_key

    # representative = middle element of the sorted block
    ordered = sorted(rows, key=lambda r: (r.code_key, r.id))
    for pi, br in b.items():
        block = ordered[pi * 32:(pi + 1) * 32]
        mid = block[(len(block) - 1) // 2]
        assert br.center_key == mid.code_key
        assert br.rep_bits == mid.code_bits


def test_part_assignment_deterministic(spark):
    rng = np.random.default_rng(3)
    sample = rng.normal(0, 1, (100, 8))
    cfg = LshConfig(dim=8, m=4, lam=2, tables=2, divisions=1, seed=5, block_size=16)
    params = fit_params(sample, cfg)
    df = spark.createDataFrame(
        [(i, sample[i].tolist()) for i in range(100)], "id LONG, vector ARRAY<DOUBLE>")
    a, _ = build_partitions(code_vectors(df, params), 16)
    b, _ = build_partitions(code_vectors(df, params), 16)
    assert sorted(map(tuple, a.select("id", "table", "division", "part_idx").collect())) == \
           sorted(map(tuple, b.select("id", "table", "division", "part_idx").collect()))
