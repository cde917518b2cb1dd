"""Format round-trips (reference loader test suite: FvecsLoaderTest,
BvecsLoaderTest, IvecsLoaderTest, CsvLoader tolerant parsing,
DefaultDataLoader dispatch)."""

import numpy as np
import pytest

from fspann_query_system_spark.sources.vecfiles import (
    read_fvecs, read_bvecs, read_ivecs,
    write_fvecs, write_bvecs, write_ivecs, groundtruth_to_ivecs)
from fspann_query_system_spark.sources.csv_loader import read_csv_vectors
from fspann_query_system_spark.sources.registry import (load_vectors,
                                                        validate_groundtruth)


def test_fvecs_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(4)
    M = rng.normal(0, 1, (50, 12)).astype(np.float32)
    p = str(tmp_path / "v.fvecs")
    write_fvecs(p, M)
    df = read_fvecs(spark, p)
    rows = {r.id: np.array(r.vector, dtype=np.float32) for r in df.collect()}
    assert len(rows) == 50
    for i in range(50):
        assert np.array_equal(rows[i], M[i])


def test_bvecs_roundtrip_widens(spark, tmp_path):
    rng = np.random.default_rng(5)
    M = rng.integers(0, 256, (30, 8)).astype(np.uint8)
    p = str(tmp_path / "v.bvecs")
    write_bvecs(p, M)
    rows = {r.id: r.vector for r in read_bvecs(spark, p).collect()}
    assert rows[7] == [float(x) for x in M[7]]
    assert all(0.0 <= x <= 255.0 for v in rows.values() for x in v)


def test_ivecs_roundtrip(spark, tmp_path):
    gt = [[3, 1, 4], [1, 5, 9], [2, 6, 5]]
    p = str(tmp_path / "gt.ivecs")
    write_ivecs(p, gt)
    rows = {r.q_id: list(r.neighbor_ids) for r in read_ivecs(spark, p).collect()}
    assert rows == {0: [3, 1, 4], 1: [1, 5, 9], 2: [2, 6, 5]}


def test_csv_tolerant_parsing(spark, tmp_path):
    p = tmp_path / "v.csv"
    p.write_text("﻿# comment line\n"
                 "x,y,z\n"            # header → skipped
                 "1.0, 2.0, 3.0\n"
                 "\n"                 # blank → skipped
                 "4.0;5.0;6.0\n"      # semicolon sep
                 "7.0 8.0 9.0\n"      # whitespace sep
                 "bad,data,here\n")   # malformed → skipped
    rows = {r.id: r.vector for r in read_csv_vectors(spark, str(p)).collect()}
    assert rows == {0: [1.0, 2.0, 3.0], 1: [4.0, 5.0, 6.0], 2: [7.0, 8.0, 9.0]}


def test_dispatch_and_dim_filter(spark, tmp_path):
    p = tmp_path / "v.csv"
    p.write_text("1.0,2.0\n3.0,4.0,5.0\n6.0,7.0\n")
    df = load_vectors(spark, str(p), expected_dim=2)
    assert sorted(tuple(r.vector) for r in df.collect()) == [(1.0, 2.0), (6.0, 7.0)]
    with pytest.raises(ValueError):
        load_vectors(spark, "/tmp/x.weird")


def test_groundtruth_validation(spark, clustered, tmp_path):
    from fspann_query_system_spark.query.exact import groundtruth_table
    from pyspark.sql import functions as F
    df, X = clustered
    q = df.limit(4).select(F.col("id").alias("q_id"), "vector")
    gt = groundtruth_table(df, q, k=5)
    res = validate_groundtruth(gt, dataset_size=len(X), base=df, queries=q)
    assert res["ids_in_range"]
    assert res["sampled_top1_agree"] == res["sampled_top1_total"]
    # ivecs writer round-trip on the GT table
    p = str(tmp_path / "gt.ivecs")
    groundtruth_to_ivecs(gt, p)
    back = read_ivecs(spark, p)
    assert back.count() == 4
    bad = validate_groundtruth(gt, dataset_size=2)
    assert not bad["ids_in_range"]


def test_vecfile_datasource_parallel_scan(spark, tmp_path):
    """Python DataSource splits one vector file into record-aligned range
    partitions (the at-scale property the binaryFile path lacks)."""
    import numpy as np
    from fspann_query_system_spark.sources.vecfiles import write_fvecs, write_ivecs
    from fspann_query_system_spark.sources import datasource
    datasource.register(spark)

    rng = np.random.default_rng(21)
    M = rng.normal(0, 1, (103, 9)).astype(np.float32)
    p = str(tmp_path / "v.fvecs")
    write_fvecs(p, M)
    df = (spark.read.format("vecfile").option("numPartitions", 4).load(p))
    assert df.rdd.getNumPartitions() == 4
    rows = {r.id: r.vector for r in df.collect()}
    assert len(rows) == 103
    assert np.allclose(rows[0], M[0]) and np.allclose(rows[102], M[102])

    gt = [[3, 1, 4], [1, 5, 9], [2, 6, 5]]
    pi = str(tmp_path / "g.ivecs")
    write_ivecs(pi, gt)
    got = {r.q_id: list(r.neighbor_ids)
           for r in spark.read.format("vecfile").load(pi).collect()}
    assert got == {0: [3, 1, 4], 1: [1, 5, 9], 2: [2, 6, 5]}


def test_vecfile_datasource_empty_file(spark, tmp_path):
    from fspann_query_system_spark.sources import datasource
    datasource.register(spark)
    p = str(tmp_path / "empty.fvecs")
    open(p, "wb").close()
    assert spark.read.format("vecfile").load(p).count() == 0


def test_jsonl_tolerant_read_and_report(spark, tmp_path):
    """JSONL source: malformed lines dropped and censused, parseable
    records missing required columns filtered, good records typed."""
    from fspann_query_system_spark.sources.jsonl import (read_jsonl_docs,
                                                         jsonl_ingest_report)
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',     # no source: ok
        '{"doc_id": 3, "lang": "de", "source": "web"}',       # no text: drop
        '{"doc_id": 4, "text": "trunca',                      # corrupt: drop
        '{"doc_id": 5, "text": "fin", "lang": "es", "source": "book"}',
    ]) + "\n")
    got = read_jsonl_docs(spark, str(p)).orderBy("doc_id").collect()
    assert [r.doc_id for r in got] == [1, 2, 5]
    assert got[1].source is None and got[1].text == "bonjour"
    rep = jsonl_ingest_report(spark, str(p)).collect()[0]
    assert (rep.n_total, rep.n_ok, rep.n_corrupt,
            rep.n_missing_required) == (5, 3, 1, 1)


def test_jsonl_keep_corrupt_retains_malformed_lines(spark, tmp_path):
    """keep_corrupt=True keeps the malformed lines themselves (raw
    line in _corrupt_record, schema columns null) alongside the
    surviving parsed rows; require still prunes parseable-but-
    incomplete records (verdict r08 What's-wrong #1)."""
    from fspann_query_system_spark.sources.jsonl import read_jsonl_docs
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "web"}',
        '{"doc_id": 3, "lang": "de", "source": "web"}',       # no text: drop
        '{"doc_id": 4, "text": "trunca',                      # corrupt: KEEP
    ]) + "\n")
    got = read_jsonl_docs(spark, str(p), keep_corrupt=True).collect()
    assert "_corrupt_record" in got[0].asDict()
    ok = [r for r in got if r._corrupt_record is None]
    bad = [r for r in got if r._corrupt_record is not None]
    assert [r.doc_id for r in ok] == [1]          # doc 3 pruned by require
    assert len(bad) == 1 and bad[0].doc_id is None
    assert bad[0]._corrupt_record.startswith('{"doc_id": 4')
