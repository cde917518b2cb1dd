"""Streaming ingest (St1/St2) + metadata/tombstone/snapshot layer."""

import time

import numpy as np
import pytest

from pyspark.sql import functions as F

from fspann_query_system_spark.crypto import KeyManager, RotationPolicy, decrypt_vectors
from fspann_query_system_spark.index.metadata import (SnapshotTable, initial_meta,
                                                      mark_deleted, active_filter,
                                                      drift_audit, storage_stats)
from fspann_query_system_spark.streaming.ingest import (stream_vectors,
                                                        ingest_encrypted)


def test_streaming_ingest_with_rotation(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(0)
    # two input files → two micro-batches (maxFilesPerTrigger=1)
    for fi in range(2):
        X = rng.normal(0, 1, (30, 6))
        df = spark.createDataFrame(
            [(fi * 100 + i, X[i].tolist()) for i in range(30)],
            "id LONG, vector ARRAY<DOUBLE>")
        df.coalesce(1).write.mode("append").parquet(src)

    km = KeyManager(master=b"\x09" * 32,
                    policy=RotationPolicy(max_ops=40, max_age_sec=1e9))
    rotations = []
    q = ingest_encrypted(
        stream_vectors(spark, src, "id LONG, vector ARRAY<DOUBLE>"),
        out, ckpt, km, spark, rotation_hook=rotations.append)
    q.awaitTermination(120)

    enc = spark.read.parquet(out)
    assert enc.count() == 60
    versions = {r.key_version for r in enc.select("key_version").distinct().collect()}
    # 30 ops (no rotate) then 60 >= 40 → rotation fired once
    assert len(rotations) == 1 and versions == {1, 2}
    # everything decrypts under the keystore
    bc = spark.sparkContext.broadcast(km.key_map())
    assert decrypt_vectors(enc.select("id", "key_version", "dim", "iv", "ciphertext"),
                           bc, mode="strict").count() == 60


def test_snapshot_table_atomic_swap(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.read() is None
    df1 = spark.range(10).withColumnRenamed("id", "x")
    s1 = t.write(df1)
    assert t.read().count() == 10 and s1 == 1
    df2 = spark.range(25).withColumnRenamed("id", "x")
    s2 = t.write(df2)
    assert t.read().count() == 25 and s2 == 2
    dropped = t.vacuum(keep=1)
    assert dropped == [1]
    assert t.read().count() == 25
    assert storage_stats(spark, str(tmp_path / "tbl"))["bytes"] > 0


def test_tombstones_and_drift(spark):
    pts = spark.createDataFrame([(i, [float(i)]) for i in range(20)],
                                "id LONG, vector ARRAY<DOUBLE>")
    meta = initial_meta(pts, version=1, dim=1)
    dead = spark.createDataFrame([(3,), (7,)], "id LONG")
    meta2 = mark_deleted(meta, dead)
    assert meta2.filter("deleted").count() == 2
    active = active_filter(pts, meta2)
    assert active.count() == 18
    assert {r.id for r in active.collect()}.isdisjoint({3, 7})
    # drift: drop two points from the store, add one orphan meta row
    pts_drifted = pts.filter("id < 18")
    audit = drift_audit(meta2, pts_drifted).collect()[0]
    assert audit.meta_only == 2 and audit.points_only == 0


def test_stateful_session_state_carries_across_batches(spark, tmp_path):
    """Two file drops → two micro-batches (maxFilesPerTrigger=1): a
    session spanning the batch boundary must CONTINUE (state carry), not
    restart, and a later event past the gap must open a new session."""
    import uuid
    from fspann_query_system_spark.streaming.stateful import stateful_sessionize
    src = str(tmp_path / "ev")
    t0 = 1_700_000_000
    batches = [
        [(1, 100, t0), (1, 101, t0 + 10), (2, 200, t0)],
        [(1, 102, t0 + 20),                  # continues session (gap 10 s)
         (1, 103, t0 + 20 + 7200),           # > 30 min gap: new session
         (2, 201, t0 + 7200)],
    ]
    for rows in batches:
        df = (spark.createDataFrame(rows, "user_id LONG, event_id LONG, e LONG")
              .select("user_id", "event_id",
                      F.expr("timestamp_seconds(e)").alias("ts")))
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)     # distinct mod-times → deterministic batch order
    stream = (spark.readStream
              .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = "sess_mb_" + uuid.uuid4().hex[:8]
    q = (stateful_sessionize(stream).writeStream.format("memory")
         .queryName(name).outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    emits = spark.table(name).collect()
    # user 1 touched in both micro-batches → two update-mode emits
    assert sum(1 for r in emits if r.user_id == 1) == 2
    final = {r.user_id: (r.n_sessions, r.n_events)
             for r in spark.table(name).groupBy("user_id")
             .agg(F.max("n_sessions").alias("n_sessions"),
                  F.max("n_events").alias("n_events")).collect()}
    assert final == {1: (2, 4), 2: (2, 2)}


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    """Running dedup aggregate over two file drops: a duplicate arriving
    in a LATER micro-batch must fold into the first batch's fingerprint
    state (canonical id = min across batches, n_copies across batches)."""
    import uuid
    from fspann_query_system_spark.functions import text as T
    src = str(tmp_path / "docs")
    batches = [
        [(10, "alpha beta gamma"), (11, "unique one")],
        [(20, "ALPHA  beta   gamma"), (21, "another doc")],  # dup of 10
    ]
    for rows in batches:
        (spark.createDataFrame(rows, "doc_id LONG, text STRING")
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.2)
    stream = (spark.readStream.schema("doc_id LONG, text STRING")
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = (stream
           .select("doc_id", T.fingerprint_md5("text").alias("fingerprint"))
           .groupBy("fingerprint")
           .agg(F.min("doc_id").alias("canonical_id"),
                F.count("*").alias("n_copies")))
    name = "dedup_mb_" + uuid.uuid4().hex[:8]
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2          # really ran >1 micro-batch
    rows = spark.table(name).collect()
    by_canon = {r.canonical_id: r.n_copies for r in rows}
    assert by_canon == {10: 2, 11: 1, 21: 1}


def test_stateful_sessionization_matches_batch(spark):
    """applyInPandasWithState sessionizer over the finite events stream
    must end with exactly the batch plan's per-user session counts."""
    import uuid
    from pyspark.sql import functions as F
    from fspann_query_system_spark.streaming.stateful import stateful_sessionize
    from fspann_query_system_spark.workloads import (
        q_sessionization, _events_stream, _restore_stream_confs)

    sf = "/root/testdata/sf0.001"
    batch = {r.user_id: (r.n_sessions, r.n_events)
             for r in q_sessionization(spark, sf).collect()}

    stream = _events_stream(spark, sf).select("user_id", "event_id", "ts")
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (stateful_sessionize(stream).writeStream.format("memory")
         .queryName(name).outputMode("update")
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        _restore_stream_confs(spark)
    # update mode: last emit per user is the final state
    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in spark.table(name).collect()}
    assert got == batch


def test_windowed_counts_watermark_drops_late_data(spark, tmp_path):
    """windowed_event_counts in append mode: a row arriving after the
    watermark passed its window must NOT be folded in, and the finalized
    window emits exactly once with the on-time count (St1 late-data
    semantics: watermark bounds state for infinite streams)."""
    import uuid
    from pyspark.sql import functions as F
    from fspann_query_system_spark.streaming.ingest import windowed_event_counts

    src = tmp_path / "stream_src"
    src.mkdir()
    schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"

    def drop(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    import datetime as dt
    t = lambda m, s=0: dt.datetime(2024, 1, 1, 10, m, s)
    # batch A: three on-time rows in window [10:00, 10:05) + one row at
    # 10:30 that advances the watermark to 10:20 after the batch
    drop("a.parquet", [(t(0), "click", 1.0), (t(2), "click", 1.0),
                       (t(4), "click", 1.0), (t(30), "click", 1.0)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*.parquet")))
    name = "wm_" + uuid.uuid4().hex[:8]
    q = (windowed_event_counts(stream, window="5 minutes",
                               watermark="10 minutes")
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    # batch B: a LATE row for the already-closed 10:00 window (watermark
    # 10:20 > window end 10:05 -> dropped) + one fresh on-time row
    drop("b.parquet", [(t(2, 30), "click", 1.0), (t(50), "click", 1.0)])
    q.processAllAvailable()
    q.stop()

    rows = {(r.window_start, r.event_type): r.n_events
            for r in spark.table(name).collect()}
    # the 10:00 window finalized with the three ON-TIME rows only
    assert rows[(t(0), "click")] == 3


def test_streaming_incremental_dedup_admission_across_batches(spark, tmp_path):
    """Incremental admission over two file drops: the corpus band table
    is built ONCE; each micro-batch bands only itself inside
    foreachBatch and joins the static bands — a near-dup arriving in
    either batch is flagged against the same standing corpus."""
    from fspann_query_system_spark.ops.dedup import (band_table,
                                                     incremental_near_dups)
    corpus_rows = [(1, "the quick brown fox jumps over the lazy dog today"),
                   (2, "completely different corpus document number two here")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id LONG, text STRING")
    corpus_bands = band_table(corpus, "text", "doc_id",
                              k=3, n_hashes=8, bands=8).localCheckpoint()
    src = str(tmp_path / "newdocs")
    batches = [
        # batch 1: near-dup of corpus doc 1 (one word swapped) + a new doc
        [(100, "the quick brown fox jumps over the lazy dog tonight"),
         (101, "fresh unseen content alpha beta gamma delta epsilon zeta")],
        # batch 2: near-dup of corpus doc 2
        [(200, "completely different corpus document number two there")],
    ]
    for rows in batches:
        (spark.createDataFrame(rows, "doc_id LONG, text STRING")
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.2)
    collected = []

    def admit(bdf, _bid):
        out = incremental_near_dups(corpus, bdf, "text", "doc_id",
                                    k=3, n_hashes=8, bands=8,
                                    corpus_bands=corpus_bands,
                                    broadcast_batch=True)
        collected.extend(out.collect())

    stream = (spark.readStream.schema("doc_id LONG, text STRING")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(admit)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2
    hits = {(r.new_id, r.corpus_id) for r in collected}
    assert (100, 1) in hits and (200, 2) in hits
    assert not any(n == 101 for n, _ in hits)      # the new doc admits
