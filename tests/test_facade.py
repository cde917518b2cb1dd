"""Facade lifecycle (reference api/it module coverage): config profiles,
tokens/decoys, profiler sinks, full system loop incl. restore."""

import json

import numpy as np
import pytest

from pyspark.sql import functions as F

from fspann_query_system_spark.api import ForwardSecureANNSystem
from fspann_query_system_spark.config import SystemConfig, load_config, config_sha256
from fspann_query_system_spark.query.token import (make_token, open_token,
                                                   generate_decoys, decoy_count,
                                                   interleave_decoys,
                                                   strip_decoy_results)
from fspann_query_system_spark.crypto import KeyManager


def test_config_profiles_and_validation(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "dim": 16, "m": 6, "tables": 3,
        "profiles": {"fast": {"probes": 3, "refinement_limit": 500},
                     "bad": {"reenc_mode": "sometimes"}}}))
    cfg = load_config(str(p))
    assert cfg.dim == 16 and cfg.probes == 5
    fast = load_config(str(p), "fast")
    assert fast.probes == 3 and fast.refinement_limit == 500
    with pytest.raises(ValueError):
        load_config(str(p), "bad")
    with pytest.raises(KeyError):
        load_config(str(p), "nope")
    (tmp_path / "junk.json").write_text('{"not_a_key": 1}')
    with pytest.raises(ValueError):
        load_config(str(tmp_path / "junk.json"))
    assert len(config_sha256(str(p))) == 64


def test_token_roundtrip_and_decoys(clustered):
    df, X = clustered
    from fspann_query_system_spark.lsh.params import LshConfig, fit_params
    cfg = LshConfig(dim=16, m=4, lam=2, tables=2, divisions=1, seed=3)
    params = fit_params(X[:200], cfg)
    km = KeyManager(master=b"\x21" * 32)
    tok = make_token(5, X[5], params, km.key_for(1), 1, top_k=7)
    assert tok.top_k == 7 and tok.dim == 16 and len(tok.codes) == 2
    v = open_token(tok, km.key_for(1))
    assert np.allclose(v, X[5])

    assert decoy_count(100, 0.2) == 25      # 25/125 = 20% decoys
    assert decoy_count(100, 0.0) == 0
    D = generate_decoys(10, 16, "clustered", np.random.default_rng(0), X)
    assert np.allclose(np.linalg.norm(D, axis=1), 1.0)
    with pytest.raises(ValueError):
        generate_decoys(5, 16, "weird", np.random.default_rng(0))


def test_decoy_interleave_and_strip(spark, clustered):
    df, X = clustered
    q = df.limit(10).select(F.col("id").alias("q_id"), "vector")
    mixed = interleave_decoys(q, ratio=0.3, mode="gaussian", dim=16)
    n = mixed.count()
    assert n > 10
    assert mixed.filter("is_decoy").count() == n - 10
    fake_results = mixed.select("q_id", F.lit(1).alias("rank"))
    assert strip_decoy_results(fake_results).count() == 10


def test_full_lifecycle(spark, clustered, tmp_path):
    df, X = clustered
    cfg = SystemConfig(dim=16, m=8, lam=2, tables=4, divisions=2,
                       block_size=32, refinement_limit=400,
                       rotation_max_ops=10**9, top_k=10)
    sys_ = ForwardSecureANNSystem(spark, cfg, master_key=b"\x33" * 32)
    sys_.index_vectors(df)

    rng = np.random.default_rng(8)
    qidx = rng.choice(len(X), 12, replace=False)
    q = spark.createDataFrame(
        [(int(i), (X[i] + rng.normal(0, 0.05, 16)).tolist()) for i in qidx],
        "q_id LONG, vector ARRAY<DOUBLE>")

    res = sys_.search(q, k=10)
    assert res.groupBy("q_id").count().filter("count != 10").count() == 0

    ev = {r.k: r for r in sys_.evaluate(res, q, ks=[1, 10]).collect()}
    assert ev[10].avg_recall > 0.6
    assert ev[10].avg_ratio >= 1.0

    # forward-security phase: touched ids migrate to the new key
    out = sys_.rotate_and_reencrypt_touched()
    assert out["version"] == 2 and out["migrated"] > 0
    assert set(out["census"]) == {1, 2}

    # search still correct against the mixed-version store
    res2 = sys_.search(q, k=10)
    assert sorted(map(tuple, res2.select("q_id", "id").collect())) == \
           sorted(map(tuple, res.select("q_id", "id").collect()))

    # restore path: rebuild routing state from the encrypted store alone
    sys2 = ForwardSecureANNSystem(spark, cfg, master_key=b"\x33" * 32)
    sys2.keys.current_version = sys_.keys.current_version
    sys2.restore_from_store(sys_.encrypted, sys_.index.params)
    res3 = sys2.search(q, k=10, adaptive=False)
    assert res3.count() > 0

    # export sinks
    art = sys_.export_artifacts(str(tmp_path / "artifacts"),
                                config_hash="ab" * 32)
    assert "phases" in art and "metrics_summary" in art
    txt = open(art["metrics_summary"]).read()
    assert "config_sha256=" in txt and "phase.search=" in txt


def test_facade_sq8_compressed_refine(spark, clustered):
    """index_vectors(sq8=True) + search(sq8_rerank=) — the facade path
    of the compressed refine: same ids as the full-decrypt search."""
    df, X = clustered
    cfg = SystemConfig(dim=16, m=8, lam=2, tables=4, divisions=2,
                       block_size=32, refinement_limit=400,
                       rotation_max_ops=10**9, top_k=10)
    sys_ = ForwardSecureANNSystem(spark, cfg, master_key=b"\x44" * 32)
    sys_.index_vectors(df, sq8=True)
    q = df.filter("id < 5").selectExpr("id AS q_id", "vector")
    full = sys_.search(q, k=10, adaptive=False)
    pre = sys_.search(q, k=10, adaptive=False, sq8_rerank=4)
    hits = (pre.select("q_id", "id")
            .join(full.select("q_id", "id"), ["q_id", "id"]).count())
    assert full.count() == 50 and hits >= 48
    top1 = {r.q_id: r.id for r in pre.filter("rank = 1").collect()}
    assert top1 == {i: i for i in range(5)}    # exact self-hits survive


def test_query_cache_lru_ttl_and_epoch():
    from fspann_query_system_spark.query.cache import QueryCache
    c = QueryCache(max_entries=2, ttl_sec=60)
    k1 = QueryCache.key_of([1.0, 2.0], 10, epoch=1)
    assert QueryCache.key_of([1.0, 2.0], 10, 1) == k1          # deterministic
    assert QueryCache.key_of([1.0, 2.0], 10, 2) != k1          # epoch busts
    assert QueryCache.key_of([1.0, 2.5], 10, 1) != k1
    assert c.get(k1) is None
    c.put(k1, [("a", 0.1)])
    assert c.get(k1) == [("a", 0.1)]
    c.put("k2", [1]); c.put("k3", [2])                          # evicts k1 (LRU)
    assert c.get(k1) is None and c.get("k3") == [2]
    c.ttl_sec = 0.0
    c.put("k4", [3])
    import time as _t; _t.sleep(0.01)
    assert c.get("k4") is None                                  # TTL expiry
    assert c.hits >= 2 and c.misses >= 3


def test_example_config_profiles():
    from fspann_query_system_spark.config import load_config
    cfg = load_config("/root/repo/configs/example.json", profile="high")
    assert cfg.tables == 8 and cfg.refinement_limit == 22000
    base = load_config("/root/repo/configs/example.json")
    assert base.tables == 6


def test_paper_baseline_profile_end_to_end(spark):
    """SearchMode parity (reference ``config/SearchMode.java:3-6``):
    the ``paper_baseline`` profile pins every knob the reference's
    PAPER_BASELINE mode implies — PaperConfig geometry defaults
    (``SystemConfig.java:237-263``: m=24, lambda=2, divisions=3,
    tables=6, seed=13) and RuntimeConfig defaults
    (``SystemConfig.java:265-285``: refinementLimit=20000,
    probeOverride=-1 i.e. adaptive widening DISABLED,
    hammingPrefilterThreshold=0) with decoys/cloaking off — and those
    values flow end-to-end through AnnIndex.build + search."""
    import numpy as np
    from dataclasses import replace
    from pyspark.sql import functions as F
    from fspann_query_system_spark.config import load_config
    from fspann_query_system_spark.query.ann import (
        AnnIndex, search_batch, search_batch_adaptive)

    cfg = load_config("/root/repo/configs/example.json",
                      profile="paper_baseline")
    # reference PaperConfig defaults
    assert cfg.m == 24 and cfg.lam == 2 and cfg.divisions == 3
    assert cfg.tables == 6 and cfg.seed == 13
    # reference RuntimeConfig defaults
    assert cfg.refinement_limit == 20000
    assert cfg.probe_override == -1        # widening heuristic disabled
    assert cfg.hamming_threshold == 0      # prefilter disabled
    assert cfg.decoy_ratio == 0.0 and cfg.cloak_noise == 0.0

    # end-to-end: the built index carries the profile's params
    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (200, 12))
    vec = spark.createDataFrame([(i, X[i].tolist()) for i in range(200)],
                                "id LONG, vector ARRAY<DOUBLE>")
    idx = AnnIndex.build(vec, replace(cfg, dim=12).lsh())
    got = idx.params.cfg
    assert (got.m, got.lam, got.divisions, got.tables, got.seed) == \
        (24, 2, 3, 6, 13)
    assert got.refinement_limit == 20000 and got.probe_override == -1
    # probeOverride=-1 => adaptive retry is a no-op (identical results)
    q = vec.limit(3).select(F.col("id").alias("q_id"), "vector")
    plain = search_batch(idx, q, k=5).orderBy("q_id", "rank").collect()
    adapt = search_batch_adaptive(idx, q, k=5).orderBy("q_id",
                                                       "rank").collect()
    assert plain == adapt


def test_search_cached_hits_and_equivalence(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from fspann_query_system_spark.api import ForwardSecureANNSystem
    from fspann_query_system_spark.config import SystemConfig
    rng = np.random.default_rng(12)
    X = rng.normal(0, 1, (300, 12))
    vec = spark.createDataFrame([(i, X[i].tolist()) for i in range(300)],
                                "id LONG, vector ARRAY<DOUBLE>")
    cfg = SystemConfig(dim=12, m=6, lam=2, tables=3, divisions=1,
                       probes=4, refinement_limit=100, top_k=5)
    sys_ = ForwardSecureANNSystem(spark, cfg, master_key=bytes(32))
    sys_.index_vectors(vec)
    q = vec.limit(4).select(F.col("id").alias("q_id"), "vector")
    first = sorted(tuple(r) for r in sys_.search_cached(q).collect())
    assert sys_.cache.misses >= 4 and sys_.cache.hits == 0
    second = sorted(tuple(r) for r in sys_.search_cached(q).collect())
    assert second == first
    assert sys_.cache.hits >= 4                 # all served from cache
    sys_.index_vectors(vec)                      # rebuild → epoch bust
    third = sorted(tuple(r) for r in sys_.search_cached(q).collect())
    assert third == first                        # recomputed, same answers


def test_banded_candidates_then_exact_verify(spark, docs=None):
    """At-scale dedup composition (SCALE.md: LSH banding restricts the
    pair set, exact jaccard verifies): band candidates must contain every
    high-jaccard pair found by the all-pairs plan."""
    from fspann_query_system_spark.ops.dedup import (minhash_band_pairs,
                                                     jaccard_pairs)
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different content about spark engines at scale"),
        (4, "el gato y el perro en la casa de la abuela grande"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cands = {(r.id_a, r.id_b)
             for r in minhash_band_pairs(d, n_hashes=16, bands=8).collect()}
    exact_high = {(r.id_a, r.id_b)
                  for r in jaccard_pairs(d, threshold=0.5).collect()}
    assert exact_high and exact_high <= cands
    # restrict verification to candidate docs only (the scale flow)
    cand_ids = sorted({i for p in cands for i in p})
    sub = d.filter(d.doc_id.isin(cand_ids))
    sub_verified = {(r.id_a, r.id_b)
                    for r in jaccard_pairs(sub, threshold=0.5).collect()}
    assert exact_high <= sub_verified


def test_multi_dim_system_shared_rotation(spark):
    import numpy as np
    from fspann_query_system_spark.api import MultiDimSystem
    from fspann_query_system_spark.config import SystemConfig
    rng = np.random.default_rng(3)
    cfg = SystemConfig(dim=8, m=4, lam=2, tables=2, divisions=1,
                       probes=3, refinement_limit=50, top_k=3)
    mds = MultiDimSystem(spark, cfg, dims=[8, 12], master_key=bytes(32))
    for d in (8, 12):
        X = rng.normal(0, 1, (120, d))
        vec = spark.createDataFrame([(i, X[i].tolist()) for i in range(120)],
                                    "id LONG, vector ARRAY<DOUBLE>")
        mds.index_vectors(d, vec)
        q = vec.limit(3).selectExpr("id AS q_id", "vector")
        res = mds.search(d, q, k=3)
        top1 = {r.q_id: r.id for r in res.filter("rank = 1").collect()}
        assert top1 == {0: 0, 1: 1, 2: 2}
    assert mds[8].keys is mds[12].keys          # one keystore, all dims
    v_before = mds[8].keys.current_version
    out = mds.rotate_and_reencrypt_touched()
    assert set(out) == {8, 12}
    # ONE rotation event: shared version advances exactly once, and both
    # dims migrated to that same version
    assert mds[8].keys.current_version == v_before + 1
    assert {o["version"] for o in out.values()} == {v_before + 1}


def test_background_reencryption_scheduler():
    import time as _t
    from fspann_query_system_spark.crypto.scheduler import \
        BackgroundReencryptionScheduler
    calls = []
    sch = BackgroundReencryptionScheduler(lambda: calls.append(1) or len(calls),
                                          interval_sec=0.05)
    assert sch.run_once() == 1                   # explicit-trigger body
    sch.start()
    _t.sleep(0.3)
    sch.stop()
    assert sch.runs >= 3
    assert sch.last_result == sch.runs
    runs_before = sch.runs
    sch.start()                                   # restart must work
    _t.sleep(0.2)
    sch.stop()
    assert sch.runs > runs_before


def test_search_cached_restamps_q_id_for_same_vector(spark):
    """Cache key ignores q_id (logical token): a second query with the
    SAME vector but a DIFFERENT q_id must get rows under its own q_id."""
    import numpy as np
    from fspann_query_system_spark.api import ForwardSecureANNSystem
    from fspann_query_system_spark.config import SystemConfig
    rng = np.random.default_rng(9)
    X = rng.normal(0, 1, (150, 10))
    vec = spark.createDataFrame([(i, X[i].tolist()) for i in range(150)],
                                "id LONG, vector ARRAY<DOUBLE>")
    cfg = SystemConfig(dim=10, m=5, lam=2, tables=3, divisions=1,
                       probes=3, refinement_limit=80, top_k=4)
    sys_ = ForwardSecureANNSystem(spark, cfg, master_key=bytes(32))
    sys_.index_vectors(vec)
    q1 = spark.createDataFrame([(1, X[7].tolist())], "q_id LONG, vector ARRAY<DOUBLE>")
    r1 = sys_.search_cached(q1).collect()
    assert {r.q_id for r in r1} == {1}
    q2 = spark.createDataFrame([(77, X[7].tolist())], "q_id LONG, vector ARRAY<DOUBLE>")
    r2 = sys_.search_cached(q2).collect()          # cache hit on geometry
    assert sys_.cache.hits >= 1
    assert {r.q_id for r in r2} == {77}            # re-stamped, not q_id=1
    assert sorted((r.id, r.rank) for r in r2) == sorted((r.id, r.rank) for r in r1)
