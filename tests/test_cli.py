"""End-to-end CLI parity test (reference main lifecycle, SURVEY §3.1):
fvecs in → index → auto-GT → search → eval → re-encrypt → CSV artifacts."""

import json
import os

import numpy as np
import pytest

from fspann_query_system_spark.sources.vecfiles import write_fvecs


@pytest.fixture(scope="module")
def cli_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 5.0, (4, 12))
    base = np.vstack([c + rng.normal(0, 0.5, (100, 12)) for c in centers]).astype(np.float32)
    queries = base[:8] + rng.normal(0, 0.05, (8, 12)).astype(np.float32)
    write_fvecs(str(root / "base.fvecs"), base)
    write_fvecs(str(root / "queries.fvecs"), queries)
    (root / "config.json").write_text(json.dumps({
        "dim": 12, "m": 6, "lam": 2, "tables": 4, "divisions": 1,
        "seed": 9, "probes": 5, "refinement_limit": 200, "top_k": 5,
        "reenc_mode": "end",
        "profiles": {"fast": {"probes": 3}},
    }))
    return root


def test_cli_end_to_end(spark, cli_fixture):
    from fspann_query_system_spark.__main__ import main
    root = cli_fixture
    out = str(root / "artifacts")
    gt_path = str(root / "gt.ivecs")
    rc = main([str(root / "config.json"), str(root / "base.fvecs"),
               str(root / "queries.fvecs"), str(root / "keystore.bin"),
               "12", out, gt_path, "--k", "1", "5"])
    assert rc == 0
    # artifacts written
    assert os.path.exists(gt_path)                       # S14 ivecs sink
    assert os.path.exists(str(root / "keystore.bin"))    # S12 keystore
    files = set(os.listdir(out))
    # all seven reference sink families (S13) plus the run report
    for sink in ["query_metrics", "accuracy", "retrieved_samples",
                 "query_diagnostics", "reencrypt_metrics.csv",
                 "phases.csv", "metrics_summary.txt", "run_report.json"]:
        assert sink in files, (sink, files)
    # stabilization diagnostic populated (reference
    # QueryServiceImpl.java:87-94 raw-vs-final candidate counts)
    import csv
    import glob
    [diag_csv] = glob.glob(os.path.join(out, "query_diagnostics", "*.csv"))
    with open(diag_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8          # one row per query
    for r in rows:
        raw, kept = int(r["cand_raw"]), int(r["cand_kept"])
        dec, ret = int(r["cand_decrypted"]), int(r["returned"])
        # candTotal >= candKept >= candDecrypted >= |results| > 0
        assert raw >= kept >= dec >= ret > 0, r


def test_cli_groundtruth_roundtrip(spark, cli_fixture):
    """The ivecs GT written by the CLI reloads and validates (F7)."""
    from fspann_query_system_spark.sources.registry import (load_groundtruth,
                                                            validate_groundtruth)
    gt = load_groundtruth(spark, str(cli_fixture / "gt.ivecs"))
    assert gt.count() == 8
    v = validate_groundtruth(gt, dataset_size=400)
    assert v["ids_in_range"]
