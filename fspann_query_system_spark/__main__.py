"""CLI entry point mirroring the reference's batch runner
(``ForwardSecureANNSystem.main``, SURVEY §3.1: args = configPath dataPath
queryPath keysFile dim metadataPath [groundtruthPath] [--profile NAME]
[--k K ...]).

Lifecycle: SETUP → GT (load or auto-precompute, S14 ivecs write) → INDEX →
QUERY+EVAL → SELECTIVE RE-ENCRYPT → EXPORT.  A user of the reference runs
the same seven positional concepts and gets the same artifact set
(profiler/summary/accuracy CSVs + metrics_summary with config SHA-256).

Usage:
  python -m fspann_query_system_spark CONFIG DATA QUERIES KEYSTORE DIM OUTDIR \
      [GROUNDTRUTH] [--profile NAME] [--k 1 10 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fspann_query_system_spark")
    p.add_argument("config", help="JSON config (SystemConfig subset, with profiles)")
    p.add_argument("data", help="base vectors: .fvecs/.bvecs/.csv/.parquet")
    p.add_argument("queries", help="query vectors, same formats")
    p.add_argument("keystore", help="keystore file (created if absent)")
    p.add_argument("dim", type=int, help="vector dimensionality (F1 filter)")
    p.add_argument("outdir", help="artifact/metadata output directory")
    p.add_argument("groundtruth", nargs="?", default=None,
                   help=".ivecs/.csv GT; auto-precomputed if omitted")
    p.add_argument("--profile", default=None, help="named config profile")
    p.add_argument("--k", type=int, nargs="+", default=None,
                   help="evaluation K variants (default: config top_k)")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .api import ForwardSecureANNSystem
    from .config import load_config, config_sha256
    from .query.metrics import recall_at_k
    from .query.profiler import stabilization_rows
    from .session import get_spark
    from .sources.registry import load_vectors, load_groundtruth, \
        validate_groundtruth
    from .sources.vecfiles import groundtruth_to_ivecs

    spark = get_spark("fspann-cli")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = load_config(args.config, profile=args.profile)
    if cfg.dim != args.dim:
        cfg = type(cfg)(**{**cfg.__dict__, "dim": args.dim}).validate()
    ks = args.k or [cfg.top_k]
    max_k = max(ks)

    system = ForwardSecureANNSystem(spark, cfg, keystore_path=args.keystore)

    # INDEX
    system.index_path(args.data)

    # queries
    queries = (load_vectors(spark, args.queries, expected_dim=args.dim)
               .select(F.col("id").alias("q_id"),
                       F.col("vector").cast("array<double>").alias("vector"))
               .persist())
    n_q = queries.count()

    # GT: load + validate, else precompute and persist as ivecs (S14)
    n_base = system._base.count()
    if args.groundtruth and os.path.exists(args.groundtruth):
        gt = load_groundtruth(spark, args.groundtruth)
        check = validate_groundtruth(gt, dataset_size=n_base)
        if not check["ids_in_range"]:
            print(f"ERROR: groundtruth ids out of range for dataset of "
                  f"{n_base} vectors: {check}", file=sys.stderr)
            return 2
    else:
        gt = (system.groundtruth(queries, k=max_k)
              .select("q_id", F.col("neighbor_ids")))
        if args.groundtruth:
            groundtruth_to_ivecs(gt, args.groundtruth)

    # QUERY + EVAL (with stabilization counters carried through the plan)
    results = system.search(queries, k=max_k, with_diagnostics=True)
    os.makedirs(args.outdir, exist_ok=True)
    report: dict = {"n_base": n_base, "n_queries": n_q,
                    "config_sha256": config_sha256(args.config)}
    for k in ks:
        rec = recall_at_k(results, gt, k=k).agg(
            F.avg("recall").alias("avg_recall")).first()
        report[f"recall@{k}"] = round(rec.avg_recall, 4)

    # SELECTIVE RE-ENCRYPT
    if cfg.reenc_mode != "off":
        report["reencryption"] = system.rotate_and_reencrypt_touched()

    # EXPORT (all S13 sinks)
    metric_rows = results.groupBy("q_id").agg(
        F.count("*").alias("n_returned"),
        F.round(F.min("distance"), 6).alias("nn_distance"))
    accuracy = spark.createDataFrame(
        [(k, float(report[f"recall@{k}"])) for k in ks], "k INT, avg_recall DOUBLE")
    samples = (results.select("q_id", "id", "distance", "rank")
               .orderBy("q_id", "rank").limit(200))
    # stabilization diagnostic (reference QueryServiceImpl.java:87-94,
    # StabilizationCallback.accept(rawCount, finalCount)): raw vs kept vs
    # decrypted vs returned candidate counts per query, next to the
    # result-shape stats
    shape = results.groupBy("q_id").agg(
        F.max("rank").alias("max_rank"),
        F.round(F.max("distance"), 6).alias("max_distance"))
    diagnostics = (stabilization_rows(results, queries=queries)
                   .join(shape, on="q_id", how="left"))
    reenc = report.get("reencryption") or {}
    reenc_flat = {"version": reenc.get("version"), "migrated": reenc.get("migrated")}
    for kv, n in (reenc.get("census") or {}).items():
        reenc_flat[f"census_v{kv}"] = n
    paths = system.export_artifacts(args.outdir, metric_rows=metric_rows,
                                    accuracy=accuracy,
                                    retrieved_samples=samples,
                                    diagnostics=diagnostics,
                                    reencrypt_metrics=reenc_flat,
                                    config_hash=report["config_sha256"])
    report_path = os.path.join(args.outdir, "run_report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, default=str, indent=2)
    report["artifacts"] = {**paths, "run_report": report_path}
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
