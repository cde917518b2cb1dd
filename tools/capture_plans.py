"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    -> output dir plans/<tag>/, files <query>_<suffix>.txt
  suffix -> $PLAN_SUFFIX (default "before")

Queries whose builder runs eager work (streaming foreachBatch, iterative
fits) still produce a plan for the RETURNED DataFrame — the tail of the
computation; the eager stages are documented in OPTIMIZATION notes.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")

from fspann_query_system_spark.session import get_spark          # noqa: E402
from fspann_query_system_spark import workloads                  # noqa: E402


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/root/repo/plans/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("fspann-plans")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        import bench
        names = list(bench.HEADLINE)
    for name in names:
        try:
            df = workloads.QUERIES[name](spark, sf_dir)
            txt = explain_formatted(df)
        except Exception:
            txt = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print(f"captured {name} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
