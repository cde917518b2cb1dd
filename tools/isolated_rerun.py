"""Pathology-#5 isolated rerun (SCALE.md §10 rule): before attributing
a bench delta to code, re-measure the query ISOLATED — its own fresh
session/JVM, nothing ahead of it in a suite — on a quiet machine; only
a delta that survives both the suite AND the isolated condition is a
plan regression.

Runs ONE registry query in this process's fresh session: the same
warm-up bench.py applies (JVM, parquet footers, python workers — so
the timing measures the query, not interpreter spin-up), then N timed
runs; prints one JSON line with all runs + the median.

Usage: python3 tools/isolated_rerun.py <query> [runs=3]
       for q in a b c; do python3 tools/isolated_rerun.py $q; done
(each invocation is a separate JVM — that IS the isolation.)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")

from fspann_query_system_spark.session import get_spark          # noqa: E402
from fspann_query_system_spark import workloads                  # noqa: E402


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolated-rerun",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warm-up, verbatim in spirit: JVM, footers, py workers
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
    workloads.load_events(spark, f"{sf_dir}/events.parquet").schema
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    import pandas as _pd  # noqa: F401
    spark.range(100).mapInPandas(lambda it: it, schema="id LONG").count()

    fn = workloads.QUERIES[name]
    times = []
    for _ in range(runs):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "sf_dir": sf_dir, "runs": times,
                      "median": statistics.median(times)}), flush=True)


if __name__ == "__main__":
    main()
