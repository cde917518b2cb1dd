"""Scheduled-job inventory for one bench query (VERDICT r12 "Next
round" #3: repeat batch 9's method — count scheduled jobs per entry and
delete the ones carrying no new information).

Runs the query once warm in a fresh JVM and reports how many Spark jobs
the materializing action(s) scheduled, via the status tracker (job group
ids are not needed: the JVM is dedicated to this one query).

Usage: python3 tools/job_inventory.py <repo_root> <query>
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    root = os.path.abspath(sys.argv[1])
    name = sys.argv[2]
    sys.path.insert(0, root)
    os.environ["PYTHONPATH"] = root + (
        os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH") else "")
    from fspann_query_system_spark.session import get_spark
    from fspann_query_system_spark import workloads

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-inventory",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    import pandas as _pd  # noqa: F401
    spark.range(100).mapInPandas(lambda it: it, schema="id LONG").count()

    fn = workloads.QUERIES[name]
    fn(spark, sf_dir).collect()          # warm (broadcast/index caches)
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.time()
    fn(spark, sf_dir).collect()
    wall = round(time.time() - t0, 3)
    after = set(tracker.getJobIdsForGroup(None) or [])
    jobs = sorted(after - before)
    info = []
    for j in jobs:
        ji = tracker.getJobInfo(j)
        n_stages = len(ji.stageIds) if ji else -1
        info.append({"job": j, "stages": n_stages})
    print(json.dumps({"root": root, "query": name, "warm_wall_sec": wall,
                      "n_jobs": len(jobs), "jobs": info}), flush=True)


if __name__ == "__main__":
    main()
