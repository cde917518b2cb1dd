"""Matched A/B of the minhash band-table checkpoint default
(VERDICT r12 "Next round" #1): run one bench query in a fresh JVM with
``minhash_band_pairs``'s ``checkpoint_mode`` default forced to the
given mode, so interleaved invocations measure local-vs-none on the
same box with the same methodology as tools/ab_rerun.py.

The patch rewrites the function's __defaults__ tuple (the last default
is checkpoint_mode), which covers every caller that RELIES on the
default — q_minhash_bands, q_dedup_clusters, q_edit_near_dups.
near_dup_pipeline passes its own checkpoint_mode down explicitly; its
band A/B is run via the pipe= mode below, which forces the whole
pipeline's mode (band + cand + shingle + CC checkpoints together).

Usage: python3 tools/ab_band_mode.py <local|none> <query> [runs=3]
       python3 tools/ab_band_mode.py pipe=<local|none> near_dup_pipeline
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + (
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else "")


def main():
    mode = sys.argv[1]
    name = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from fspann_query_system_spark.session import get_spark
    from fspann_query_system_spark import workloads
    from fspann_query_system_spark.ops import dedup

    pipe = mode.startswith("pipe=")
    if pipe:
        mode = mode.split("=", 1)[1]
    assert mode in ("local", "none"), mode
    if pipe:
        d = list(dedup.near_dup_pipeline.__defaults__)
        assert d[-2] == "local" and d[-1] is None  # checkpoint_mode, stats
        d[-2] = mode
        dedup.near_dup_pipeline.__defaults__ = tuple(d)
    else:
        d = list(dedup.minhash_band_pairs.__defaults__)
        assert d[-1] == "local"                    # checkpoint_mode
        d[-1] = mode
        dedup.minhash_band_pairs.__defaults__ = tuple(d)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-band-mode",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    import pandas as _pd  # noqa: F401
    spark.range(100).mapInPandas(lambda it: it, schema="id LONG").count()

    fn = workloads.QUERIES[name]
    times = []
    for _ in range(runs):
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"mode": ("pipe=" if pipe else "") + mode,
                      "query": name, "sf_dir": sf_dir, "runs": times,
                      "median": statistics.median(times)}), flush=True)


if __name__ == "__main__":
    main()
