"""SparkSession factory with engine defaults.

Defaults chosen for correctness + scale:
- UTC session timezone so timestamp semantics match external oracles.
- AQE on (runtime re-plan, skew-join handling).
- Arrow execution on for every pandas UDF kernel.
- shuffle partitions sized by env (local test default 32; a real cluster
  deployment overrides via spark-defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "fspann-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ContextCleaner normally waits for a driver JVM GC to learn that
        # shuffle files / broadcasts / checkpoint blocks are unreferenced;
        # a PySpark driver allocates little JVM heap, so full GCs can be
        # 30+ minutes apart and block-manager state accumulates across a
        # long session (observed: 2-3x slowdown late in multi-query
        # suites).  One minute keeps reclamation bounded at negligible
        # GC cost.
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
