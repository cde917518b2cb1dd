"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — full LSH-routed ANN search over the
  sf0.001 embeddings table (index build → route → probe → refine → top-k).
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the beyond-reference training-data operators (dedup, similarity, text).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents (LSH oracles are
  generated from the same fitted parameters the Spark side uses).

Implementations live in ``fspann_query_system_spark.workloads``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from fspann_query_system_spark import workloads  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batched ANN search on /root/testdata/sf0.001."""
    return workloads.q_ann_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    return workloads.oracle_sql_map()
