"""Plan-shape regression tests: the physical plans the 100TB design
depends on (pushdown, pruning, broadcast, codegen) must not silently
degrade (SCALE.md §2/§6 claims)."""

import pytest

from pyspark.sql import functions as F

from fspann_query_system_spark import workloads as W

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _codegen(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    return df._jdf.queryExecution().explainString(mode)


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _formatted(W.q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only the 7 needed
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert rs.count(":") == 7, rs
    assert "l_comment" not in rs


def test_shipping_priority_broadcasts_dims(spark):
    plan = _plan(W.q_shipping_priority(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_region_revenue_all_broadcast(spark):
    plan = _plan(W.q_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must plan partial (map-side) aggregation: two HashAggregate
    levels around the exchange."""
    plan = _plan(W.q_candidate_min_merge(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_whole_stage_codegen_covers_relational_path(spark):
    plan = _codegen(W.q_pricing_summary(spark, SF))
    assert "WholeStageCodegen" in plan


def test_topk_plans_window_group_limit(spark):
    """rank<=k filter must push a WindowGroupLimit (no full sort of every
    group at scale)."""
    plan = _plan(W.q_top_orders_per_customer(spark, SF))
    assert "WindowGroupLimit" in plan


def test_tombstone_plans_anti_join(spark):
    plan = _plan(W.q_tombstone_anti_join(spark, SF))
    assert "LeftAnti" in plan
