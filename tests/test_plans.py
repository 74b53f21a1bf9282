"""Physical-plan assertions (SURVEY.md §4): the engine's queries must
compile to the plans a 100 TB deployment needs — filters and
projections reaching the parquet scan, dimension joins broadcasting,
aggregates partial-aggregating before the exchange, top-k bounded.
"""

from __future__ import annotations

import pytest
from tms_etl_spark import catalog

catalog.load_all()


def _plan(spark, sf_dir, name) -> str:
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark, sf_dir):
    p = _plan(spark, sf_dir, "scan_project_filter")
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_quantity)" in p or "GreaterThanOrEqual(l_quantity" in p
    # column pruning: scan must not read all 11 lineitem columns
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_dim_chain_broadcasts(spark, sf_dir):
    p = _plan(spark, sf_dir, "join_broadcast_dim_chain")
    # formatted mode lists each node twice (tree + details)
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_join_hints_control_physical_strategy(spark, sf_dir):
    assert "SortMergeJoin" in _plan(spark, sf_dir, "join_sort_merge")
    assert "ShuffledHashJoin" in _plan(spark, sf_dir, "join_shuffle_hash")


def test_q1_partial_aggregation(spark, sf_dir):
    df = catalog.QUERIES["q1_pricing_summary"](spark, sf_dir)
    p = _plan(spark, sf_dir, "q1_pricing_summary")
    # two-phase agg: partial before the exchange, final after
    assert p.count("HashAggregate") >= 2
    codegen = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    assert "WholeStageCodegen" in codegen


def test_topk_is_bounded_not_global_sort(spark, sf_dir):
    p = _plan(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_semi_anti_joins_compile_to_joins(spark, sf_dir):
    p_semi = _plan(spark, sf_dir, "join_semi")
    p_anti = _plan(spark, sf_dir, "join_anti")
    assert "LeftSemi" in p_semi
    assert "LeftAnti" in p_anti


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union+window as-of join must cost exactly one exchange
    (hash by user_id) — no range explosion, no extra shuffles."""
    p = _plan(spark, sf_dir, "join_asof")
    assert "Window" in p
    assert p.count("hashpartitioning(") == 1


def test_scalar_subquery_is_broadcast_not_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "scalar_subquery_share")
    assert "Subquery" in p or "ReusedSubquery" in p
    assert "SortMergeJoin" not in p


def test_q3_q5_join_strategies(spark, sf_dir):
    """The composite analytics compile to: dims broadcast, exactly
    one fact-fact exchange pair feeding a non-broadcast join."""
    p3 = _plan(spark, sf_dir, "q3_shipping_priority")
    assert p3.count("BroadcastHashJoin") >= 1  # customer dim
    p5 = _plan(spark, sf_dir, "q5_volume_by_nation")
    assert p5.count("BroadcastHashJoin") >= 3  # supplier+nation+region
