"""Oracle-parity tests for the TPC-H-adapted composite workloads."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import analytics

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(analytics.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_q8_plans_single_fact_shuffle(spark):
    """Q8's seven-table join must compile to chained broadcast hash joins
    with exactly one hash Exchange (the year rollup) — the one-fact-shuffle
    contract the docstring claims."""
    import re

    df = analytics.QUERIES["tpch_q8_market_share"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert set(joins) == {"BroadcastHashJoin"}, joins


def test_q21_plans_bounded_shuffles(spark):
    """Q21's docstring claims the double-EXISTS rewrite costs two orderkey
    rollups instead of three fact self-joins: the plan must carry at most
    3 hash Exchanges (per-supplier rollup, per-order rollup, final s_name
    rollup) and the supplier join must be a broadcast."""
    df = analytics.QUERIES["tpch_q21_waiting_supplier"](
        spark, "/root/testdata/sf0.01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:3000]
    assert "BroadcastHashJoin" in plan
