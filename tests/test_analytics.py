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


def test_q5_revenue_descending_and_asia_only(spark):
    """Q5 output is one row per ASIA nation, revenue strictly ordered."""
    rows = analytics.QUERIES["tpch_q5_local_supplier"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert 1 <= len(rows) <= 5
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)


def test_q5_matches_manual_same_nation_rollup(spark):
    """Replay the co-location semantics without the join-condition fold:
    revenue per nation from pandas filtering must equal the query."""
    import pandas as pd

    sf = "/root/testdata/sf0.01"
    o = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    c = pd.read_parquet(f"{sf}/customer.parquet")
    s = pd.read_parquet(f"{sf}/supplier.parquet")
    n = pd.read_parquet(f"{sf}/nation.parquet")
    r = pd.read_parquet(f"{sf}/region.parquet")
    o = o[(o.o_orderdate >= "1996-01-01") & (o.o_orderdate < "1997-01-01")]
    m = (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m.c_nationkey == m.s_nationkey]
    m = m.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey"
    )
    m = m[m.r_name == "ASIA"]
    m["rev"] = m.l_extendedprice * (1 - m.l_discount)
    expect = m.groupby("n_name").rev.sum().round(4).to_dict()
    got = {
        r_.n_name: r_.revenue
        for r_ in analytics.QUERIES["tpch_q5_local_supplier"](spark, sf).collect()
    }
    assert got == pytest.approx(expect, abs=1e-6)
