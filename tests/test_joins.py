"""Oracle-parity tests for §2.3 join operators."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import joins

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(joins.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_semi_anti_partition_customer(spark):
    """Property (SURVEY §5.5): semi ∪ anti partitions customer exactly."""
    from data_integration_exercise_spark.io import load_table

    sf = "/root/testdata/sf0.01"
    n_cust = load_table(spark, sf, "customer").count()
    n_semi = joins.QUERIES["join_semi"](spark, sf).count()
    n_anti = joins.QUERIES["join_anti"](spark, sf).count()
    assert n_semi + n_anti == n_cust


def test_interval_overlap_matches_unbinned_theta_join(spark):
    """The month-binned plan must reproduce the naive theta self-join
    exactly (the bin + first-bin rule is a pure optimization, not a
    semantics change)."""
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.c_custkey, r.n_concurrent_pairs)
        for r in joins.QUERIES["join_interval_overlap"](spark, sf).collect()
    }
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("s"),
        )
        .agg(F.max("l_shipdate").alias("e"))
    )
    a = span.select("cust", F.col("okey").alias("ka"), F.col("s").alias("sa"), F.col("e").alias("ea"))
    b = span.select(F.col("cust").alias("cb"), F.col("okey").alias("kb"), F.col("s").alias("sb"), F.col("e").alias("eb"))
    want = {
        (r.cust, r.n)
        for r in a.join(
            b,
            (F.col("cust") == F.col("cb"))
            & (F.col("ka") < F.col("kb"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea")),
        )
        .groupBy("cust")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0
