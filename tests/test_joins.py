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
