"""Oracle-parity tests for §2.4 aggregation operators."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import aggregates

from .parity import assert_parity

ORACLE_KEYS = sorted(aggregates.ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_parity(spark, key):
    assert_parity(spark, key)


def test_flagship_smoke(spark):
    """entry() contract: sf0.001, >0 rows, stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
