"""Oracle-parity tests for the TPC-H-adapted composite workloads."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import analytics

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(analytics.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)
