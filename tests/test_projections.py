"""Oracle-parity tests for §2.2 projection/filter operators."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import projections

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(projections.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)
