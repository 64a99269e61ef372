"""Oracle-parity tests for §2.8 scalar function families."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.functions import scalar

from .parity import assert_parity


@pytest.mark.parametrize("key", sorted(scalar.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_len_checks_invariant(spark):
    """Property: token chars + separators == n_chars for every document."""
    rows = scalar.QUERIES["fn_array"](spark, "/root/testdata/sf0.01").collect()
    assert all(r.len_checks for r in rows)
