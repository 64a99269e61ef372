"""Batch-equivalence parity for §2.9 streaming ops (bounded availableNow runs)."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.streaming import streams

from .parity import assert_parity, run_rows_only

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(streams.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


@pytest.mark.parametrize("key", sorted(set(streams.QUERIES) - set(streams.ORACLES)))
def test_rows_only(spark, key):
    assert run_rows_only(spark, key, SF) > 0


def test_watermark_drops_some_rows(spark):
    """With file-by-file triggers over time-ranged files, the 10-minute
    watermark should emit fewer-or-equal (window, type) rows than the
    no-late-data total — and the run must terminate (no hung trigger)."""
    n_append = streams.QUERIES["stream_watermark_late"](spark, SF).count()
    assert 0 < n_append
