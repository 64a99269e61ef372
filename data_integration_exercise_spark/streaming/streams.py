"""Structured Streaming surface over ``events`` (SURVEY.md §2.9).

Strategy (batch-equivalence verification): each operator stages the canonical
events table to parquet, consumes it with ``spark.readStream`` + an
``availableNow`` trigger into a sink, and returns the sink contents. For a
bounded input the windowed/stateful semantics match a batch SQL equivalent,
which is the DuckDB oracle; the two genuinely trigger-dependent ops
(watermark drops, foreachBatch) stay rows-only [SURVEY §2.9].

Scale posture: these pipelines are written exactly as they would run
unbounded — keyed state (window/session/dedup aggregations partitioned by
time bucket or user), watermarks bounding state, no global collects.
Sinks match output cardinality: windowed aggregates whose row count grows
with data volume land in an executor-written parquet sink
(_parquet_result); only provably small keyed results (≤ tens of users /
segments) use the driver-resident memory sink.

Determinism: event time is the µs-truncated ``ts`` (io.load_table), so
window boundaries hash-match oracles computing on epoch_ns(ts)//1000.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

from ..io import load_table, sf_cache_tag
from ..registry_util import new_registry
from ..schemas import EVENTS

QUERIES, ORACLES, register = new_registry()

_US_15MIN = 900_000_000
_US_30MIN = 1_800_000_000


_STAGED: set[str] = set()  # staged inputs written by THIS process (read-only data)


def _staged_events_stream(spark, sf_dir: str, n_files: int = 1):
    """Stage canonical events → parquet; return a file-source stream over it.

    The stage is rewritten once per process per (sf, layout): the source
    parquet is driver-generated and immutable, so a copy this process
    already wrote is current — later queries in the same verify/bench run
    skip straight to the readStream."""
    # Full-path tag (not basename): two sf_dirs sharing a basename in one
    # process must not alias each other's staged copy (ADVICE r6 item 1).
    tag = sf_cache_tag(sf_dir)
    # PID-unique: a concurrent process must not rewrite a stage mid-read.
    path = f"/tmp/die_spark_stage/p{os.getpid()}/{tag}/events_stream_{n_files}"
    if path not in _STAGED:
        ev = load_table(spark, sf_dir, "events")
        writer = ev.repartitionByRange(n_files, "ts") if n_files > 1 else ev.coalesce(1)
        writer.write.mode("overwrite").parquet(path)
        _STAGED.add(path)
    reader = spark.readStream.schema(EVENTS)
    if n_files > 1:
        reader = reader.option("maxFilesPerTrigger", 1)
    # Watermarks require TimestampType (ltz), not ntz; with the session pinned
    # to UTC (io.prepare) the cast is wall-clock identity, and outputs are
    # cast back to ntz so hashes stay timezone-free.
    return reader.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))


#: state-store task count for local-scale runs. Stateful streaming has no AQE
#: coalescing, so every micro-batch pays one task per shuffle partition —
#: measured 2.05s→1.17s at sf0.1 going 32→8. On a real cluster this scales
#: with executor cores (it also fixes the state-store count for the
#: checkpoint's lifetime, so it's a deliberate deployment choice).
STREAM_SHUFFLE_PARTITIONS = "8"


def _sink_scope(name: str, sf_dir: str) -> str:
    """Per-(sf_dir, operator) result-sink scope. Name alone is NOT enough:
    the same operator invoked at two sf_dirs in ONE process would alias one
    sink/checkpoint — in append mode the second run restarts the first
    run's checkpointed query (same query id), whose file-source log points
    at the OTHER scale's staged input ('Wrong basePath' crash) and whose
    output dir still holds the other scale's rows (silent pollution). The
    exact bug class ADVICE r6 item 1 fixed for the staged INPUTS, caught on
    the sinks in round 11 when the registry-wide schema-kind test started
    executing every streaming key at sf0.001 in the same process as the
    sf0.01 parity suite. Same (name, sf_dir) reuse stays deliberate:
    append-mode reruns replay an all-files-processed checkpoint
    idempotently (bench's median-of-3 depends on that)."""
    tag = sf_cache_tag(sf_dir).replace(".", "_")
    return f"{tag}__{name}"


def _run_to_memory(stream_df, name: str, mode: str) -> None:
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _memory_result(spark, stream_df, name: str, mode: str, sf_dir: str) -> DataFrame:
    """Memory-sink runner — only for BOUNDED result sets (per-user/segment
    aggregates, ≤ a few thousand rows): the memory sink materializes on the
    driver. Growing-output windows use _parquet_result instead. The view
    name is sf-scoped (_sink_scope): the returned handle is lazy, so a
    name-only view re-registered by a later run at another scale would
    silently swap its contents."""
    scoped = _sink_scope(name, sf_dir)
    _run_to_memory(stream_df, scoped, mode)
    return spark.table(scoped)


def _parquet_result(spark, stream_df, name: str, mode: str, sf_dir: str) -> DataFrame:
    """Executor-side sink for streams whose output GROWS with data volume
    (per-window, per-session, per-dedup-key rows): results land in parquet
    files written by executors — nothing materializes on the driver, unlike
    the memory sink. Append mode uses the native checkpointed parquet sink;
    complete mode (which the parquet sink proper doesn't support) uses
    foreachBatch + overwrite — the standard idempotent complete-mode file
    sink, each micro-batch replacing the whole aggregate. The returned
    DataFrame scans the final state lazily. The path is sf-scoped
    (_sink_scope) so two scales in one process can't alias each other's
    checkpoint or output."""
    out = f"/tmp/die_spark_stage/p{os.getpid()}/sink/{_sink_scope(name, sf_dir)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        if mode == "complete":
            writer = stream_df.writeStream.foreachBatch(
                lambda batch_df, _id: batch_df.write.mode("overwrite").parquet(out)
            ).outputMode(mode)
        else:
            writer = (
                stream_df.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", out + "_ckpt")
                .outputMode(mode)
            )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(out)


@register(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*)               AS n,
           round(sum(value), 4)   AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark, sf_dir):
    """Per-hour × event-type tumbling-window aggregation. State is keyed by
    (window, type) — bounded by watermark in unbounded operation; identical
    to a date_trunc group-by on a bounded input."""
    s = _staged_events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"), "event_type", "n", "sum_value"
        )
    )
    return _parquet_result(spark, agg, "stream_tumbling", "complete", sf_dir)


@register(
    "stream_sliding",
    oracle=f"""
    WITH e AS (
        SELECT epoch_ns(ts) // 1000 AS ts_us, event_type FROM events
    ), slid AS (
        SELECT make_timestamp((ts_us // {_US_15MIN}) * {_US_15MIN}
                              - CAST(i AS BIGINT) * {_US_15MIN})
                   AS window_start,
               event_type
        FROM e, unnest([0, 1, 2, 3]) AS t(i)
    )
    SELECT window_start, event_type, count(*) AS n
    FROM slid GROUP BY 1, 2
    """,
)
def stream_sliding(spark, sf_dir):
    """1-hour window sliding every 15 minutes: each event lands in 4 windows.
    The oracle reconstructs Spark's epoch-aligned window starts by exploding
    each event into floor15(ts) - i·15min for i∈0..3 — exactly the window
    set Spark assigns."""
    s = _staged_events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("timestamp_ntz").alias("window_start"), "event_type", "n")
    )
    return _parquet_result(spark, agg, "stream_sliding", "complete", sf_dir)


@register(
    "stream_session",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS ts_us FROM events
    ), marked AS (
        SELECT *,
               CASE WHEN ts_us - lag(ts_us) OVER w > {_US_30MIN}
                    OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), sessions AS (
        SELECT *,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           make_timestamp(min(ts_us)) AS session_start,
           count(*)                   AS n_events,
           round(sum(value), 4)       AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark, sf_dir):
    """Per-user session windows with a 30-minute gap. Spark session
    semantics, pinned by tests/test_properties.py on a hand-built frame: an
    event at exactly prev_end (= last_ts + gap) MERGES into the session, so
    the oracle's new-session rule is ``diff > gap`` (strict)."""
    s = _staged_events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min("ts").cast("timestamp_ntz").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
    )
    return _parquet_result(spark, agg, "stream_session", "complete", sf_dir)


@register("stream_watermark_late")  # rows-only: drop rule is trigger-dependent
def stream_watermark_late(spark, sf_dir):
    """Watermark-bounded append-mode aggregation consumed file-by-file
    (maxFilesPerTrigger=1 over 8 time-ranged files): late rows arriving
    after the 10-minute watermark advances past their window are dropped —
    how many depends on batch boundaries, which is exactly why this op is
    rows-only (SURVEY §2.9)."""
    s = _staged_events_stream(spark, sf_dir, n_files=8)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("timestamp_ntz").alias("window_start"), "event_type", "n")
    )
    return _parquet_result(spark, agg, "stream_watermark_late", "append", sf_dir)


#: deterministic-watermark geometry: 15-minute windows (900e6 µs), 10-minute
#: watermark delay (600e6 µs), and a 1-minute safety margin (60e6 µs) on
#: BOTH the staged drop set and the kept-window readout, so no row or window
#: ever sits exactly on Spark's eviction boundary (whose <=-vs-< semantics
#: the operator therefore never has to assume).
_WM_WINDOW_US = 900_000_000
_WM_CLOSE_US = 660_000_000  # delay (600e6) + margin (60e6)


def _staged_watermark_stream(spark, sf_dir: str):
    """Three-batch staged event stream with an EXACTLY COMPUTABLE drop set
    (VERDICT r12 item 7). Batch 1 holds the on-time rows INCLUDING the
    global max timestamp, so the watermark computed after it stands at
    max(ts) − 10 min. Batch 2 is a single on-time "advance" row (the
    min-event_id on-time row whose ts sits strictly BELOW the max, so the
    max-ts row itself always stays in batch 1): Spark ≥3.4 splits the
    late-events watermark
    from the eviction watermark — batch N filters late input against the
    watermark in effect DURING batch N−1 (measured here on 4.1.2:
    numRowsDroppedByWatermark stays 0 when the late file lands in batch 2,
    drops everything when it lands in batch 3) — so this spacer batch
    commits max(ts) − 10 min as batch 3's late-event filter. Batch 3 holds
    the designated late set — rows with even event_id whose 15-minute
    window closed at least 1 min BELOW that watermark — all dropped under
    either <=-or-< boundary semantics. Each batch is one part-file (a
    multi-file half could split across micro-batches, letting the max-ts
    batch precede sibling on-time rows) with pinned mtimes 100 s apart,
    since the file source orders batches by modification time. Returns
    (stream, max_us); the two scalar collects are stage GEOMETRY, not
    data movement."""
    tag = sf_cache_tag(sf_dir)
    stage = f"/tmp/die_spark_stage/p{os.getpid()}/{tag}/events_wm_det"
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts_us")).collect()[0][0]
    if stage not in _STAGED:
        late = (F.col("event_id") % 2 == 0) & (
            F.expr(f"ts_us div {_WM_WINDOW_US}") * _WM_WINDOW_US + _WM_WINDOW_US
            <= F.lit(mx - _WM_CLOSE_US)
        )
        ontime = ev.filter(~late)
        # The advance row must NOT be the sole holder of max(ts): routing
        # that row to batch 2 would leave batch 1's watermark below
        # mx − 10 min, letting part of the designated late set through
        # batch 3's late filter (round-13 review finding). Restrict the
        # pick to on-time rows strictly below the max; if none exists
        # (degenerate: every on-time row at mx), the advance file is
        # empty — an empty file is still a batch, so the spacer still
        # commits batch 1's watermark ahead of the late batch.
        adv_id = (
            ontime.filter(F.col("ts_us") < mx)
            .agg(F.min("event_id"))
            .collect()[0][0]
        )
        adv_pred = (
            F.col("event_id") == adv_id if adv_id is not None else F.lit(False)
        )
        os.makedirs(stage, exist_ok=True)
        for name, frame, mtime in (
            ("00_ontime", ontime.filter(~adv_pred), 1_700_000_000),
            ("01_advance", ontime.filter(adv_pred), 1_700_000_100),
            ("02_late", ev.filter(late), 1_700_000_200),
        ):
            tmp = f"{stage}_tmp_{name}"
            frame.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
            dst = os.path.join(stage, f"{name}.parquet")
            os.replace(os.path.join(tmp, part), dst)
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(dst, (mtime, mtime))
        _STAGED.add(stage)
    s = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return s, mx


@register(
    "stream_watermark_deterministic",
    oracle=f"""
    WITH m AS (SELECT max(epoch_us(ts)) AS mx FROM events),
    keep AS (
        SELECT (epoch_us(ts) // {_WM_WINDOW_US}) * {_WM_WINDOW_US} AS ws_us,
               event_type
        FROM events, m
        WHERE NOT (event_id % 2 = 0
                   AND (epoch_us(ts) // {_WM_WINDOW_US}) * {_WM_WINDOW_US}
                       + {_WM_WINDOW_US} <= mx - {_WM_CLOSE_US})
    )
    SELECT make_timestamp(ws_us) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM keep, m
    WHERE ws_us + {_WM_WINDOW_US} <= mx - {_WM_CLOSE_US}
    GROUP BY ws_us, event_type
    """,
)
def stream_watermark_deterministic(spark, sf_dir):
    """Watermark drop semantics converted from rows-only to HASH truth
    (VERDICT r12 item 7): the staged three-batch input pins the batch
    boundaries, so the drop set is exactly the staged late half and the
    kept set is the batch SQL of the on-time subset restricted to windows
    that closed ≥1 min below the final watermark — both sides of the
    margin, so Spark's eviction-boundary choice can't flip a row. The
    general trigger-dependent case stays covered by the rows-only
    `stream_watermark_late`; this key is the deterministic-by-construction
    variant a pipeline uses to TEST its late-data policy. 100 TB: identical
    plan to any watermarked windowed agg — per-batch partial agg into
    watermark-bounded state keyed by (window, type); the readout filter is
    a scalar comparison on the window key."""
    s, mx = _staged_watermark_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
    )
    res = _parquet_result(
        spark, agg, "stream_watermark_deterministic", "append", sf_dir
    )
    closed = (
        F.unix_micros(F.col("window_start").cast("timestamp")) + _WM_WINDOW_US
        <= F.lit(mx - _WM_CLOSE_US)
    )
    return res.filter(closed)


@register(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id,
           event_type,
           date_trunc('minute', ts) AS minute
    FROM events
    """,
)
def stream_dedup(spark, sf_dir):
    """Stateful streaming dedup on (user, type, minute). Which physical row
    survives is batch-order-dependent, so the query projects exactly the
    dedup key — the key SET is deterministic and hash-verifiable. State is
    bounded by the watermark in unbounded operation."""
    s = _staged_events_stream(spark, sf_dir)
    dedup = (
        s.withWatermark("ts", "1 hour")
        .select(
            "user_id", "event_type", F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("minute"), "ts"
        )
        .dropDuplicates(["user_id", "event_type", "minute"])
        .select("user_id", "event_type", "minute")
    )
    return _parquet_result(spark, dedup, "stream_dedup", "append", sf_dir)


@register(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           count(*)             AS n,
           round(sum(value), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE c_custkey < 15
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream-static enrichment: the event stream joins a static customer dim
    (user_id ↔ c_custkey, 15 users) then aggregates per segment. The static
    side is broadcast to every micro-batch — the standard dimension-enrich
    shape for streaming ETL."""
    s = _staged_events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 15)
    )
    agg = (
        s.join(dim, s.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    return _memory_result(spark, agg, "mem_stream_static_join", "complete", sf_dir)


@register("stream_foreachbatch")  # rows-only: sink side-effects, trigger-dependent
def stream_foreachbatch(spark, sf_dir):
    """foreachBatch sink: each micro-batch upserts (overwrite-by-batch dir)
    into a parquet area; the query returns the re-read final state. This is
    the escape hatch for sinks Structured Streaming lacks natively (JDBC
    upserts, MERGE targets)."""
    tag = sf_cache_tag(sf_dir)
    out = f"/tmp/die_spark_stage/p{os.getpid()}/{tag}/foreachbatch_out"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(f"{out}/batch_{batch_id}")
        )

    s = _staged_events_stream(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = s.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(f"{out}/*")
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
    )


@register(
    "stream_stateful_running",
    oracle="""
    SELECT user_id,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running(spark, sf_dir):
    """Custom stateful operator via ``applyInPandasWithState``: a per-user
    running (count, sum) accumulator the built-in windowed aggregates can't
    express (arbitrary Python state transition per key per micro-batch).
    The staged input is split into 4 time-ranged files consumed one per
    micro-batch (maxFilesPerTrigger=1), so the state provably carries
    ACROSS batches: update-mode emits a cumulative row per (user, batch),
    and the final cumulative row per user — selected by the strictly
    increasing n_events — must equal the global batch aggregate, which is
    the oracle. State is a 2-field struct per user (bounded: 15 users);
    unbounded deployments would add a timeout to expire idle keys."""
    from pyspark.sql import Window
    from pyspark.sql.streaming.state import GroupStateTimeout

    s = _staged_events_stream(spark, sf_dir, n_files=4)

    def update(key, pdfs, state):
        import pandas as pd

        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((n, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [tot]}
        )

    out = s.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = _memory_result(spark, out, "mem_stream_stateful_running", "update", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        mem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id               AS view_id,
           p.event_id               AS purchase_id,
           epoch_ns(v.ts) // 1000   AS view_ts_us,
           epoch_ns(p.ts) // 1000   AS purchase_ts_us
    FROM events v JOIN events p
      ON v.user_id = p.user_id
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
      AND epoch_ns(p.ts) // 1000 >= epoch_ns(v.ts) // 1000
      AND epoch_ns(p.ts) // 1000 <  epoch_ns(v.ts) // 1000 + 3600000000
    """,
)
def stream_stream_join(spark, sf_dir):
    """Stream-stream interval join: views matched to same-user purchases
    that happen within the following hour — the canonical attribution
    query. Both sides are independent watermarked streams; the equi-key
    (user_id) plus the two-sided event-time bound is exactly what Spark
    needs to size the join state and evict rows once the other side's
    watermark passes view_ts + 1h, so state stays bounded on an unbounded
    feed. On a bounded availableNow run (single micro-batch: nothing is
    ever late) the result equals the batch interval join the oracle runs.
    Output carries epoch-µs bigints so hashes are timezone-free."""
    views = (
        _staged_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.col("ts_us").alias("view_ts_us"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _staged_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("ts_us").alias("purchase_ts_us"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("user_id", "view_id", "purchase_id", "view_ts_us", "purchase_ts_us")
    return _parquet_result(spark, joined, "stream_stream_join", "append", sf_dir)


@register(
    "stream_cdc_upsert",
    oracle="""
    WITH latest AS (
        SELECT user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_ns(ts) // 1000 AS t, event_id,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id,
           event_type AS last_type,
           cents      AS last_cents,
           t          AS last_t
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    """,
)
def stream_cdc_upsert(spark, sf_dir):
    """Streaming CDC upsert — the foreachBatch MERGE pattern every
    lakehouse sink runs: the event log streams in 4 time-ranged files
    (one per micro-batch); each batch reduces to its per-user latest row,
    then merges latest-wins into a parquet snapshot, with 'error' events
    acting as DELETE tombstones. Tombstones PERSIST in the snapshot state
    (a filtered-out tombstone would let an older batch's value
    resurrect) and are dropped only in the returned view. Because the
    merge is associative latest-wins on a deterministic (t, event_id)
    order, the final snapshot is independent of batch boundaries — which
    is exactly what makes it hash-verifiable against the batch oracle,
    and what makes the pattern safe under reprocessing/backfill in
    production. The batch-local reduce before the merge keeps per-batch
    state traffic at |users in batch|, not |events|.

    100 TB: swap the parquet overwrite for MERGE INTO on a transactional
    table format; the per-batch shape (reduce -> keyed merge) is
    unchanged, and state size is bounded by live keys, not stream
    length."""
    from pyspark.sql import Window

    src = _staged_events_stream(spark, sf_dir, n_files=4)
    snap = f"/tmp/die_spark_stage/p{os.getpid()}/sink/stream_cdc_upsert_state"
    ckpt = f"/tmp/die_spark_stage/p{os.getpid()}/sink/stream_cdc_upsert_ckpt"
    import shutil

    # fresh state AND checkpoint per invocation: a stale checkpoint would
    # mark the staged files already-consumed and skip every batch
    shutil.rmtree(snap, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("t"), F.desc("event_id")
    )

    def merge(batch_df, _id):
        b = batch_df.select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.unix_micros("ts").alias("t"),
            "event_id",
        )
        latest_b = b.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        ).drop("rn")
        bspark = batch_df.sparkSession
        if os.path.isdir(snap):
            merged = (
                bspark.read.parquet(snap)
                .unionByName(latest_b)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
            # materialize before overwriting the path we just read
            merged = merged.localCheckpoint()
        else:
            merged = latest_b
        merged.write.mode("overwrite").parquet(snap)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            src.writeStream.foreachBatch(merge)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(snap)
        .filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("cents").alias("last_cents"),
            F.col("t").alias("last_t"),
        )
    )


@register(
    "stream_topk_per_window",
    oracle="""
    WITH counts AS (
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT hour_start, event_type, n,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY hour_start
                                     ORDER BY n DESC, event_type ASC) AS rnk
        FROM counts
    )
    WHERE rnk <= 3
    """,
)
def stream_topk_per_window(spark, sf_dir):
    """Streaming leaderboard: the top-3 event types of every tumbling hour.
    Structured Streaming cannot rank over its own windowed aggregation
    (no window-function-over-aggregate in a streaming plan), so this is
    the standard two-stage shape: the STREAM maintains the (window, type)
    counts — bounded state under the watermark, exactly stream_tumbling's
    machinery — and the leaderboard rank runs as a bounded BATCH pass over
    the sink table (|windows|·|types| rows, partitioned by window; ties
    break on event_type so the cut is deterministic). This is how
    dashboards actually consume windowed streams: heavy counting in the
    stream, cheap ranking at read time.

    100 TB: stream state is (windows × types) rows regardless of event
    volume; the rank pass partitions by window over the sink — never a
    global sort, never per-event work."""
    s = _staged_events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n",
        )
    )
    counts = _parquet_result(spark, agg, "stream_topk_per_window", "complete", sf_dir)
    from pyspark.sql import Window as W

    rnk = F.row_number().over(
        W.partitionBy("hour_start").orderBy(F.col("n").desc(), F.col("event_type").asc())
    )
    return (
        counts.withColumn("rnk", rnk.cast("long")).filter(F.col("rnk") <= 3)
    )


def _staged_table_stream(
    spark,
    sf_dir: str,
    table: str,
    n_files: int = 1,
    max_files_per_trigger: int | None = None,
    order_col: str | None = None,
):
    """Stage a canonical table → parquet; return a file-source stream.

    Same contract as _staged_events_stream (process-private PID-unique
    path, full-path sf tag, staged once per (sf, pid), immutable source) —
    the ONE parameterized helper behind the table streams so those
    invariants live in a single place. ``n_files`` > 1 (with
    ``order_col`` for a deterministic repartitionByRange split and
    ``max_files_per_trigger`` on the reader) stages a MULTI-micro-batch
    source for operators whose cross-batch merge is the thing under
    test."""
    from ..schemas import SCHEMAS

    tag = sf_cache_tag(sf_dir)
    suffix = "" if n_files == 1 else f"_{n_files}f"
    path = f"/tmp/die_spark_stage/p{os.getpid()}/{tag}/{table}_stream{suffix}"
    if path not in _STAGED:
        src = load_table(spark, sf_dir, table)
        src = (
            src.coalesce(1)
            if n_files == 1
            else src.repartitionByRange(n_files, order_col)
        )
        src.write.mode("overwrite").parquet(path)
        _STAGED.add(path)
    reader = spark.readStream.schema(SCHEMAS[table])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def _minhash_sig_oracle() -> str:
    from ..operators.pipeline import MINHASH_PERMS, _V, _VOCAB_DUCK

    terms = " + ".join(
        f"CAST(list_min(list_transform(idxs, i -> ({a} * i + {b}) % {_V}))"
        f" AS BIGINT) * {_V ** p}"
        for p, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(string_split(text, ' '),
                             t -> list_position({_VOCAB_DUCK}, t))) AS idxs
        FROM documents
    ), sig AS (
        SELECT doc_id, lang, CAST({terms} AS BIGINT) AS sig FROM toks
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                         AS n_docs,
           CAST(count(DISTINCT sig) AS BIGINT)              AS n_kept,
           CAST(count(*) - count(DISTINCT sig) AS BIGINT)   AS n_dropped,
           CAST(1000 * count(DISTINCT sig) // count(*) AS BIGINT)
               AS kept_permille
    FROM sig GROUP BY lang
    """


@register("stream_dedup_minhash", oracle=_minhash_sig_oracle())
def stream_dedup_minhash(spark, sf_dir):
    """Streaming near-dup dedup AT INGEST: every arriving document gets its
    full 8-permutation MinHash signature (the same deterministic
    vocabulary-index arithmetic as dedup_minhash_lsh — one BIGINT packing
    all 8 minhashes, a bijection of the tuple) and `dropDuplicates` on
    (lang, signature) keeps the first arrival of each near-dup class —
    the admission-control form of dedup a 100 TB ingest pipeline runs so
    exact/near duplicate crawl shards never reach storage. WHICH physical
    doc survives is batch-order-dependent, so (the stream_dedup
    discipline) the verified output is the order-independent readout:
    per-lang arrivals vs kept near-dup classes and the keep rate. The
    batch oracle computes the same class count via COUNT(DISTINCT sig).

    100 TB: signature computation is a narrow per-row projection (no
    pre-aggregation, unlike the batch mask build — ingest sees one doc at
    a time); dedup state is one row per KEPT class, partitioned on the
    dedup key — state scales with unique content, not arrivals. In
    unbounded operation the key set is bounded with
    dropDuplicatesWithinWatermark on ingest time (trade: re-admits a
    class after the horizon); this bounded demo keeps exact state."""
    from ..operators.pipeline import MINHASH_PERMS, _V, _VOCAB_SPARK

    idxs = (
        f"array_distinct(transform(split(text, ' '), "
        f"t -> array_position({_VOCAB_SPARK}, t)))"
    )
    terms = " + ".join(
        f"array_min(transform(_idxs, i -> CAST(({a} * i + {b}) % {_V} AS BIGINT)))"
        f" * {_V ** p}L"
        for p, (a, b) in enumerate(MINHASH_PERMS)
    )
    s = _staged_table_stream(spark, sf_dir, "documents")
    kept = (
        s.withColumn("_idxs", F.expr(idxs))
        .select("doc_id", "lang", F.expr(f"CAST({terms} AS BIGINT)").alias("sig"))
        .dropDuplicates(["lang", "sig"])
    )
    sink = _parquet_result(spark, kept, "stream_dedup_minhash", "append", sf_dir)
    arrivals = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    kept_counts = sink.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return (
        arrivals.join(kept_counts, "lang")
        .select(
            "lang",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_dropped"),
            F.expr("CAST(1000 * n_kept div n_docs AS BIGINT)").alias(
                "kept_permille"
            ),
        )
    )


def _ann_ingest_oracle() -> str:
    """stream_ann_ingest's oracle: the base-split Lloyd training of
    sim_ann_append (same unrolled CTEs), then frozen-centroid assignment
    of EVERY vector and the per-list ingest dashboard."""
    head = """
    WITH allq AS (
        SELECT vec_id,
               (('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT
                   % 10) AS m,
               CAST(floor(1000 * unnest(embedding)::DOUBLE + 0.5) AS BIGINT)
                   AS qv,
               unnest(range(len(embedding))) AS pos
        FROM embeddings
    ), q AS (
        SELECT vec_id, qv, pos FROM allq WHERE m <> 0
    ), seeds AS (
        SELECT vec_id,
               row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                   AS cluster
        FROM (SELECT DISTINCT vec_id FROM q)
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
    ),
    c0 AS (
        SELECT s.cluster, q.pos, q.qv AS c FROM seeds s JOIN q USING (vec_id)
    )"""
    from ..operators.curation import _lloyd_unroll_ctes

    parts = [head, _lloyd_unroll_ctes()]
    parts.append("""
    , dALL AS (
        SELECT a.vec_id, c3.cluster,
               CAST(sum((a.qv - c3.c) * (a.qv - c3.c)) AS BIGINT) AS d2
        FROM allq a JOIN c3 ON a.pos = c3.pos GROUP BY 1, 2
    ), assign AS (
        SELECT vec_id, cluster, d2 FROM (
            SELECT vec_id, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rn
            FROM dALL) WHERE rn = 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM assign
    )
    SELECT cluster AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           CAST(sum(d2) AS BIGINT) AS inertia_q,
           CAST(1000 * count(*) // t.n AS BIGINT) AS share_permille
    FROM assign CROSS JOIN tot t GROUP BY cluster, t.n""")
    return "".join(parts)


@register("stream_ann_ingest", oracle=_ann_ingest_oracle())
def stream_ann_ingest(spark, sf_dir):
    """Streaming ANN-index ingest — the vector-store twin of
    stream_dedup_minhash's dedup-at-ingest: the 8-list IVF index trains
    BATCH-side on the ~90% md5-hash BASE split (the shared fixed-
    3-iteration quantized Lloyd of sim_ann_append / sim_kmeans_lloyd /
    plan_ivf_probe_geometry), and every ARRIVING vector is assigned to
    the FROZEN centroids inside the stream itself: the 8x64 integer
    model is baked into the streaming projection as literals (the
    model-distribution path — 8 rows of trained centroids move to the
    plan, data never moves to the driver), each row computes its 8
    quantized squared-L2 distances with one transform/zip_with fold and
    takes the strict-< argmin (lowest cluster wins ties — the (d2,
    cluster) rule everywhere else). STATELESS streaming inference: no
    watermark, no state store, nothing to recover beyond the sink
    offsets. The verified readout is the ingest dashboard over the
    assignment sink: per-list arrivals, quantized inertia, and integer
    share permille; the oracle replays the identical trajectory
    (base-split training, frozen assignment of all vectors) in CTEs.

    100 TB: this is how a production vector store actually ingests —
    train offline (amortized, sim_ann_append's arm), broadcast the
    frozen coarse quantizer into every ingest executor, assign each
    arriving vector with a narrow per-row projection, append
    (list_id, vec) to the posting-list sink. Per-row cost is k·dim
    integer multiply-adds; state is zero; throughput scales with
    executors, not with index size."""
    from ..operators.curation import _QUANT_SPARK, _lloyd_centroids

    e = load_table(spark, sf_dir, "embeddings")
    m = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 10
    )
    base = (
        e.select("vec_id", "label", F.expr(_QUANT_SPARK).alias("qarr"), m.alias("m"))
        .filter(F.col("m") != 0)
        .drop("m")
        .localCheckpoint(eager=False)
    )
    carr, _assign = _lloyd_centroids(base, iters=3)
    # model distribution: the trained 8x64 centroid table becomes plan
    # literals (8 rows — the one collect here moves the MODEL, not data)
    model = sorted(
        ((r["cluster"], list(r["carr"])) for r in carr.collect()),
        key=lambda t: t[0],
    )
    cents_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{int(v)}L" for v in arr) + ")"
        for _, arr in model
    ) + ")"
    clist_sql = "array(" + ", ".join(f"{int(c)}L" for c, _ in model) + ")"
    k = len(model)

    s = _staged_table_stream(spark, sf_dir, "embeddings")
    scored = s.select(
        "vec_id", F.expr(_QUANT_SPARK).alias("_q")
    ).select(
        "vec_id",
        F.expr(
            f"transform({cents_sql}, c -> aggregate(zip_with(_q, c,"
            f" (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x))"
        ).alias("_d"),
    )
    # strict-< fold keeps the LOWEST index on ties — the (d2, cluster)
    # rule; guard k == 1 (Spark's sequence(1, 0) descends, not empties)
    argmin = (
        "1"
        if k == 1
        else (
            f"aggregate(sequence(1, {k - 1}), 1,"
            f" (acc, i) -> IF(element_at(_d, i + 1) <"
            f" element_at(_d, acc), i + 1, acc))"
        )
    )
    assigned = scored.select(
        "vec_id",
        F.expr(f"element_at({clist_sql}, {argmin})").alias("cluster"),
        F.expr("array_min(_d)").alias("d2"),
    )
    sink = _parquet_result(spark, assigned, "stream_ann_ingest", "append", sf_dir)
    tot = sink.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        sink.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.sum("d2").cast("long").alias("inertia_q"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("cluster").cast("long").alias("cluster_id"),
            "n_assigned",
            "inertia_q",
            F.expr("CAST(1000 * n_assigned div n AS BIGINT)").alias(
                "share_permille"
            ),
        )
    )


_QSK_STREAM_K = 512

_QSK_STREAM_ORACLE = f"""
    WITH c AS (
        SELECT o_orderpriority AS pri, o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 12))::BIGINT
                   AS skey
        FROM orders
    ), samp AS (
        SELECT pri, k, cents,
               row_number() OVER (PARTITION BY pri ORDER BY skey, k) AS rn
        FROM c
    ), sr AS (
        SELECT pri, cents,
               row_number() OVER (PARTITION BY pri ORDER BY cents, k) AS r,
               count(*) OVER (PARTITION BY pri) AS m
        FROM samp WHERE rn <= {_QSK_STREAM_K}
    ), est AS (
        SELECT pri, CAST(max(m) AS BIGINT) AS m,
               min(CASE WHEN 100 * r >= 50 * m THEN cents END) AS p50_cents,
               min(CASE WHEN 100 * r >= 90 * m THEN cents END) AS p90_cents
        FROM sr GROUP BY pri
    ), tot AS (
        SELECT pri, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY pri
    )
    SELECT est.pri AS o_orderpriority, tot.n, est.m,
           est.p50_cents, est.p90_cents
    FROM est JOIN tot ON est.pri = tot.pri
"""


@register("stream_quantile_ingest", oracle=_QSK_STREAM_ORACLE)
def stream_quantile_ingest(spark, sf_dir):
    """Streaming quantile-sketch ingest — the micro-batch twin of
    agg_quantile_sketch_merge, closing the ingest trio next to
    stream_dedup_minhash (dedup-at-ingest) and stream_ann_ingest
    (index-at-ingest): a per-group bottom-k KMV sample plus a running
    count is maintained AS DATA LANDS, so p50/p90 are answerable after
    every micro-batch without ever rescanning history. orders is staged
    into 4 files and streamed with maxFilesPerTrigger=1, so the merge
    really runs across 4 micro-batches; foreachBatch folds each batch
    into versioned state (bottom-k of prev-state ∪ batch, counts
    accumulated), and the readout runs nearest-rank over the final
    sample.

    Hash-oracled DESPITE batching because the bottom-k algebra is
    batch-split independent: bottom_k(bottom_k(A) ∪ B) = bottom_k(A ∪ B),
    so the final state equals the global bottom-k no matter how the
    files were split into batches, and the batch-SQL oracle states the
    global form directly. State versions are immutable parquet dirs (no
    read-then-overwrite-self); the latest version is discovered from the
    manifest at read time, so checkpointed re-runs (bench median-of-3)
    replay nothing and read the settled state — the _sink_scope
    discipline keeps scales apart.

    100 TB: per-batch work is one narrow projection + a groups×k-bounded
    merge against state that never exceeds groups × (k + 1) rows — state
    scales with GROUPS, not arrivals; the sample-key hash makes the
    retained sample identical to what a batch job over the full corpus
    would keep, which is what makes streaming-vs-batch parity testable
    at all (the lambda-architecture reconciliation property)."""
    stream = _staged_table_stream(
        spark,
        sf_dir,
        "orders",
        n_files=4,
        max_files_per_trigger=1,
        order_col="o_orderkey",
    )

    base = (
        f"/tmp/die_spark_stage/p{os.getpid()}/sink/"
        f"{_sink_scope('stream_quantile_ingest', sf_dir)}"
    )

    def _latest_version(below: int | None = None) -> int:
        """Largest on-disk state version, optionally strictly below a
        batch id: a REPLAYED micro-batch (foreachBatch is at-least-once —
        a crash between the state write and the checkpoint commit replays
        the batch) must read its predecessor's state, never its own
        half-committed version — self-read would both double-count the
        batch and overwrite a path being read from."""
        root = os.path.dirname(base)
        prefix = os.path.basename(base) + "_v"
        if not os.path.isdir(root):
            return -1
        vs = [
            int(d[len(prefix):])
            for d in os.listdir(root)
            if d.startswith(prefix)
            and d[len(prefix):].isdigit()
            # completeness check: only versions holding BOTH halves count
            # (the atomic rename publish makes half versions impossible
            # going forward; this also rejects any stranded pre-fix dir)
            and os.path.isdir(os.path.join(root, d, "sample"))
            and os.path.isdir(os.path.join(root, d, "counts"))
        ]
        if below is not None:
            vs = [v for v in vs if v < below]
        return max(vs, default=-1)

    def _merge(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window as W

        b = batch_df.select(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ).withColumn(
            "skey",
            F.expr(
                "CAST(conv(substr(md5(CAST(k AS STRING)), 1, 12), 16, 10)"
                " AS BIGINT)"
            ),
        )
        bs = batch_df.sparkSession
        prev = _latest_version(below=batch_id)
        if prev >= 0:
            prev_s = bs.read.parquet(f"{base}_v{prev}/sample")
            prev_c = bs.read.parquet(f"{base}_v{prev}/counts")
        else:
            prev_s = b.limit(0)
            prev_c = bs.createDataFrame([], "pri string, n long")
        rn = F.row_number().over(
            W.partitionBy("pri").orderBy("skey", "k")
        )
        sample = (
            prev_s.unionByName(b)
            .withColumn("_rn", rn)
            .filter(F.col("_rn") <= _QSK_STREAM_K)
            .drop("_rn")
        )
        counts = (
            prev_c.unionByName(
                b.groupBy("pri").agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
            .groupBy("pri")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        # Atomic version commit (ADVICE r12 item 3): the two frames land
        # under a .tmp staging dir and a single os.rename publishes the
        # version — a crash between the sample and counts writes can no
        # longer leave a half version that _latest_version() would pick
        # up. A replayed batch (at-least-once foreachBatch) recomputes the
        # identical deterministic content from prev-state, so an existing
        # published dir is simply replaced.
        out = f"{base}_v{batch_id}"
        tmp = f"{out}.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        sample.write.mode("overwrite").parquet(f"{tmp}/sample")
        counts.write.mode("overwrite").parquet(f"{tmp}/counts")
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            stream.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", base + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    final = _latest_version()
    sample = spark.read.parquet(f"{base}_v{final}/sample")
    counts = spark.read.parquet(f"{base}_v{final}/counts")
    from ..operators.aggregates import _nearest_rank_quantiles

    est = _nearest_rank_quantiles(
        sample, ["pri"], "m", "p50_cents", "p90_cents"
    )
    return est.join(counts, "pri").select(
        F.col("pri").alias("o_orderpriority"),
        "n",
        "m",
        "p50_cents",
        "p90_cents",
    )
