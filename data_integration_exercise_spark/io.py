"""Table loading and view registration.

Single chokepoint for reading the driver-generated parquet (TESTDATA.md):
every operator goes through :func:`load_table` so the events nanosecond
workaround and session confs are applied uniformly regardless of who built
the SparkSession (the driver builds its own for verify runs).

Scale posture: these are plain ``spark.read.parquet`` scans — Catalyst gets
full predicate pushdown / column pruning, and on a cluster the same code
reads a 100 TB table as a partitioned file listing. No collect, no caching
policy here (callers opt in per workload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .schemas import TABLES
from .session import RUNTIME_CONFS


def sf_cache_tag(sf_dir: str) -> str:
    """Collision-free per-``sf_dir`` tag for staged-copy paths and catalog
    table names.

    Basename alone is NOT enough: two different paths sharing a basename
    (e.g. ``/a/sf0.01`` and ``/b/sf0.01``) in one process would silently
    reuse each other's staged data — the same bug class the per-PID-only
    plan_cbo_stats cache hit in round 6 (ADVICE r6 item 1). Keep the
    basename for human-readable paths, disambiguate with a digest of the
    full absolute path.
    """
    import hashlib
    import os
    import re

    full = os.path.abspath(sf_dir.rstrip("/") or "/")
    base = re.sub(r"[^A-Za-z0-9._-]", "_", os.path.basename(full) or "root")
    return f"{base}_{hashlib.md5(full.encode()).hexdigest()[:8]}"


def prepare(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs correctness depends on (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable in some session; builder path sets it
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the 10 operative tables from ``{sf_dir}/{name}.parquet``.

    ``events`` is canonicalized (FIXTURES.md "events") to the pair ``ts``
    (TimestampNTZ, µs) + ``ts_us`` (bigint epoch-µs — for arithmetic that
    must exactly match a DuckDB oracle computing ``epoch_ns(ts)//1000``),
    handling BOTH physical layouts the driver has generated across rounds:

    - timestamp[ns] parquet — Spark 4 reads it only via nanosAsLong=true as
      a bigint; floor-truncate to µs with *integer* division (``ts div
      1000`` — float division at 1.7e18 ns exceeds double's 2^53 integer
      range and corrupts low-order digits).
    - timestamp[us] parquet (driver testdata since round 4) — arrives as
      TIMESTAMP_NTZ; with the session pinned to UTC (prepare) the
      ntz→ltz cast is wall-clock identity, so ``unix_micros`` is exact.
    """
    prepare(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        # Read with the PINNED schema (schemas.py, measured from the driver
        # parquet): skipping per-read footer schema inference is ~7× less
        # driver latency per load_table call (measured 73 ms → 10 ms at
        # sf0.1 — round-14; multi-table queries paid it per table per run),
        # and a production 100 TB reader pins schemas anyway so file-set
        # sampling never runs. Parquet reconciles by name and errors loudly
        # on a type change; the full-registry emulator sweep (all three
        # scales) plus tests/parity guard against silent drift.
        from .schemas import SCHEMAS

        return spark.read.schema(SCHEMAS[name]).parquet(path)
    # events: the physical layout varies by driver round (ns-bigint vs µs
    # TIMESTAMP_NTZ) — detect it from one footer read per call (driver-side
    # milliseconds; NOT cached, every invocation re-reads the input)
    df = spark.read.parquet(path)
    if name == "events":
        if isinstance(df.schema["ts"].dataType, LongType):
            ts = F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            ts_us = F.expr("ts div 1000")
        else:
            ts = F.col("ts").cast("timestamp_ntz")
            ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        df = df.select(
            "event_id",
            ts.alias("ts"),
            ts_us.alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (names match the DuckDB oracle's)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
