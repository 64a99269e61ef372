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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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
