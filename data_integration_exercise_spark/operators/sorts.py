"""Sort / limit / top-k operators (SURVEY.md §2.6).

The driver's value-hash is order-insensitive, so ordering is made observable
in the *content* by materializing a row_number over the same total order.

Scale notes: global sorts use Spark's range-partitioned exchange (sampled
boundaries → parallel sort); top-k plans as TakeOrderedAndProject (per-
partition heaps, driver merges k rows — never a full sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()


@register(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_or_null,
           o_totalprice,
           CAST(row_number() OVER (
               ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST,
                        o_totalprice DESC,
                        o_orderkey ASC) AS BIGINT) AS pos
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def sort_multikey(spark, sf_dir):
    """Multi-key ORDER BY with explicit NULLS FIRST (nulls injected via
    nullif): Spark's ASC default is nulls-first but DuckDB's is nulls-last —
    both sides pin it explicitly. Position materialized so the hash checks
    the ordering itself."""
    o = load_table(spark, sf_dir, "orders")
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    w = Window.orderBy(
        status_null.asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )
    return (
        o.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            status_null.alias("status_or_null"),
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
    )


@register(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    ORDER BY l_extendedprice * (1 - l_discount) DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def topk_global(spark, sf_dir):
    """Global top-100 by net price. orderBy+limit plans as
    TakeOrderedAndProject: each partition keeps a 100-row heap and only those
    candidates reach the driver — the top-k that works on 100 TB. Tiebreak
    keys make the boundary row deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.orderBy(net.desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(100)
        .select("l_orderkey", "l_linenumber", F.round(net, 4).alias("net_price"))
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
)
def limit_offset(spark, sf_dir):
    """Pagination slice rows 101–150 under a total order (Spark ≥3.4 offset).
    Note: OFFSET pagination at scale still computes the prefix — keyset
    pagination (WHERE key > last_seen) is the 100 TB idiom; this op exists
    for SQL-surface parity."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )
