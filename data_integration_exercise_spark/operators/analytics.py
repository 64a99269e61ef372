"""Composite analytic workloads — TPC-H shapes adapted to the operative
schema (SURVEY.md §1.2: no l_commitdate/l_receiptdate/o_shippriority etc.,
thresholds calibrated to the measured data domains).

These exercise the engine end-to-end the way a reference user's reporting
queries would: multi-table joins + selective filters + grouped aggregation +
top-k, each compiling to broadcast-dim joins over a single fact-shuffle
(verified plan shapes, §4). All hash-verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()

def _net():
    """Column arithmetic binds to the JVM, so build lazily (import-safe)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@register(
    "tpch_q3_unshipped",
    oracle="""
    SELECT o_orderkey,
           o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_unshipped(spark, sf_dir):
    """Q3 shape (shippriority column absent → dropped): top-10 highest-value
    orders booked before but shipped after the cutoff, BUILDING segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(o.o_orderdate < _ts("1996-07-01 00:00:00"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(li.l_shipdate > _ts("1996-07-01 00:00:00"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_net()), 4).alias("revenue"))
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
        )
        .limit(10)
    )


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark, sf_dir):
    """Q6: revenue-change forecast — a pure scan-filter-aggregate whose
    selective predicates must ALL reach PushedFilters (no join at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q10_returns",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returns(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in a quarter — the
    'who is hurting us' report; nation dim broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (o.o_orderdate >= _ts("1996-10-01 00:00:00"))
            & (o.o_orderdate < _ts("1997-01-01 00:00:00"))
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(li.l_returnflag == "R")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_net()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q14_promo",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo(spark, sf_dir):
    """Q14: promo revenue share for one month (p_type domain is single-word
    — 'PROMO' exact, measured). Part dim broadcast; conditional aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _net()).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_net()), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big      ON big.l_orderkey = orders.o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: large-volume orders (total qty > 300 — p99 is 262 in this data,
    so this is the true tail). The HAVING subquery runs first and semi-joins
    the fact — at scale this pre-aggregation is what keeps the 3-way join
    from materializing every order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("bk") == o.o_orderkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )
