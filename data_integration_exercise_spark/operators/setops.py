"""Set operations & deduplication (SURVEY.md §2.7).

Reference parity: multi-source integration (concat + drop_duplicates in the
pandas exercise) re-expressed as UNION ALL/UNION/INTERSECT/EXCEPT with
Spark's set operators, and deterministic dedup via windowed keep-rules
(bare dropDuplicates keeps an *arbitrary* row under parallelism — banned by
SURVEY §5.6; the window states which row survives).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'pre98' AS slice
    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'post98' AS slice
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_union_all(spark, sf_dir):
    """UNION ALL of two disjoint year slices reassembling the table —
    unionByName so column order can never silently misalign (the classic
    positional-union integration bug)."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    pre = o.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_totalprice", F.lit("pre98").alias("slice")
    )
    post = o.filter(F.col("o_orderdate") >= cut).select(
        "o_orderkey", "o_totalprice", F.lit("post98").alias("slice")
    )
    return pre.unionByName(post)


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE o_orderkey < 10000
    UNION
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE o_orderkey >= 5000
    """,
)
def set_union_distinct(spark, sf_dir):
    """UNION with dedup across two *overlapping* key slices — the overlap
    [5000,10000) collapses; result is exactly one row per order."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 10000).select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_orderkey") >= 5000).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_intersect(spark, sf_dir):
    """Customers active in both 1996 and 1997 (INTERSECT = distinct keys in
    both sides; Catalyst plans it as a left-semi join after aggregate)."""
    o = load_table(spark, sf_dir, "orders")

    def year(y):
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp_ntz"))
        ).select("o_custkey")

    return year(1996).intersect(year(1997))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT ALL (multiset difference): each 1996 order occurrence of a
    custkey minus its 1997 occurrences — exercises exceptAll's bag semantics
    vs plain EXCEPT's distinct semantics (which is just .distinct() on top)."""
    o = load_table(spark, sf_dir, "orders")

    def year(y):
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp_ntz"))
        ).select("o_custkey")

    return year(1996).exceptAll(year(1997))


@register(
    "dedup_exact_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC) = 1
    """,
)
def dedup_exact_rows(spark, sf_dir):
    """Deterministic subset-column dedup: one lineitem per order, keeping the
    min (l_linenumber, l_partkey, l_suppkey) row — measured: l_linenumber is
    NOT unique within an order in this data, so the keep-rule orders by the
    full unique key. A windowed keep-rule, NOT dropDuplicates(["l_orderkey"])
    — that keeps whichever row a partition happens to produce first and is
    irreproducible across runs/cluster layouts."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc(), F.col("l_partkey").asc(), F.col("l_suppkey").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )
