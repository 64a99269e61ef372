"""Aggregation operators (SURVEY.md §2.4).

Reference parity: the pandas exercise's ``groupby().agg`` summary analytics
(SURVEY.md §0/§3.1 — reference checkout empty, reconstructed surface),
re-expressed as Catalyst hash aggregates: partial (map-side combine) →
shuffle on group keys → final. At 100 TB the partial agg is what keeps the
shuffle proportional to |groups|, not |rows|.

Float-hash discipline (SURVEY.md §2 defensive rule): every float aggregate is
rounded to 4dp in BOTH the DataFrame query and the DuckDB oracle, with
identical aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()

# TPC-H Q1's pricing-summary date bound (within l_shipdate's 1995..2001 domain)
_Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """Flagship (TPC-H Q1 shape): pricing summary by returnflag/linestatus.

    Plan shape (verified via explain, SURVEY.md §3.3): FileScan with
    PushedFilters on l_shipdate + ReadSchema pruned to the 7 used columns →
    partial HashAggregate → Exchange(hash on 2 low-cardinality keys, 6
    groups) → final HashAggregate. Scales: shuffle carries 6 rows per map
    task regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(net), 4).alias("sum_disc_price"),
            F.round(F.sum(net * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
