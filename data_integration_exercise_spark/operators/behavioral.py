"""Behavioral / product-analytics workloads over the events log.

Funnel conversion and cohort retention are the two queries every
event-log consumer runs; both reduce to keyed min-aggregations and integer
week arithmetic, so they are hash-verifiable and scale as a handful of
shuffles on user_id.

Time discipline: all arithmetic on epoch-µs BIGINTs (``ts_us`` from
io.load_table; ``epoch_ns(ts) // 1000`` in oracles) — the events parquet
carries sub-µs nanoseconds that float math would corrupt.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry_util import new_registry

QUERIES, ORACLES, register = new_registry()

_WEEK_US = 7 * 86_400 * 1_000_000


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, min(epoch_ns(ts) // 1000) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
        SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t1
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'view' AND epoch_ns(e.ts) // 1000 > s.t0
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) // 1000 > v.t1
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_signup_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_signup_view_purchase
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel conversion signup → view → purchase: each stage keeps
    users whose earliest qualifying event strictly follows their previous
    stage's timestamp (min-aggregation per stage, semi-join to the prior
    stage — never a per-user sequence scan). Three user-keyed shuffles
    total; the stage frontier shrinks monotonically, so at 100 TB each
    successive join is smaller than the last."""
    e = load_table(spark, sf_dir, "events")

    def stage(event_type, prior, prior_t, t_name):
        cand = e.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts_us")
        )
        if prior is None:
            out = cand.groupBy("user_id").agg(F.min("ts_us").alias(t_name))
            return out
        return (
            cand.join(prior, "user_id")
            .filter(F.col("ts_us") > F.col(prior_t))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias(t_name))
        )

    s = stage("signup", None, None, "t0")
    v = stage("view", s, "t0", "t1")
    p = stage("purchase", v, "t1", "t2")
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_signup_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_signup_view_purchase")))
    )


@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH firstw AS (
        SELECT user_id,
               min(epoch_ns(ts) // 1000) // {_WEEK_US} AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // {_WEEK_US} AS week
        FROM events
    )
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity a JOIN firstw f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, a.week - f.cohort_week
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-active epoch-week,
    counted in every subsequent week they reappear (week_offset 0 is the
    cohort's own size). (user, week) activity is pre-distincted so the
    count is exact without count(distinct) in the final rollup; integer
    week ids come from epoch-µs floor-division, identical in both engines.
    Two user-keyed shuffles + one small rollup."""
    e = load_table(spark, sf_dir, "events")
    firstw = e.groupBy("user_id").agg(
        F.expr(f"min(ts_us) div {_WEEK_US}").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.expr(f"ts_us div {_WEEK_US}").alias("week")
    ).distinct()
    return (
        activity.join(firstw, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
