"""Property tier (SURVEY.md §5.5): invariants cross-checking operator
semantics against brute-force recomputation on small scale factors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_integration_exercise_spark.io import load_table
from data_integration_exercise_spark.operators import (
    aggregates,
    joins,
    pipeline,
    setops,
    text,
    windows,
)

SF_SMALL = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def test_rollup_grand_total_matches_global(spark):
    """ROLLUP's () row must equal the ungrouped aggregate."""
    rows = aggregates.QUERIES["agg_rollup"](spark, SF).collect()
    grand = [r for r in rows if r.g_r == 1 and r.g_n == 1]
    assert len(grand) == 1
    n_cust = load_table(spark, SF, "customer").count()
    assert grand[0].n_cust == n_cust


def test_dedup_is_idempotent(spark):
    """Applying the dedup keep-rule to its own output changes nothing."""
    first = dedup = setops.QUERIES["dedup_exact_rows"](spark, SF)
    once = first.collect()
    again = (
        dedup.groupBy("l_orderkey").count().filter(F.col("count") > 1).count()
    )
    assert again == 0
    assert len(once) == len({r.l_orderkey for r in once})


def test_theta_range_no_missed_pairs(spark):
    """Banded 60s join at sf0.001 equals the brute-force O(n²) pair set."""
    got = {
        (r.id1, r.id2)
        for r in joins.QUERIES["join_theta_range"](spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts_us"
    ).collect()
    brute = set()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        for a in rows:
            for b in rows:
                if a.event_id < b.event_id and abs(b.ts_us - a.ts_us) <= 60_000_000:
                    brute.add((a.event_id, b.event_id))
    assert got == brute


def test_asof_matches_bruteforce(spark):
    """Union+window as-of equals per-purchase brute-force argmax at sf0.001."""
    got = {
        r.purchase_id: r.click_id
        for r in joins.QUERIES["join_asof"](spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts_us", "event_type"
    ).collect()
    clicks = [r for r in ev if r.event_type == "click"]
    for p in [r for r in ev if r.event_type == "purchase"]:
        cands = [
            c for c in clicks if c.user_id == p.user_id and c.ts_us <= p.ts_us
        ]
        best = max(cands, key=lambda c: (c.ts_us, c.event_id), default=None)
        assert got[p.event_id] == (best.event_id if best else None)


def test_running_sum_final_equals_group_total(spark):
    """Last cumulative value per customer == that customer's total spend."""
    cum = windows.QUERIES["win_running_sum"](spark, SF).toPandas()
    last = cum.sort_values(["o_custkey", "cum_spend"]).groupby("o_custkey").last()
    o = load_table(spark, SF, "orders").toPandas()
    totals = o.groupby("o_custkey").o_totalprice.sum().round(4)
    for k, v in last.cum_spend.items():
        assert abs(v - totals[k]) < 1e-6


def test_minhash_pairs_all_clear_threshold(spark):
    """Every MinHash-reported pair truly has token-set Jaccard >= 0.8."""
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in load_table(spark, SF, "documents").collect()
    }
    pairs = pipeline.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    assert pairs
    for r in pairs:
        s1, s2 = docs[r.doc1], docs[r.doc2]
        jac = len(s1 & s2) / len(s1 | s2)
        assert jac >= 0.8


def test_near_jaccard_subset_of_minhash_or_banding_miss(spark):
    """Exact same-lang Jaccard pairs missed by MinHash must be banding
    misses, not systematic: miss rate < 5%."""
    exact = {
        (r.doc1, r.doc2)
        for r in text.QUERIES["dedup_near_jaccard"](spark, SF).collect()
    }
    mh = {
        (r.doc1, r.doc2)
        for r in pipeline.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    }
    assert len(exact - mh) / len(exact) < 0.05


def test_session_window_boundary_semantics(spark):
    """Pin Spark's session gap rule on hand-built frames: an event at
    exactly last_ts + gap MERGES into the session; one µs past it starts a
    new one — the rule the stream_session oracle encodes as diff > gap."""

    def n_sessions(second_ts: str) -> int:
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (1, second_ts)], "user_id int, ts_s string"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        return len(
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count()
            .collect()
        )

    assert n_sessions("2024-01-01 00:30:00") == 1  # exact boundary merges
    assert n_sessions("2024-01-01 00:30:00.000001") == 2  # past it splits
