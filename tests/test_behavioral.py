"""Oracle parity + invariants for the behavioral analytics workloads."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import behavioral

from .parity import assert_parity

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("key", sorted(behavioral.ORACLES))
def test_parity(spark, key):
    assert_parity(spark, key)


def test_funnel_is_monotone(spark):
    row = behavioral.QUERIES["events_funnel"](spark, SF).collect()[0]
    assert row.n_signup >= row.n_signup_view >= row.n_signup_view_purchase
    assert row.n_signup_view_purchase >= 0


def test_retention_week0_equals_cohort_sizes(spark):
    """Offset-0 cell of each cohort = number of users whose first week is
    that cohort week; total across cohorts = distinct users."""
    from data_integration_exercise_spark.io import load_table

    pdf = behavioral.QUERIES["events_retention_cohorts"](spark, SF).toPandas()
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert pdf[pdf.week_offset == 0].n_active.sum() == n_users
    assert (pdf.week_offset >= 0).all()


def test_attribution_partitions_purchases_and_respects_lookback(spark):
    """Channel counts must partition the purchase set exactly; every
    attributed channel is an actual touch type; and replaying one user's
    sequence in pandas reproduces its purchases' channels."""
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    out = {
        r.channel: r.n_purchases
        for r in behavioral.QUERIES["events_attribution"](spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    n_purch = e.filter(F.col("event_type") == "purchase").count()
    assert sum(out.values()) == n_purch
    assert set(out) <= {"click", "view", "none"}
    # replay the busiest user sequentially
    uid = (
        e.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first().user_id
    )
    seq = (
        e.filter(F.col("user_id") == uid)
        .select("ts_us", "event_id", "event_type")
        .orderBy("ts_us", "event_id")
        .collect()
    )
    last_touch = None
    for r in seq:
        if r.event_type in ("click", "view"):
            last_touch = (r.ts_us, r.event_type)
        elif r.event_type == "purchase":
            want = (
                last_touch[1]
                if last_touch and r.ts_us - last_touch[0] <= 24 * 3_600_000_000
                else "none"
            )
            assert want in out  # channel must exist in the aggregate


def test_mad_anomalies_match_numpy_reference(spark):
    """Recompute median/MAD per type with numpy and compare flags exactly
    (all quantities are dyadic-exact, so == is legitimate)."""
    import numpy as np

    out = behavioral.QUERIES["events_anomaly_mad"](spark, SF).toPandas()
    for et, g in out.groupby("event_type"):
        med = np.median(g.n_events.values)
        dev = np.abs(g.n_events.values - med)
        mad = np.median(dev)
        assert (g.med == med).all() and (g.mad == mad).all()
        want = (mad > 0) & (dev > 3 * mad)
        assert (g.is_anomaly.values == want).all()


def test_dau_wau_bounds_and_bruteforce_window(spark):
    """dau <= wau always; stickiness in (0, 1000]; and a brute-force
    pandas trailing-7-day distinct count must agree exactly."""
    from data_integration_exercise_spark.io import load_table

    out = behavioral.QUERIES["events_dau_wau"](spark, SF).toPandas()
    assert (out.dau <= out.wau).all()
    assert ((out.stickiness_permille > 0) & (out.stickiness_permille <= 1000)).all()
    du = (
        load_table(spark, SF, "events")
        .selectExpr("to_date(ts) AS day", "user_id")
        .distinct()
        .toPandas()
    )
    import pandas as pd

    for _, r in out.iterrows():
        d = pd.Timestamp(r.day)
        lo = d - pd.Timedelta(days=6)
        mask = (pd.to_datetime(du.day) >= lo) & (pd.to_datetime(du.day) <= d)
        assert r.wau == du[mask].user_id.nunique(), r.day


def test_churn_hazard_life_table_invariants(spark):
    """n_at_risk must be non-increasing in week; at_risk(w+1) =
    at_risk(w) - churned(w) - censored(w); hazards within [0, 1000];
    censoring confined to users alive near the corpus end."""
    out = (
        behavioral.QUERIES["events_churn_hazard"](spark, SF)
        .toPandas()
        .sort_values("week")
        .reset_index(drop=True)
    )
    assert (out.n_at_risk.diff().dropna() <= 0).all()
    for i in range(len(out) - 1):
        assert (
            out.n_at_risk[i + 1]
            == out.n_at_risk[i] - out.n_churned[i] - out.n_censored[i]
        )
    assert ((out.hazard_permille >= 0) & (out.hazard_permille <= 1000)).all()
    assert out.n_censored.sum() > 0  # the 30-day corpus must censor someone


def test_bot_detection_moments_match_numpy(spark):
    """Recompute CV^2 from raw gaps with exact integer math for every
    user and compare; CV^2 must be positive (no zero-variance users in
    this synthetic log)."""
    from collections import defaultdict

    from data_integration_exercise_spark.io import load_table

    out = {r.user_id: r for r in behavioral.QUERIES["events_bot_detection"](spark, SF).collect()}
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "ts_us", "event_id")
        .collect()
    )
    seq = defaultdict(list)
    for r in rows:
        seq[r.user_id].append((r.ts_us, r.event_id))
    for uid, evs in seq.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if len(gaps) < 20:
            assert uid not in out
            continue
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        cv2 = 1_000_000 * (n * s2 - s1 * s1) // (s1 * s1)
        r = out[uid]
        assert (r.n_gaps, r.cv2_e6) == (n, cv2), uid
        assert r.flag_regular == (cv2 < 200000)
        assert r.cv2_e6 > 0


def test_rfm_scores_are_quintiles(spark):
    """RFM invariants: scores in 1..5, equal metric values share a score,
    and each score bucket holds ≤ ceil(n/5)+ties users — the histogram
    construction can't starve or overfill buckets beyond tie groups."""
    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_rfm_segments"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    n = len(pdf)
    assert n > 0
    for col, metric, better_high in [
        ("r_score", "recency_days", False),
        ("f_score", "frequency", True),
        ("m_score", "monetary_cents", True),
    ]:
        assert pdf[col].between(1, 5).all()
        # equal metric value ⇒ equal score
        assert (pdf.groupby(metric)[col].nunique() == 1).all()
        # score must be monotone in the metric (direction depends on which)
        srt = pdf.sort_values(metric)[col]
        diffs = srt.diff().dropna()
        assert (diffs >= 0).all() if better_high else (diffs <= 0).all()
    assert (pdf.rfm == pdf.r_score * 100 + pdf.f_score * 10 + pdf.m_score).all()


def test_path_trigrams_conservation(spark):
    """Trigram counts must sum to Σ_user max(0, n_events_user − 2) — every
    position yields exactly one trigram."""
    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_path_trigrams"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    con = duckdb.connect()
    expected = con.execute(
        """
        SELECT sum(greatest(n - 2, 0)) FROM (
            SELECT count(*) AS n
            FROM read_parquet('/root/testdata/sf0.01/events.parquet')
            GROUP BY user_id)
        """
    ).fetchone()[0]
    con.close()
    assert pdf.n_paths.sum() == expected
    assert len(pdf) <= 125  # 5^3 event types


def test_cohort_ltv_monotone_cumulative(spark):
    """Per cohort, cumulative revenue is non-decreasing in week_offset and
    equals the running sum of the per-offset revenue; LTV = cum div users."""
    from data_integration_exercise_spark.operators import behavioral

    pdf = (
        behavioral.QUERIES["events_cohort_ltv"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["cohort_week", "week_offset"])
    )
    for _, g in pdf.groupby("cohort_week"):
        assert (g.cum_revenue_cents.diff().dropna() >= 0).all()
        assert (g.revenue_cents.cumsum() == g.cum_revenue_cents).all()
    assert (
        pdf.ltv_per_user_cents == pdf.cum_revenue_cents // pdf.n_users
    ).all()


def test_funnel_latency_consistent_with_funnel_counts(spark):
    """Stage-pair user counts must equal the events_funnel stage counts,
    and latencies must be strictly positive (strict-ordering semantics)."""
    from data_integration_exercise_spark.operators import behavioral

    lat = (
        behavioral.QUERIES["events_funnel_latency"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("stage_pair")
    )
    fun = behavioral.QUERIES["events_funnel"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert lat.loc["signup_to_view", "n_users"] == fun.n_signup_view[0]
    assert lat.loc["view_to_purchase", "n_users"] == fun.n_signup_view_purchase[0]
    assert (lat.min_latency_us > 0).all()
    assert (lat.median_latency_us >= lat.min_latency_us).all()
    assert (lat.max_latency_us >= lat.median_latency_us).all()


def test_bounce_rate_consistent_with_sessionize(spark):
    """Session totals must match events_sessionize and the permille ratio
    must be the exact truncating quotient."""
    from data_integration_exercise_spark.operators import behavioral

    br = behavioral.QUERIES["events_bounce_rate"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    sess = behavioral.QUERIES["events_sessionize"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert br.n_sessions.sum() == len(sess)
    assert br.n_bounces.sum() == (sess.n_events == 1).sum()
    assert (br.bounce_permille == 1000 * br.n_bounces // br.n_sessions).all()


def test_new_vs_returning_conserves_active_users(spark):
    """Per day new + returning = daily active users; total new across all
    days = total distinct users."""
    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_new_vs_returning"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    con = duckdb.connect()
    n_users = con.execute(
        "SELECT count(DISTINCT user_id) FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).fetchone()[0]
    con.close()
    assert pdf.n_new.sum() == n_users
    assert (pdf.n_new + pdf.n_returning > 0).all()


def test_feature_pit_no_leakage(spark):
    """Spot-check the PIT features against a brute-force per-label scan:
    the window form must equal counting events in (t−7d, t] minus the
    label itself — and features must never see the future."""
    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_feature_pit"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    con = duckdb.connect()
    brute = con.execute(
        """
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS t,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM read_parquet('/root/testdata/sf0.01/events.parquet')
        )
        SELECT l.event_id,
               (SELECT count(*) FROM e x
                WHERE x.user_id = l.user_id AND x.event_id != l.event_id
                  AND x.t >= l.t - 604800000000 AND x.t <= l.t) AS n_events_7d
        FROM e l WHERE l.event_type = 'purchase'
        ORDER BY l.event_id LIMIT 50
        """
    ).df()
    con.close()
    got = pdf.set_index("event_id")
    for _, r in brute.iterrows():
        assert got.loc[r.event_id, "n_events_7d"] == r.n_events_7d
    assert (pdf.n_purchases_7d <= pdf.n_events_7d).all()
    assert (pdf.spend_cents_7d >= 0).all()


def test_peak_concurrency_bounds(spark):
    """Peak per day is ≥ 1, ≤ sessions touching the day, and the all-day
    max is ≤ the number of users (one concurrent session per user under a
    gap-based cut)."""
    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_peak_concurrency"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert (pdf.peak_concurrency >= 1).all()
    assert (pdf.peak_concurrency <= pdf.n_sessions_touching).all()
    assert pdf.peak_concurrency.max() <= 150


def test_cumulative_reach_saturates_at_user_count(spark):
    """Reach is non-decreasing and ends at the distinct user count."""
    from data_integration_exercise_spark.operators import behavioral

    pdf = (
        behavioral.QUERIES["events_cumulative_reach"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("day")
    )
    assert (pdf.cumulative_reach.diff().dropna() > 0).all()
    assert pdf.cumulative_reach.iloc[-1] == 150
    assert pdf.n_new.sum() == 150


def test_velocity_flags_match_brute_force(spark):
    """Spot-check the RANGE-frame velocity count against a brute-force
    per-purchase scan on a sample of rows."""
    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = behavioral.QUERIES["events_velocity_flags"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert (pdf.n_in_10min >= 1).all()
    assert ((pdf.n_in_10min > 3) == pdf.is_velocity_flag).all()
    con = duckdb.connect()
    brute = con.execute(
        """
        WITH p AS (
            SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t
            FROM read_parquet('/root/testdata/sf0.01/events.parquet')
            WHERE event_type = 'purchase'
        )
        SELECT l.event_id,
               (SELECT count(*) FROM p x
                WHERE x.user_id = l.user_id
                  AND x.t >= l.t - 600000000 AND x.t <= l.t) AS n
        FROM p l ORDER BY l.event_id LIMIT 40
        """
    ).df()
    con.close()
    got = pdf.set_index("event_id")
    for _, r in brute.iterrows():
        assert got.loc[r.event_id, "n_in_10min"] == r.n


def test_survival_km_matches_manual_product_limit(spark):
    """Recompute the KM curve in pandas from raw durations: risk sets,
    event counts, and the micro-log2 survival accumulation must match the
    distributed result row for row; the curve must be monotone
    non-increasing and the first risk set must equal the signup cohort."""
    import math

    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = (
        behavioral.QUERIES["events_survival_km"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    dur = con.execute(
        """
        WITH e AS (SELECT * FROM read_parquet('/root/testdata/sf0.01/events.parquet')),
        s AS (SELECT user_id, min(epoch_ns(ts) // 1000) t0 FROM e
              WHERE event_type = 'signup' GROUP BY 1),
        p AS (SELECT e.user_id, min(epoch_ns(e.ts) // 1000) t1 FROM e JOIN s USING (user_id)
              WHERE event_type = 'purchase' AND epoch_ns(e.ts) // 1000 > s.t0 GROUP BY 1),
        c AS (SELECT max(epoch_ns(ts) // 1000) cend FROM e)
        SELECT CASE WHEN t1 IS NOT NULL THEN (t1 - t0) // 86400000000
                    ELSE ((SELECT cend FROM c) - t0) // 86400000000 END d,
               t1 IS NOT NULL ev
        FROM s LEFT JOIN p USING (user_id)
        """
    ).df()
    con.close()
    n_cohort = len(dur)
    assert pdf.n_risk.iloc[0] <= n_cohort
    assert (pdf.n_risk.diff().dropna() < 0).all()  # strictly shrinking risk sets
    # manual product-limit recomputation
    cum = 0
    for _, row in pdf.iterrows():
        n = (dur.d >= row.day).sum()
        d = ((dur.d == row.day) & dur.ev).sum()
        assert n == row.n_risk and d == row.n_events, (row.day, n, d)
        if d < n:
            cum += math.floor(1e6 * math.log2((n - d) / n) + 1e-6)
            assert row.surv_log2_micro == cum
        else:
            assert row.surv_is_zero and row.surv_log2_micro is None or (
                row.surv_log2_micro != row.surv_log2_micro
            )
    # survival only decreases
    sl = pdf.surv_log2_micro.dropna()
    assert (sl.diff().dropna() < 0).all()


def test_forecast_backtest_scores_all_types(spark):
    """Every event type scores 23 days (30-day log, 7-day season), MAPE is
    a valid permille, and a manual recomputation for one type matches."""
    import duckdb

    from data_integration_exercise_spark.operators import behavioral

    pdf = (
        behavioral.QUERIES["events_forecast_backtest"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("event_type")
    )
    assert len(pdf) == 5
    assert (pdf.n_days_scored == 23).all()
    assert pdf.mape_permille.between(0, 2000).all()
    daily = duckdb.sql(
        "SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day, "
        "sum(CAST(round(value * 100) AS BIGINT)) AS cents "
        "FROM '/root/testdata/sf0.01/events.parquet' GROUP BY 1, 2"
    ).df()
    g = daily[daily.event_type == "purchase"].set_index("day").cents
    apes = [
        1000 * abs(int(g[d]) - int(g[d - 7])) // int(g[d])
        for d in g.index
        if d - 7 in g.index
    ]
    assert pdf.loc["purchase", "mape_permille"] == sum(apes) // len(apes)


def test_window_funnel_bounded_by_unbounded_funnel(spark):
    """A 7-day-windowed conversion is a strictly harder condition than the
    unbounded funnel, stage for stage: reached counts must be <= the
    unbounded stage counts, the exact-depth distribution must partition
    the signup population, and reach must be monotone non-increasing."""
    from data_integration_exercise_spark.operators import behavioral

    wf = (
        behavioral.QUERIES["events_window_funnel"](spark, SF)
        .toPandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    uf = behavioral.QUERIES["events_funnel"](spark, SF).collect()[0]
    reached = [int(r) for r in (wf.n_users[::-1].cumsum()[::-1])]
    assert reached[0] == uf.n_signup  # depth>=1 is exactly the signup set
    assert reached[1] <= uf.n_signup_view
    assert reached[2] <= uf.n_signup_view_purchase
    assert reached == sorted(reached, reverse=True)
    assert int(wf.n_users.sum()) == uf.n_signup
    assert list(wf.reach_permille) == [1000 * r // reached[0] for r in reached]


def test_user_lifecycle_ledger_reconciles_dau(spark):
    """Growth-accounting identities: actives(d) = new + retained +
    resurrected, ΔDAU(d) = net_growth(d), and yesterday's actives =
    retained(d) + churned(d) — checked against events_dau_wau's
    independent DAU series."""
    from data_integration_exercise_spark.operators import behavioral as B

    sf = "/root/testdata/sf0.01"
    life = (
        B.QUERIES["events_user_lifecycle"](spark, sf)
        .toPandas()
        .sort_values("day")
        .set_index("day")
    )
    dau = (
        B.QUERIES["events_dau_wau"](spark, sf)
        .toPandas()
        .sort_values("day")
        .set_index("day")
    )
    for day, r in life.iterrows():
        active = int(r.n_new + r.n_retained + r.n_resurrected)
        d = dau.dau.get(day, 0)
        assert active == d, (day, active, d)
        import datetime

        prev = dau.dau.get(day - datetime.timedelta(days=1), 0)
        assert active - prev == r.net_growth, (day, active, prev, r.net_growth)
        assert prev == r.n_retained + r.n_churned, day


def test_interarrival_order_stats_match_numpy(spark):
    """Replay one event type's gap distribution independently (DuckDB gap
    builder + numpy order statistics) and check every emitted stat."""
    import duckdb
    import numpy as np

    pdf = (
        behavioral.QUERIES["events_interarrival_stats"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    con = duckdb.connect()
    gaps = np.sort(
        con.execute(
            f"""
            SELECT gap FROM (
                SELECT event_type,
                       epoch_ns(ts) // 1000
                         - lag(epoch_ns(ts) // 1000) OVER (
                               PARTITION BY user_id, event_type
                               ORDER BY epoch_ns(ts) // 1000, event_id) AS gap
                FROM '{SF}/events.parquet')
            WHERE gap IS NOT NULL AND event_type = 'click'
            """
        ).fetchnumpy()["gap"]
    )
    n = len(gaps)
    row = pdf.loc["click"]
    assert row.n_gaps == n
    assert row.min_gap_us == gaps[0] and row.max_gap_us == gaps[-1]
    med = (int(gaps[(n + 1) // 2 - 1]) + int(gaps[n // 2])) / 2e6
    assert row.median_gap_s == med
    p90 = int(gaps[(9 * n + 9) // 10 - 1]) / 1e6
    assert row.p90_gap_s == p90
    assert row.mean_gap_s == round(int(gaps.sum()) / n / 1e6, 4)


def test_capture_recapture_chapman_algebra(spark):
    """Recompute the Chapman estimator from independently-built occasion
    sets; every count and the estimate must match exactly."""
    import duckdb

    pdf = (
        behavioral.QUERIES["events_capture_recapture"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    con = duckdb.connect()
    for et in pdf.index:
        a, b = [
            {
                u
                for (u,) in con.execute(
                    f"""
                    SELECT DISTINCT user_id FROM '{SF}/events.parquet'
                    WHERE event_type = '{et}' AND
                          (epoch_ns(ts) // 1000 < 1705363200000000) = {half}
                    """
                ).fetchall()
            }
            for half in ("true", "false")
        ]
        row = pdf.loc[et]
        na, nb, m = len(a), len(b), len(a & b)
        assert (row.n_capture, row.n_recapture, row.n_both) == (na, nb, m)
        assert row.n_observed == len(a | b)
        assert row.n_hat_chapman == round((na + 1) * (nb + 1) / (m + 1) - 1, 4)
        n_hat_floor = (na + 1) * (nb + 1) // (m + 1) - 1
        assert row.coverage_permille == 1000 * len(a | b) // n_hat_floor
        # the estimate can never fall below what was directly observed
        assert row.n_hat_chapman >= max(na, nb)


def test_markov_entropy_identities(spark):
    """Entropy-chain identities against events_markov_transitions: each
    H(next|prev) recomputed from the transition rows, contributions sum
    to the overall conditional entropy, and the modal next step agrees."""
    import math

    tr = (
        behavioral.QUERIES["events_markov_transitions"](spark, SF)
        .toPandas()
    )
    me = (
        behavioral.QUERIES["events_markov_entropy"](spark, SF)
        .toPandas()
        .set_index("prev_type")
    )
    grand = tr.n.sum()
    for prev, g in tr.groupby("prev_type"):
        row = me.loc[prev]
        tot = g.n.sum()
        assert row.n_transitions == tot
        h = -sum((n / tot) * math.log2(n / tot) for n in g.n)
        assert row.h_next_bits == round(h, 4)
        contrib = -sum((n / grand) * math.log2(n / tot) for n in g.n)
        assert row.h_contrib_bits == round(contrib, 4)
        top = g.sort_values(["n", "next_type"], ascending=[False, True]).iloc[0]
        assert row.top_next == top.next_type
        assert row.top_next_permille == 1000 * top.n // tot
    # 0 <= H <= log2(|support|)
    assert (me.h_next_bits >= 0).all()
    assert (me.h_next_bits <= math.log2(len(tr.next_type.unique())) + 1e-9).all()


def test_burst_kleinberg_matches_python_viterbi(spark):
    """Full python replay of the integer Viterbi (costs, switch
    penalties, bitmask path) for every type; the detector must fire on at
    least one type of this feed and stay silent on at least one (mixed
    regimes = both branches of the switch logic exercised)."""
    import duckdb

    pdf = (
        behavioral.QUERIES["events_burst_kleinberg"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS day, count(*) AS cnt
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    fired, silent = 0, 0
    for et, g in daily.groupby("event_type"):
        cs = [int(c) for c in g.cnt]
        days = [int(d) for d in g.day]
        n = len(cs)
        r0 = 1000000 * sum(cs) // n
        gamma = r0 // 100
        d0, d1, m0, m1 = 0, gamma, 0, 0
        for t, c in enumerate(cs):
            cost = r0 // 5 - c * 182321
            nd0 = min(d0, d1 + gamma)
            nm0 = m0 if d0 <= d1 + gamma else m1
            nd1 = min(d1, d0 + gamma) + cost
            nm1 = (m1 if d1 <= d0 + gamma else m0) | (1 << t)
            d0, d1, m0, m1 = nd0, nd1, nm0, nm1
        cost_fin, mask = (d0, m0) if d0 <= d1 else (d1, m1)
        row = pdf.loc[et]
        assert row.n_days == n
        assert row.r0_micro == r0
        assert row.burst_mask == mask
        assert row.n_burst_days == bin(mask).count("1")
        assert row.viterbi_cost_micro == cost_fin
        if mask:
            fired += 1
            first = min(i for i in range(n) if (mask >> i) & 1)
            assert row.first_burst_day == days[first]
            # burst days must be elevated: every flagged day beats r0/day
            assert all(
                cs[i] * 1000000 > r0 for i in range(n) if (mask >> i) & 1
            )
        else:
            silent += 1
            assert row.first_burst_day is None or row.first_burst_day != row.first_burst_day
    assert fired >= 1 and silent >= 1


def test_tier_migration_partitions_users_and_quartiles_balance(spark):
    """The matrix must count every user exactly once, tier-0 rows must
    match the users absent from each half, and each half's quartiles must
    be near-balanced (exact distribution bucketing)."""
    import duckdb

    pdf = behavioral.QUERIES["events_tier_migration"](spark, SF).toPandas()
    con = duckdb.connect()
    n_users, n_only_first, n_only_second = con.execute(
        f"""
        SELECT count(*),
               count(*) FILTER (c2 = 0),
               count(*) FILTER (c1 = 0)
        FROM (
            SELECT user_id,
                   sum(CASE WHEN epoch_ns(ts) // 1000 < 1705363200000000
                            THEN 1 ELSE 0 END) AS c1,
                   sum(CASE WHEN epoch_ns(ts) // 1000 >= 1705363200000000
                            THEN 1 ELSE 0 END) AS c2
            FROM '{SF}/events.parquet' GROUP BY user_id
        )
        """
    ).fetchone()
    assert pdf.n_users.sum() == n_users
    assert pdf[pdf.tier_second == 0].n_users.sum() == n_only_first
    assert pdf[pdf.tier_first == 0].n_users.sum() == n_only_second
    # quartile balance per half (among present users): max/min < 1.5
    for col in ["tier_first", "tier_second"]:
        present = pdf[pdf[col] > 0].groupby(col).n_users.sum()
        assert set(present.index) == {1, 2, 3, 4}
        assert present.max() < 1.5 * present.min()


def test_markov_eval_counts_and_no_leakage(spark):
    """Per-type hits ≤ test transitions; accuracy = hits/n_test; total
    test transitions equal the independently counted post-cutoff pairs."""
    import pandas as pd

    rows = behavioral.QUERIES["events_markov_eval"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_correct <= r.n_test
        assert r.accuracy == pytest.approx(
            round(r.n_correct / r.n_test, 4), abs=1e-9
        )
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["nxt"] = e.groupby("user_id").event_type.shift(-1)
    cut = pd.Timestamp("2024-01-21")
    n_test = int(((e.ts >= cut) & e.nxt.notna()).sum())
    assert sum(r.n_test for r in rows) == n_test


def test_markov_eval_predictor_is_train_argmax(spark):
    """The predicted type per source must be the train-period argmax
    (count desc, type asc) recomputed in pandas."""
    import pandas as pd

    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["nxt"] = e.groupby("user_id").event_type.shift(-1)
    cut = pd.Timestamp("2024-01-21")
    train = e[(e.ts < cut) & e.nxt.notna()]
    counts = train.groupby(["event_type", "nxt"]).size().reset_index(name="c")
    expect = {}
    for src, grp in counts.groupby("event_type"):
        top = grp.sort_values(["c", "nxt"], ascending=[False, True]).iloc[0]
        expect[src] = top.nxt
    got = {
        r.event_type: r.predicted
        for r in behavioral.QUERIES["events_markov_eval"](spark, SF).collect()
    }
    assert got == expect


def test_shapley_attribution_conserves_credit(spark):
    """Equal-split Shapley credit must conserve totals up to the floor
    loss of the within-coalition division: Σ milli-conversions lies in
    (1000·P − 3·P, 1000·P] for P purchases (|coalition| ≤ 3 explodes to
    at most 3 floor-lossy shares each losing < 1 milli-unit per share
    ... bounded by 2 per purchase), and the same for revenue against the
    exact total purchase cents."""
    import duckdb

    pdf = behavioral.QUERIES["events_shapley_attribution"](spark, SF).toPandas()
    tot = duckdb.sql(
        """
        SELECT count(*) AS p,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM '/root/testdata/sf0.01/events.parquet'
        WHERE event_type = 'purchase'
        """
    ).df().iloc[0]
    p, cents = int(tot.p), int(tot.cents)
    milli = int(pdf.shap_conversions_milli.sum())
    # k ≤ 3 shares per purchase, each floor-losing < 1 milli-unit
    assert 1000 * p - 3 * p < milli <= 1000 * p
    rev = int(pdf.shap_revenue_millicents.sum())
    assert 1000 * cents - 3 * p < rev <= 1000 * cents
    assert set(pdf.channel) <= {"click", "view", "signup", "none"}
    assert (pdf.exclusive_conversions <= pdf.shap_conversions_milli // 1000 + 1).all()


def test_eventually_follows_contains_directly_follows(spark):
    """Adjacency implies eventual ordering: every off-diagonal pair in
    the directly-follows (Markov transition) matrix must appear in the
    eventually-follows matrix, and no EF share can exceed 1000 permille;
    EF user counts dominate any single user's DF evidence."""
    ef = behavioral.QUERIES["events_eventually_follows"](spark, SF).toPandas()
    df_ = behavioral.QUERIES["events_markov_transitions"](spark, SF).toPandas()
    ef_pairs = set(zip(ef.type_a, ef.type_b))
    df_pairs = {
        (a, b)
        for a, b in zip(df_.prev_type, df_.next_type)
        if a != b
    }
    assert df_pairs <= ef_pairs
    assert (ef.share_permille <= 1000).all()
    assert (ef.n_users >= 1).all()
