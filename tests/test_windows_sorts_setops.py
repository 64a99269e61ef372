"""Oracle-parity tests for §2.5 windows, §2.6 sorts, §2.7 set ops."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import setops, sorts, windows

from .parity import assert_parity

ALL_KEYS = sorted(windows.ORACLES) + sorted(sorts.ORACLES) + sorted(setops.ORACLES)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_parity(spark, key):
    assert_parity(spark, key)


def test_union_all_reassembles(spark):
    """Property: union of disjoint slices has the full table's row count."""
    from data_integration_exercise_spark.io import load_table

    sf = "/root/testdata/sf0.01"
    assert (
        setops.QUERIES["set_union_all"](spark, sf).count()
        == load_table(spark, sf, "orders").count()
    )


def test_topk_is_sorted_prefix(spark):
    """Property: topk_global equals the first 100 rows of the full sort."""
    sf = "/root/testdata/sf0.01"
    rows = sorts.QUERIES["topk_global"](spark, sf).collect()
    assert len(rows) == 100
    nets = [r.net_price for r in rows]
    assert nets == sorted(nets, reverse=True)


def test_ewma_tracks_level_and_emits_complete_windows_only(spark):
    """EWMA must sit inside the min/max envelope of its own 7-day window
    inputs (it is a convex combination), and rows only appear from the 7th
    day of each priority's series onward."""
    from collections import defaultdict

    rows = windows.QUERIES["win_ewma"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.o_orderpriority, r.day)):
        series[r.o_orderpriority].append(r)
    daily = windows.QUERIES["win_ewma"](spark, "/root/testdata/sf0.01")
    for pri, rs in series.items():
        vals = [r.daily_cents / 100.0 for r in rs]
        for i, r in enumerate(rs):
            lo = min(vals[max(0, i - 6): i + 1])
            hi = max(vals[max(0, i - 6): i + 1])
            # envelope is approximate at series starts (lags reach back
            # before the first emitted row); allow the documented slack
            if i >= 6:
                assert lo - 1e-6 <= r.ewma <= hi + 1e-6, (pri, r)


def test_cusum_matches_sequential_recursion(spark):
    """The windowed closed form S_i = P_i - min(0, min_prefix P) must equal
    the literal sequential recursion S_i = max(0, S_{i-1} + x_i) replayed
    in pandas per priority, and every emitted value is >= 0."""
    out = (
        windows.QUERIES["win_cusum_drift"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(["o_orderpriority", "day"])
    )
    assert (out.cusum_cents >= 0).all()
    for pri, g in out.groupby("o_orderpriority"):
        target = int(g.daily_cents.sum()) // len(g)
        s = 0
        for cents, got in zip(g.daily_cents, g.cusum_cents):
            s = max(0, s + int(cents) - target)
            assert s == got, (pri, s, got)


def test_drawdown_matches_sequential_replay(spark):
    """Replay equity and running-max in pandas per priority and compare
    the max drawdown exactly."""
    out = {
        r.o_orderpriority: (r.max_drawdown_cents, r.equity_low_cents, r.equity_high_cents)
        for r in windows.QUERIES["win_drawdown"](spark, "/root/testdata/sf0.001").collect()
    }
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    daily = (
        o.groupBy(F.col("o_orderpriority").alias("pri"), F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .toPandas()
        .sort_values(["pri", "day"])
    )
    for pri, g in daily.groupby("pri"):
        eq, peak, mdd, lo, hi = 0, 0, 0, 10**18, -(10**18)
        for cents in g.cents:
            eq += int(cents) - 1_500_000
            peak = max(peak, eq)
            mdd = max(mdd, peak - eq)
            lo, hi = min(lo, eq), max(hi, eq)
        assert out[pri] == (mdd, lo, hi), pri


def test_hampel_filter_robustness(spark):
    """Hampel invariants: rolling median lies within the window's value
    range, MAD ≥ 0, and outliers obey the strict 3×MAD rule; complete
    frames only (no day within 3 days of a priority's series edge)."""
    from data_integration_exercise_spark.operators import windows

    pdf = windows.QUERIES["win_hampel_filter"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(pdf) > 0
    assert (pdf.rolling_mad_cents >= 0).all()
    flagged = pdf[pdf.is_outlier]
    assert (
        abs(flagged.cents - flagged.rolling_median_cents)
        > 3 * flagged.rolling_mad_cents
    ).all()


def test_rolling_slope_matches_numpy_refit(spark):
    """Recompute a handful of windows with numpy lstsq: the integer
    micro-slope must equal floor-toward-zero of the float OLS slope
    (ratio of exact integers), single-day windows emit NULL, and window
    sizes respect the 30-day range frame."""
    import numpy as np

    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_rolling_slope"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["o_orderpriority", "day"])
    )
    assert pdf.n_window.between(1, 30).all()
    one = pdf[pdf.o_orderpriority == "1-URGENT"].reset_index(drop=True)
    assert one.loc[0, "n_window"] == 1 and one.loc[0].isna().slope_microcents_per_day
    for idx in [50, 200, len(one) - 1]:
        row = one.loc[idx]
        win = one[(one.day > row.day - 30) & (one.day <= row.day)]
        assert len(win) == row.n_window
        x, y = win.day.to_numpy(float), win.revenue_cents.to_numpy(float)
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        den = n * (x * x).sum() - x.sum() ** 2
        if den > 0:
            expect = int(1e6 * num / den)  # int() truncates toward zero
            got = int(row.slope_microcents_per_day)
            assert abs(got - expect) <= 1, (idx, got, expect)


def test_holt_fold_matches_python_recursion(spark):
    """Replay the Holt recurrence in plain Python over the same daily
    series: level/trend/forecast must match the aggregate-HOF fold
    exactly for every priority."""
    import duckdb

    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_holt_linear"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert len(pdf) == 5
    daily = duckdb.sql(
        """
        SELECT o_orderpriority pri, CAST(o_orderdate AS DATE) AS d,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) cents
        FROM '/root/testdata/sf0.01/orders.parquet'
        WHERE o_orderdate >= TIMESTAMP '2001-06-01' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for pri, grp in daily.groupby("pri"):
        ys = [int(v) for v in grp.sort_values("d").cents]
        l, b = ys[0], 0
        for y in ys[1:]:
            l2 = tdiv(y + 3 * (l + b), 4)
            b = tdiv((l2 - l) + 3 * b, 4)
            l = l2
        row = pdf.loc[pri]
        assert row.n_days == len(ys)
        assert row.level_cents == l and row.trend_cents == b
        assert row.forecast_next_cents == l + b


def test_stl_decompose_reconstructs_and_matches_pandas_trend(spark):
    """Additive identity 10⁶·cents == trend + seasonal + residual must hold
    exactly on every row; the trend must equal the floor of the pandas
    centered 7-day rolling mean; per-priority row count is n_days − 6
    (full centered windows only)."""
    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_stl_decompose"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["o_orderpriority", "day"])
        .reset_index(drop=True)
    )
    assert (
        1_000_000 * pdf.revenue_cents
        == pdf.trend_micro + pdf.seasonal_micro + pdf.residual_micro
    ).all()
    for pri, grp in pdf.groupby("o_orderpriority"):
        grp = grp.sort_values("day").reset_index(drop=True)
        # seasonal is constant per (pri, dow)
        assert grp.groupby(grp.day % 7).seasonal_micro.nunique().max() == 1
        # trend == floor(centered 7-day mean · 10⁶) recomputed from the
        # series itself (interior rows, where the source window is complete)
        s7 = grp.revenue_cents.rolling(7, center=True).sum()
        interior = s7.notna()
        assert (
            grp.trend_micro[interior] == (1_000_000 * s7[interior]) // 7
        ).all()


def test_theil_sen_matches_numpy_pairwise_median(spark):
    """Recompute the lower-median pairwise slope with numpy for every
    priority; n_pairs must be n_months·(n_months−1)/2 and the slope must
    equal the positionally-picked element of the sorted slope multiset."""
    import numpy as np

    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_theil_sen"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert len(pdf) == 5
    import duckdb

    monthly = duckdb.sql(
        """
        SELECT o_orderpriority pri,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) mi,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) cents
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1, 2
        """
    ).df()
    for pri, grp in monthly.groupby("pri"):
        grp = grp.sort_values("mi")
        mi = grp.mi.to_numpy(np.int64)
        c = grp.cents.to_numpy(np.int64)
        slopes = []
        for i in range(len(mi)):
            for j in range(i + 1, len(mi)):
                num, den = 1_000_000 * int(c[j] - c[i]), int(mi[j] - mi[i])
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)
        slopes.sort()
        row = pdf.loc[pri]
        assert row.n_months == len(mi)
        assert row.n_pairs == len(mi) * (len(mi) - 1) // 2 == len(slopes)
        assert row.theil_sen_micro == slopes[(len(slopes) + 1) // 2 - 1]


def test_holt_winters_fold_matches_python_replay(spark):
    """Replay the 9-state integer Holt-Winters recurrence in plain Python
    over each priority's full daily series: level/trend/seasonal forecasts
    for h=1..7 must match the aggregate-HOF fold exactly."""
    import duckdb

    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_holt_winters"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["o_orderpriority", "h"])
        .reset_index(drop=True)
    )
    assert len(pdf) == 35  # 5 priorities x 7 horizons
    daily = duckdb.sql(
        """
        SELECT o_orderpriority pri, CAST(o_orderdate AS DATE) AS d,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) cents
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for pri, grp in daily.groupby("pri"):
        ys = [int(v) for v in grp.sort_values("d").cents]
        n = len(ys)
        l = tdiv(sum(ys[:7]), 7)
        b, i = 0, 7
        s = [y - l for y in ys[:7]]
        for y in ys[7:]:
            idx = i % 7
            lt = tdiv(y - s[idx] + 3 * (l + b), 4)
            bt = tdiv(lt - l + 3 * b, 4)
            s[idx] = tdiv((y - lt) + 3 * s[idx], 4)
            l, b, i = lt, bt, i + 1
        rows = pdf[pdf.o_orderpriority == pri].set_index("h")
        assert (rows.n_days == n).all()
        for h in range(1, 8):
            assert rows.loc[h, "forecast_cents"] == l + h * b + s[(n + h - 1) % 7]


def test_kalman_fold_matches_python_replay(spark):
    """Replay the 4-state integer Kalman recurrence in plain Python over
    each priority's daily series (tens-of-dollars units): the filtered
    level, variance, gain, and mean |innovation| must match the
    aggregate-HOF fold exactly, and the gain must have converged to the
    steady-state Riccati root (which depends only on P0/Q/R)."""
    import duckdb

    from data_integration_exercise_spark.operators import windows as W

    pdf = (
        W.QUERIES["win_kalman_filter"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert len(pdf) == 5
    daily = duckdb.sql(
        """
        SELECT o_orderpriority pri, CAST(o_orderdate AS DATE) AS d,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 1000 AS y
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1, 2
        """
    ).df()

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    # steady-state gain of the scalar Riccati recurrence, data-independent
    p_ss = 1_000_000
    for _ in range(200):
        pp = p_ss + 250_000
        k_ss = (1_000_000 * pp) // (pp + 1_000_000)
        p_ss = ((1_000_000 - k_ss) * pp) // 1_000_000

    for pri, grp in daily.groupby("pri"):
        ys = [int(v) for v in grp.sort_values("d").y]
        x, p, ai, k = ys[0], 1_000_000, 0, 0
        for y in ys[1:]:
            pp = p + 250_000
            k = (1_000_000 * pp) // (pp + 1_000_000)
            ai += abs(y - x)
            x = x + tdiv(k * (y - x), 1_000_000)
            p = ((1_000_000 - k) * pp) // 1_000_000
        row = pdf.loc[pri]
        assert row.n_days == len(ys)
        assert row.x_filtered == x
        assert row.p_micro == p
        assert row.gain_micro == k == k_ss  # converged, data-independent
        assert row.mean_abs_innov == ai // (len(ys) - 1)


def test_rolling_corr_survives_zero_variance_windows(spark):
    """At sf0.001 several 7-day windows have constant n_orders — ANSI-mode
    corr() raised DivideByZero there (found by the round-7 sf0.001
    emulation sweep); the guarded moment-sum form must instead run clean
    and emit honest NULLs for exactly those windows."""
    from data_integration_exercise_spark.operators import windows as W

    pdf = W.QUERIES["win_rolling_corr"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) > 0
    assert pdf.corr7.isna().any(), "expected zero-variance windows at sf0.001"
    assert pdf.corr7.notna().any()
    # and the normal scale still produces a fully-populated series
    big = W.QUERIES["win_rolling_corr"](spark, "/root/testdata/sf0.01").toPandas()
    assert big.corr7.notna().all()


def test_pettitt_matches_numpy_replay(spark):
    """Independent numpy replay of the Pettitt statistic (midranks via
    argsort, U_t cumulative form) for every event type — changepoint day,
    K, direction, and the exp approximation must all agree."""
    import math

    import duckdb
    import numpy as np

    pdf = (
        windows.QUERIES["win_pettitt_changepoint"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("event_type")
    )
    con = duckdb.connect()
    daily = con.execute(
        """
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM '/root/testdata/sf0.01/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for et, g in daily.groupby("event_type"):
        x = g.cnt.to_numpy(dtype=float)
        n = len(x)
        # midranks: average of the 1-based positions each tied value spans
        order = np.argsort(x, kind="stable")
        ranks = np.empty(n)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and x[order[j + 1]] == x[order[i]]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        u = 2 * np.cumsum(ranks) - (np.arange(1, n + 1)) * (n + 1)
        k_all = np.abs(u[:-1])
        t_star = int(np.argmax(k_all))  # argmax returns the FIRST max = earliest day
        row = pdf.loc[et]
        assert row.n_days == n
        assert row.k_stat == k_all[t_star]
        assert row.cp_day == g.day.iloc[t_star].date()
        assert row.shift_dir == ("down" if u[t_star] > 0 else "up" if u[t_star] < 0 else "none")
        p = min(1.0, 2 * math.exp(-6 * k_all[t_star] ** 2 / (n**3 + n**2)))
        assert row.p_approx == round(p, 4)


def test_sax_paa_word_structure(spark):
    """Quantile-SAX structural invariants: 8 segments → an 8-char word over
    a–d with exactly two of each symbol (ntile(4) over 8 rows), and the
    segment means replayed from a DuckDB daily rollup reproduce the word
    for every priority."""
    import duckdb
    import numpy as np

    pdf = (
        windows.QUERIES["win_sax_paa"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("o_orderpriority")
    )
    assert len(pdf) == 5
    con = duckdb.connect()
    daily = con.execute(
        """
        SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
               count(*) AS cnt
        FROM '/root/testdata/sf0.01/orders.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for pri, g in daily.groupby("pri"):
        cnt = g.cnt.to_numpy()
        n = len(cnt)
        seg_of = (np.arange(n) * 8) // n
        paa = np.array([cnt[seg_of == s].mean() for s in range(8)])
        # quartile symbols: rank segments by (paa, seg), 2 per letter
        order = np.lexsort((np.arange(8), paa))
        sym = [""] * 8
        for q, si in enumerate(order):
            sym[si] = "abcd"[q // 2]
        row = pdf.loc[pri]
        assert row.sax_word == "".join(sym)
        assert sorted(row.sax_word) == list("aabbccdd")
        assert row.n_days == n
        assert row.min_paa == round(paa.min(), 4)
        assert row.max_paa == round(paa.max(), 4)


def test_bollinger_flags_match_numpy(spark):
    """Rolling-moment replay: every emitted mean/std and both breakout
    flags recomputed from the raw daily series for one priority."""
    import duckdb
    import numpy as np

    pdf = (
        windows.QUERIES["win_bollinger_bands"](spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    pdf = pdf[pdf.o_orderpriority == "1-URGENT"].sort_values("day").reset_index(drop=True)
    con = duckdb.connect()
    daily = con.execute(
        """
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100 AS y
        FROM '/root/testdata/sf0.01/orders.parquet'
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    ys = [int(v) for v in daily.y]
    days = [int(d) for d in daily.day]
    out = []
    for i in range(19, len(ys)):
        w = ys[i - 19 : i + 1]
        k, s, s2, y = 20, sum(w), sum(v * v for v in w), ys[i]
        dev = k * y - s
        var_num = k * s2 - s * s
        exceed = (k - 1) * dev * dev > 4 * k * var_num
        out.append(
            (
                days[i],
                y,
                round(s / k, 4),
                round((var_num / (k * (k - 1))) ** 0.5, 4),
                int(dev > 0 and exceed),
                int(dev < 0 and exceed),
            )
        )
    assert len(pdf) == len(out)
    got = list(
        zip(pdf.day, pdf.y, pdf.mean_dollars, pdf.std_dollars,
            pdf.breakout_up, pdf.breakout_down)
    )
    assert got == out
    # the 2-sigma envelope must trip somewhere but rarely (~5% of days)
    trips = pdf.breakout_up.sum() + pdf.breakout_down.sum()
    assert 0 < trips < 0.1 * len(pdf)


def test_rsi_bounds_and_fold(spark):
    """RSI ∈ [0,100]; every row's rsi reproduces 100·G/(G+L) from its own
    emitted integer sums; flat regimes (G+L=0) read exactly 50."""
    rows = windows.QUERIES["win_rsi"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.gain_sum >= 0 and r.loss_sum >= 0
        assert 0.0 <= r.rsi <= 100.0
        tot = r.gain_sum + r.loss_sum
        if tot == 0:
            assert r.rsi == 50.0
        else:
            assert r.rsi == pytest.approx(
                round(100.0 * r.gain_sum / tot, 4), abs=1e-9
            )


def test_rsi_matches_python_series_replay(spark):
    """Fold one priority's daily series in pure Python (deltas → 14-window
    sums) and compare every emitted row."""
    import pandas as pd

    o = pd.read_parquet("/root/testdata/sf0.01/orders.parquet")
    o = o[o.o_orderpriority == "1-URGENT"].copy()
    o["day"] = (pd.to_datetime(o.o_orderdate).dt.normalize()
                - pd.Timestamp("1970-01-01")).dt.days
    cents = (o.o_totalprice * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": o.day, "c": cents})
        .groupby("day").c.sum().floordiv(100).sort_index()
    )
    deltas = daily.diff()
    expect = {}
    vals = deltas.tolist()
    days = daily.index.tolist()
    for i in range(len(days)):
        win = [v for v in vals[max(0, i - 13): i + 1] if pd.notna(v)]
        if len(win) != 14:
            continue
        g = int(sum(v for v in win if v > 0))
        l = int(-sum(v for v in win if v < 0))
        expect[days[i]] = (g, l)
    got = {
        r.day: (r.gain_sum, r.loss_sum)
        for r in windows.QUERIES["win_rsi"](spark, "/root/testdata/sf0.01").collect()
        if r.o_orderpriority == "1-URGENT"
    }
    assert got == expect


def test_dtw_fold_matches_python_replay(spark):
    """Replay the banded DTW DP in plain Python over each priority pair's
    monthly series: every pair's warped cost must match the nested
    aggregate-HOF fold exactly, the band sentinel must never leak into a
    reachable result, and DTW must be ≤ the lockstep L1 distance (warping
    can only help) while staying symmetric in the pair orientation."""
    import duckdb

    from data_integration_exercise_spark.operators import windows as W

    pdf = W.QUERIES["win_dtw_pairs"](spark, "/root/testdata/sf0.01").toPandas()
    monthly = duckdb.sql(
        """
        SELECT o_orderpriority pri,
               date_diff('month', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS m,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1, 2
        """
    ).df()
    series = {
        pri: [int(v) for v in grp.sort_values("m").v]
        for pri, grp in monthly.groupby("pri")
    }

    INF, BAND = 400_000_000_000_000_000, 8

    def dtw(xs, ys):
        prev = [0] + [INF] * len(ys)
        for i in range(1, len(xs) + 1):
            cur = [INF]
            for j in range(1, len(ys) + 1):
                if abs(i - j) > BAND:
                    cur.append(INF)
                else:
                    cur.append(
                        abs(xs[i - 1] - ys[j - 1])
                        + min(prev[j], prev[j - 1], cur[j - 1])
                    )
            prev = cur
        return prev[len(ys)]

    n_pri = len(series)
    assert len(pdf) == n_pri * (n_pri - 1) // 2
    for row in pdf.itertuples():
        xs, ys = series[row.pri_a], series[row.pri_b]
        expect = dtw(xs, ys)
        assert row.dtw_cost == expect
        assert row.dtw_cost < INF  # band wide enough for every real pair
        assert dtw(ys, xs) == expect  # symmetric under orientation
        if len(xs) == len(ys):
            lockstep = sum(abs(a - b) for a, b in zip(xs, ys))
            assert row.dtw_cost <= lockstep
        assert row.dtw_per_step == row.dtw_cost // (row.n_a + row.n_b)


def test_matrix_profile_python_replay(spark):
    """Replay the banded matrix-profile construction in plain Python:
    every window's nearest-neighbor distance, neighbor position, and the
    motif/discord flags must match; the profile must be built only from
    gap-free 6-month windows with the |Δpos| ≥ 3 exclusion honored."""
    import duckdb

    from data_integration_exercise_spark.operators import windows as W

    pdf = W.QUERIES["win_matrix_profile"](spark, "/root/testdata/sf0.01").toPandas()
    monthly = duckdb.sql(
        """
        SELECT o_orderpriority pri,
               date_diff('month', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS m,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1, 2
        """
    ).df()
    for pri, grp in monthly.groupby("pri"):
        series = {int(r.m): int(r.v) for r in grp.itertuples()}
        wins = {
            p: [series[p + k] for k in range(6)]
            for p in series
            if all(p + k in series for k in range(6))
        }
        mp = {}
        for p1, w1 in wins.items():
            best = None
            for p2, w2 in wins.items():
                if abs(p1 - p2) < 3:
                    continue
                d2 = sum((a - b) ** 2 for a, b in zip(w1, w2))
                if best is None or (d2, p2) < best:
                    best = (d2, p2)
            if best is not None:
                mp[p1] = best
        rows = pdf[pdf.o_orderpriority == pri]
        assert len(rows) == len(mp)
        lo = min(d for d, _ in mp.values())
        hi = max(d for d, _ in mp.values())
        for r in rows.itertuples():
            d2, p2 = mp[int(r.pos)]
            assert (r.mp_d2, r.nn_pos) == (d2, p2)
            assert bool(r.is_motif) == (d2 == lo)
            assert bool(r.is_discord) == (d2 == hi)
