"""Oracle-parity tests for §2.4 aggregation operators."""

from __future__ import annotations

import pytest

from data_integration_exercise_spark.operators import aggregates

from .parity import assert_parity

SF = "/root/testdata/sf0.01"

ORACLE_KEYS = sorted(aggregates.ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_parity(spark, key):
    assert_parity(spark, key)


def test_flagship_smoke(spark):
    """entry() contract: sf0.001, >0 rows, stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]


def test_hll_sketch_merge_quality(spark):
    """Sketch-merge invariants: (a) the shard-merged estimate lands within
    5% of the exact distinct count at lgConfigK=12 (the carried
    rel_error_e4 column); (b) it also sits within 5% of the single-pass
    sketch estimate. Exact equality is NOT expected: a directly-built
    Datasketches HLL reports the HIP estimator while a union result falls
    back to the composite estimator, so the two legitimately differ by a
    small margin even over identical registers."""
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    out = aggregates.QUERIES["agg_hll_sketch_merge"](spark, "/root/testdata/sf0.01")
    rows = {r["l_returnflag"]: r for r in out.collect()}
    assert rows, "empty sketch-merge result"
    for r in rows.values():
        assert r["rel_error_e4"] <= 500, f"estimate off by >5%: {r}"

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    single = {
        r["l_returnflag"]: r["est"]
        for r in li.groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", F.lit(12))).alias("est"))
        .collect()
    }
    for flag, r in rows.items():
        assert abs(r["est_parts"] - single[flag]) <= 0.05 * single[flag], (
            flag, r["est_parts"], single[flag],
        )


def test_quantile_sketch_merge_error_bounds(spark):
    """Mergeable-sample-sketch invariants across both small scales:
    (a) exhaustive regime — when a group's n ≤ K_MERGE the merged
    bottom-k sample IS the group, so the sketch must be EXACT (err = 0,
    m = n; holds at sf0.001); (b) sampled regime — at sf0.01 the sample
    caps at m = 512 and the pinned quantized bound is err ≤ 200 permille
    (2× the observed worst of 96‰ — a ~2.2% rank-error sample reading a
    locally-flat CDF); (c) every estimate lies inside the group's exact
    value envelope [p50 ≤ p90 read-out order preserved]."""
    for sf_dir, exhaustive in (
        ("/root/testdata/sf0.001", True),
        ("/root/testdata/sf0.01", False),
    ):
        rows = aggregates.QUERIES["agg_quantile_sketch_merge"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 5, sf_dir
        for r in rows:
            if exhaustive:
                assert r.n <= 512 and r.m == r.n, (sf_dir, r)
                assert r.err_p50_permille == 0 and r.err_p90_permille == 0, r
                assert r.p50_cents == r.exact_p50_cents, r
                assert r.p90_cents == r.exact_p90_cents, r
            else:
                assert r.m == 512 and r.n > 512, (sf_dir, r)
                assert r.err_p50_permille <= 200, r
                assert r.err_p90_permille <= 200, r
            assert r.p50_cents <= r.p90_cents, r
            assert r.exact_p50_cents <= r.exact_p90_cents, r


def test_ks_test_statistic_bounds_and_null_regime(spark):
    """KS ∈ [0,1] by construction; the priority assignment is independent
    of o_totalprice in the generator, so one-vs-rest drift must be small
    (null regime) but strictly positive (finite samples never match
    exactly). Group sizes must partition the table."""
    rows = aggregates.QUERIES["agg_ks_test"](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    total = rows[0].n_group + rows[0].n_rest
    for r in rows:
        assert r.n_group + r.n_rest == total
        assert 0.0 < r.ks_stat < 0.1, r


def test_chi_square_parts_sum_to_total_and_dense_cells(spark):
    """chi2_part values must sum exactly to the repeated chi2_total (they
    are decimal sums of 4dp-rounded terms — no float slop allowed), dof
    must be (|types|-1)*(|hours|-1), and every type row must be present
    even if some (type, hour) cell is empty."""
    rows = aggregates.QUERIES["agg_chi_square"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    total = rows[0].chi2_total
    assert all(r.chi2_total == total for r in rows)
    assert abs(sum(r.chi2_part for r in rows) - total) < 1e-9
    assert all(r.dof == (5 - 1) * (24 - 1) for r in rows)
    assert total >= 0


def test_mann_whitney_null_split_regime(spark):
    """The hash split is independent of o_totalprice, so U2 must sit near
    its null mean n_a*n_b (within ~4 sigma) and |z| must be small; exact
    identity 0 <= U2 <= 2*n_a*n_b must hold."""
    rows = aggregates.QUERIES["agg_mann_whitney"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.u2 <= 2 * r.n_a * r.n_b
        assert abs(r.z_stat) < 4.0, r


def test_heavy_hitters_matches_exact_groupby_and_is_partitioning_proof(spark):
    """The MG candidate pass may emit partition-dependent candidates, but
    the exact recount + threshold must reproduce the plain groupBy-HAVING
    answer exactly — including after an adversarial repartition that
    changes every partition's local stream."""
    from pyspark.sql import functions as F

    from data_integration_exercise_spark.io import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.token, r.n_occurrences)
        for r in aggregates.QUERIES["agg_heavy_hitters"](spark, sf).collect()
    }
    toks = load_table(spark, sf, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n = toks.count()
    want = {
        (r.token, r.n)
        for r in toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") * 30 > F.lit(n))
        .collect()
    }
    assert got == want and len(want) > 0


def test_bootstrap_ci_brackets_mean_and_is_partitioning_proof(spark):
    """ci_lo <= mean <= ci_hi for every priority on this null-ish data,
    the CI is strictly narrower than the data range, and the draw is
    content-hash-based so a repartitioned rerun is identical."""
    rows = aggregates.QUERIES["agg_bootstrap_ci"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.ci_lo <= r.mean <= r.ci_hi, r
        assert 0 < r.ci_hi - r.ci_lo < r.mean * 0.2, r
    again = aggregates.QUERIES["agg_bootstrap_ci"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_benford_covers_all_digits_and_permilles_sum(spark):
    """All 9 digits appear on this corpus, observed permilles sum to
    ~1000 (floor slack < 9), and dev = obs - exp exactly."""
    rows = aggregates.QUERIES["agg_benford_deviation"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    s = sum(r.obs_permille for r in rows)
    assert 1000 - 9 <= s <= 1000
    for r in rows:
        assert r.dev_permille == r.obs_permille - r.exp_permille


def test_hhi_bounds_and_uniform_floor(spark):
    """HHI in [uniform floor, 10000]; near-uniform TPC-H customer revenue
    should sit close to (but at or above) the 10000/n floor."""
    rows = aggregates.QUERIES["agg_hhi_concentration"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.uniform_hhi_bp <= r.hhi_bp <= 10000
        assert r.hhi_bp < 10 * max(1, r.uniform_hhi_bp)


def test_winsorized_mean_dampens_tails(spark):
    """Winsorized mean sits between p05 and p95, and differs from the raw
    mean by less than the raw mean differs from the extremes; cuts are
    actual data values."""
    rows = aggregates.QUERIES["agg_winsorized_mean"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p05_cents < r.winsorized_mean_cents < r.p95_cents
        assert r.p05_cents < r.raw_mean_cents < r.p95_cents


def test_pareto_crossover_null_reading_on_uniform_spend(spark):
    """TPC-H near-uniform customer spend: the 80%-revenue crossover must
    need far MORE than 20% of customers (the honest anti-Pareto reading),
    and k_top must be a valid minimal index."""
    rows = aggregates.QUERIES["agg_pareto_crossover"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.k_top <= r.n_custs
        assert 500 <= r.top_share_permille <= 850, r


def test_count_min_never_underestimates(spark):
    """CMS's defining one-sided guarantee: estimate ≥ exact for every key,
    with equality for most keys at this load factor (150 keys over 32
    buckets ⇒ collisions exist, so SOME overcount must also appear)."""
    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_count_min_sketch"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert (pdf.overcount >= 0).all()
    assert (pdf.cms_estimate >= pdf.exact_count).all()
    assert (pdf.overcount > 0).any()
    assert pdf.exact_count.sum() == 10000


def test_quantile_sketch_bounds_bracket_exact_percentiles(spark):
    """Each emitted [lo, hi] bin must contain the EXACT nearest-rank
    percentile of the underlying cents distribution — the sketch's 2×
    error guarantee, checked against DuckDB's quantile_disc."""
    import duckdb

    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_quantile_sketch"](
        spark, "/root/testdata/sf0.01"
    ).toPandas().set_index("o_orderpriority")
    con = duckdb.connect()
    exact = con.execute(
        """
        SELECT o_orderpriority AS pri,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.50) AS p50,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.95) AS p95,
               quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) AS p99
        FROM read_parquet('/root/testdata/sf0.01/orders.parquet')
        GROUP BY 1
        """
    ).df().set_index("pri")
    con.close()
    for pri in exact.index:
        for q in ("50", "95", "99"):
            lo = pdf.loc[pri, f"p{q}_lo_cents"]
            hi = pdf.loc[pri, f"p{q}_hi_cents"]
            assert lo <= exact.loc[pri, f"p{q}"] <= hi, (pri, q, lo, hi)
            assert hi < 2 * lo + 2  # the advertised 2× relative error


def test_seasonality_index_averages_to_flat(spark):
    """Per priority, the 7 indices must average ~1000‰ (they partition the
    revenue) and both over- and under-trading days must exist."""
    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_seasonality_dow"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    for pri, g in pdf.groupby("o_orderpriority"):
        assert len(g) == 7
        assert abs(g.seasonality_permille.sum() - 7000) <= 7  # truncation slack
        assert g.seasonality_permille.max() > 1000 > g.seasonality_permille.min()


def test_ratio_delta_method_matches_scipy_style_reference(spark):
    """The integer-moment delta method must agree with a float numpy
    reference to within 1 micro unit, and the CI must bracket the ratio."""
    import duckdb
    import numpy as np

    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_ratio_delta_method"](
        spark, "/root/testdata/sf0.01"
    ).toPandas().set_index("arm")
    con = duckdb.connect()
    u = con.execute(
        """
        SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS arm,
               count(*) AS y,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x
        FROM read_parquet('/root/testdata/sf0.01/events.parquet')
        GROUP BY user_id
        """
    ).df()
    con.close()
    for arm, g in u.groupby("arm"):
        x, y = g.x.to_numpy(float), g.y.to_numpy(float)
        n, r = len(g), x.sum() / y.sum()
        var = (
            (x.var(ddof=1) - 2 * r * np.cov(x, y, ddof=1)[0, 1] + r * r * y.var(ddof=1))
            / n
        ) / (y.mean() ** 2)
        se = np.sqrt(var)
        assert abs(pdf.loc[arm, "ratio_micro"] - np.floor(1e6 * r)) <= 1
        assert abs(pdf.loc[arm, "se_micro"] - np.floor(1e6 * se)) <= 1
        assert pdf.loc[arm, "ci_lo_micro"] <= pdf.loc[arm, "ratio_micro"] <= pdf.loc[arm, "ci_hi_micro"]


def test_power_mde_scales_inversely_with_sqrt_n(spark):
    """Sanity: MDE is positive, relative MDE is plausible (< 100% for
    this n), and the closed form reproduces from the emitted pieces."""
    import numpy as np

    from data_integration_exercise_spark.operators import aggregates

    r = aggregates.QUERIES["agg_ab_power_mde"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r.n_a + r.n_b == 150
    assert r.mde_abs_centicents > 0
    sd = r.pooled_sd_centicents / 1e4
    mde = (1.96 + 0.8416) * sd * np.sqrt(1 / r.n_a + 1 / r.n_b)
    assert abs(r.mde_abs_centicents / 1e4 - mde) / mde < 0.001


def test_rollforward_ledger_chains(spark):
    """closing(t) == opening(t+1) for every consecutive month, and
    closing == opening + inflow − outflow row-wise."""
    from data_integration_exercise_spark.operators import aggregates

    pdf = (
        aggregates.QUERIES["agg_rollforward_balance"](
            spark, "/root/testdata/sf0.01"
        )
        .toPandas()
        .sort_values("ym")
        .reset_index(drop=True)
    )
    assert (
        pdf.closing_cents
        == pdf.opening_cents + pdf.inflow_cents - pdf.outflow_cents
    ).all()
    assert (pdf.closing_cents[:-1].values == pdf.opening_cents[1:].values).all()


def test_kmv_sketch_estimates_and_algebra(spark):
    """KMV invariants: estimates land within the ~1/sqrt(k-1) error regime
    of the exact audit counts, the sketch algebra is internally consistent
    (union >= both sides >= intersection), and the Jaccard estimate tracks
    the exact Jaccard."""
    from data_integration_exercise_spark.operators import aggregates

    r = (
        aggregates.QUERIES["agg_kmv_set_ops"](spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    # exact side: click/purchase user-day sets genuinely differ
    assert 0 < r["n_inter_exact"] < min(r["n_a_exact"], r["n_b_exact"])
    assert r["n_union_exact"] > max(r["n_a_exact"], r["n_b_exact"])
    # estimator accuracy: std ~ 1/sqrt(127) ~ 8.9%; generous 0.5 rel bound
    for est, exact in [
        ("est_a", "n_a_exact"),
        ("est_b", "n_b_exact"),
        ("est_union", "n_union_exact"),
    ]:
        assert abs(r[est] - r[exact]) <= 0.5 * r[exact] + 10, (est, r)
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) * 0.8
    assert 0 <= r["est_inter"] <= r["est_union"]
    assert abs(r["jaccard_est_permille"] - r["jaccard_exact_permille"]) <= 250


def test_did_uplift_null_experiment(spark):
    """On a hash-split null assignment the true uplift is zero: the DiD
    estimate must be small relative to the cell means, cells partition the
    purchase log, and all means are positive micro-cents."""
    from data_integration_exercise_spark.operators import aggregates

    r = (
        aggregates.QUERIES["agg_did_uplift"](spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    import duckdb

    n_purch = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.01/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert r["n_t_pre"] + r["n_t_post"] + r["n_c_pre"] + r["n_c_post"] == n_purch
    means = [
        r["mean_t_pre_microcents"],
        r["mean_t_post_microcents"],
        r["mean_c_pre_microcents"],
        r["mean_c_post_microcents"],
    ]
    assert all(m > 0 for m in means)
    # null experiment: |DiD| well under the mean purchase value itself
    assert abs(r["did_microcents"]) < max(means)


def test_cuped_reduces_variance_and_ties_out(spark):
    """CUPED invariants: cohort splits cleanly into the two arms, raw means
    match a direct recomputation, and on a null experiment the CUPED diff
    stays in the same magnitude regime as the raw diff (the adjustment
    must not invent signal)."""
    import duckdb

    from data_integration_exercise_spark.operators import aggregates

    r = (
        aggregates.QUERIES["agg_cuped_adjusted"](spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    n_users = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM '/root/testdata/sf0.01/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert r["n_t"] + r["n_c"] == n_users
    assert r["raw_diff_microcents"] == r["raw_mean_t"] - r["raw_mean_c"]
    assert r["cuped_diff_microcents"] == r["cuped_mean_t"] - r["cuped_mean_c"]
    # null experiment: both diffs are noise around zero, well under the means
    assert abs(r["cuped_diff_microcents"]) < max(r["raw_mean_t"], r["raw_mean_c"])


def test_price_volume_mix_bridge_reconciles(spark):
    """The waterfall identity must hold exactly per brand: price + volume
    + joint = 1e6·Δrev, with 25 brands and positive quantities."""
    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_price_volume_mix"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(pdf) == 25
    assert (pdf.q0 > 0).all() and (pdf.q1 > 0).all()
    lhs = (
        pdf.price_effect_micro + pdf.volume_effect_micro + pdf.joint_effect_micro
    )
    assert (lhs == 1_000_000 * pdf.delta_cents).all()
    assert (pdf.delta_cents == pdf.rev1_cents - pdf.rev0_cents).all()


def test_qte_deciles_are_exact_order_statistics(spark):
    """Each decile value must equal the python-side nearest-rank order
    statistic of the same arm's cents, and the QTE curve of the null
    experiment must be small relative to the decile values."""
    import duckdb

    from data_integration_exercise_spark.operators import aggregates

    pdf = (
        aggregates.QUERIES["agg_quantile_treatment_effect"](
            spark, "/root/testdata/sf0.01"
        )
        .toPandas()
        .set_index("decile")
        .sort_index()
    )
    assert list(pdf.index) == list(range(1, 10))
    assert pdf.t_value_cents.is_monotonic_increasing
    assert pdf.c_value_cents.is_monotonic_increasing
    rows = duckdb.sql(
        """
        SELECT (('0x' || substr(md5('did|' || CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                % 10) < 5 AS is_t,
               CAST(round(value * 100) AS BIGINT) AS cents, event_id
        FROM '/root/testdata/sf0.01/events.parquet' WHERE event_type = 'purchase'
        """
    ).df()
    for is_t, col in [(True, "t_value_cents"), (False, "c_value_cents")]:
        vals = (
            rows[rows.is_t == is_t]
            .sort_values(["cents", "event_id"])
            .cents.tolist()
        )
        n = len(vals)
        for k in range(1, 10):
            assert pdf.loc[k, col] == vals[(k * n + 9) // 10 - 1]


def test_ipf_raking_margins_converge(spark):
    """After two sweeps the column (region) margins — adjusted last — must
    match the uniform target exactly up to integer truncation, and the row
    margins must sit within a small relative slack; weights stay positive
    and mass is conserved within truncation loss."""
    from data_integration_exercise_spark.operators import aggregates

    pdf = aggregates.QUERIES["agg_ipf_raking"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(pdf) == 25
    assert (pdf.weight_micro > 0).all()
    total = pdf.n_customers.sum()
    target = total * 1_000_000 // 5
    col = pdf.groupby("r_name").weighted_micro.sum()
    # last-adjusted margin: off only by truncation, bounded by sum(n) per
    # region (each cell's floor-truncated w loses < 1 micro PER UNIT of n)
    slack = pdf.groupby("r_name").n_customers.sum()
    assert ((col - target).abs() <= slack).all()
    row = pdf.groupby("c_mktsegment").weighted_micro.sum()
    assert ((row - target).abs() / target <= 0.02).all()  # one sweep behind


def test_mann_kendall_recomputes_from_pairs(spark):
    """S must equal the brute-force pairwise sign sum per priority, var18
    must match the closed form with tie correction, and |S| must be
    bounded by the pair count."""
    import duckdb

    from data_integration_exercise_spark.operators import aggregates

    pdf = (
        aggregates.QUERIES["agg_mann_kendall"](spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("o_orderpriority")
    )
    daily = duckdb.sql(
        """
        SELECT o_orderpriority pri, CAST(o_orderdate AS DATE) AS dd,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) cents
        FROM '/root/testdata/sf0.01/orders.parquet'
        WHERE o_orderdate >= TIMESTAMP '2001-06-01' GROUP BY 1, 2
        """
    ).df()
    for pri, grp in daily.groupby("pri"):
        ys = [int(v) for v in grp.sort_values("dd").cents]
        n = len(ys)
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        row = pdf.loc[pri]
        assert row.n_days == n and row.s_stat == s
        assert abs(s) <= n * (n - 1) // 2
        from collections import Counter

        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1
        )
        assert row.var18 == n * (n - 1) * (2 * n + 5) - tie


def test_acf_lags_match_numpy_reference(spark):
    """agg_acf_lags vs a numpy recomputation of the textbook estimator on
    the same daily series: the integer micro-units must equal
    floor(10^6·|r_k|) with the matching sign, and n_terms must shrink by
    exactly one per lag."""
    import duckdb
    import numpy as np

    from data_integration_exercise_spark.operators import aggregates

    rows = aggregates.QUERIES["agg_acf_lags"](spark, SF).toPandas()
    rows = rows.sort_values("lag").reset_index(drop=True)
    assert list(rows.lag) == list(range(1, 8))
    cents = duckdb.sql(
        f"""
        SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY CAST(o_orderdate AS DATE) ORDER BY CAST(o_orderdate AS DATE)
        """
    ).df().iloc[:, 0].to_numpy(dtype=np.float64)
    n = len(cents)
    x = cents - cents.mean()
    den = float((x * x).sum())
    for _, r in rows.iterrows():
        k = int(r.lag)
        assert r.n_terms == n - k
        ref = float((x[:-k] * x[k:]).sum()) / den
        approx = int(np.sign(ref) * np.floor(1e6 * abs(ref)))
        # integer algebra is exact; numpy float64 may differ by 1 micro-unit
        # at the floor boundary
        assert abs(int(r.acf_micro) - approx) <= 1, (k, int(r.acf_micro), approx)
        assert abs(int(r.acf_micro)) <= 1_000_000


def test_srm_check_scenarios_behave(spark):
    """The clean hash split must not flag SRM in any segment; the simulated
    20% B-arm drop must flag once a segment has enough users; chi2 must
    equal the integer (n_a−n_b)²·10⁶ div n recomputation."""
    from data_integration_exercise_spark.operators import aggregates as A

    pdf = A.QUERIES["agg_srm_check"](spark, "/root/testdata/sf0.01").toPandas()
    assert set(pdf.scenario) == {"observed", "sim_b_drop"}
    for _, r in pdf.iterrows():
        n = int(r.n_a + r.n_b)
        diff = int(r.n_a - r.n_b)
        assert r.chi2_micro == (1_000_000 * diff * diff) // n
        assert r.srm_flag == (1 if r.chi2_micro > 3_841_459 else 0)
    obs = pdf[pdf.scenario == "observed"]
    assert (obs.srm_flag == 0).all(), "clean hash split flagged SRM"
    sim = pdf[pdf.scenario == "sim_b_drop"]
    big = sim[(sim.n_a + sim.n_b) >= 500]
    assert (big.srm_flag == 1).all(), "20% one-arm drop went undetected"


def test_cramers_v_matches_numpy_crosstab(spark):
    """Recompute chi-square and V from a pandas crosstab for every pair;
    the unrounded replay must land within float noise of the emitted 4dp
    values, and V must respect its [0, 1] normalization bounds."""
    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_cramers_v"](spark, SF)
        .toPandas()
        .set_index("pair")
    )
    con = duckdb.connect()
    o = con.execute(
        f"""
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               month(o_orderdate) AS mo, year(o_orderdate) AS yr
        FROM '{SF}/orders.parquet'
        """
    ).df()
    for name, a, b in [
        ("priority_x_status", "pri", "st"),
        ("priority_x_month", "pri", "mo"),
        ("status_x_year", "st", "yr"),
    ]:
        ct = np.asarray(
            o.groupby([a, b]).size().unstack(fill_value=0), dtype=float
        )
        n = ct.sum()
        exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
        chi2 = ((ct - exp) ** 2 / exp).sum()
        row = pdf.loc[name]
        assert abs(row.chi2 - chi2) < 5.1e-5  # emitted value is rounded 4dp
        assert row.card_a == ct.shape[0] and row.card_b == ct.shape[1]
        assert row.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        v = np.sqrt(row.chi2 / (n * (min(ct.shape) - 1)))
        assert row.cramers_v == round(v, 4)
        assert 0.0 <= row.cramers_v <= 1.0


def test_mutual_information_identities(spark):
    """MI identities vs an independent numpy replay: MI >= 0,
    MI <= min(H_a, H_b), U coefficients in [0, 1], and the replayed MI
    lands within 4dp-rounding distance."""
    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_mutual_information"](spark, SF)
        .toPandas()
        .set_index("pair")
    )
    con = duckdb.connect()
    o = con.execute(
        f"""
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               month(o_orderdate) AS mo, year(o_orderdate) AS yr
        FROM '{SF}/orders.parquet'
        """
    ).df()
    for name, a, b in [
        ("priority_x_status", "pri", "st"),
        ("priority_x_month", "pri", "mo"),
        ("status_x_year", "st", "yr"),
    ]:
        ct = np.asarray(o.groupby([a, b]).size().unstack(fill_value=0), dtype=float)
        n = ct.sum()
        pij = ct / n
        pi = pij.sum(axis=1, keepdims=True)
        pj = pij.sum(axis=0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(pij > 0, pij * np.log2(pij / (pi * pj)), 0.0)
        mi = terms.sum()
        row = pdf.loc[name]
        assert abs(row.mi_bits - mi) < 5.1e-5
        ha = -(pi * np.log2(pi)).sum()
        hb = -(pj * np.log2(pj)).sum()
        assert abs(row.h_a_bits - ha) < 5.1e-5
        assert abs(row.h_b_bits - hb) < 5.1e-5
        assert -1e-9 <= row.mi_bits <= min(row.h_a_bits, row.h_b_bits) + 1e-9
        assert row.u_a_given_b == round(row.mi_bits / row.h_a_bits, 4)
        assert 0 <= row.u_a_given_b <= 1 and 0 <= row.u_b_given_a <= 1


def test_ks_drift_bh_replay(spark):
    """Replay one type's KS statistic from raw micro-unit values and check
    the BH step-up bookkeeping across the whole family."""
    import math

    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_ks_drift_bh"](spark, SF)
        .toPandas()
        .sort_values("bh_rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    vals = con.execute(
        f"""
        SELECT CAST(floor(value * 1000000) AS BIGINT) AS vu,
               epoch_ns(ts) // 1000 < 1705363200000000 AS in_a
        FROM '{SF}/events.parquet' WHERE event_type = 'click'
        """
    ).df()
    a = np.sort(vals[vals.in_a].vu.to_numpy())
    b = np.sort(vals[~vals.in_a].vu.to_numpy())
    n1, n2 = len(a), len(b)
    support = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, support, side="right")
    f2 = np.searchsorted(b, support, side="right")
    d_num = int(np.abs(f1.astype(object) * n2 - f2.astype(object) * n1).max())
    row = pdf.set_index("event_type").loc["click"]
    assert (row.n_first, row.n_second) == (n1, n2)
    assert row.d_micro == 1000000 * d_num // (n1 * n2)
    p = min(1.0, 2 * math.exp(-2 * d_num * d_num / (n1 * n2 * (n1 + n2))))
    assert row.p_approx == round(p, 4)
    # BH bookkeeping: ranks are 1..m ordered by p, flags are a prefix set
    # ending at the largest rank passing p(k) <= k*q/m
    m = len(pdf)
    assert list(pdf.bh_rank) == list(range(1, m + 1))
    assert pdf.p_approx.is_monotonic_increasing
    passing = [r.bh_rank for r in pdf.itertuples() if r.p_approx * m <= r.bh_rank * 0.05]
    k = max(passing) if passing else 0
    assert list(pdf.bh_flag) == [1 if r <= k else 0 for r in pdf.bh_rank]


def test_tukey_fences_matches_numpy(spark):
    """Order-statistic quartiles and fence counts replayed in numpy for
    every priority; near-uniform TPC-H prices must produce ZERO outliers
    (the honest null reading) and a wide IQR."""
    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_tukey_fences"](spark, SF)
        .toPandas()
        .set_index("o_orderpriority")
    )
    con = duckdb.connect()
    o = con.execute(
        f"""
        SELECT o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM '{SF}/orders.parquet'
        """
    ).df()
    for pri, g in o.groupby("pri"):
        v = np.sort(g.cents.to_numpy())
        n = len(v)
        q1 = int(v[(n + 3) // 4 - 1])
        q3 = int(v[(3 * n + 3) // 4 - 1])
        iqr = q3 - q1
        row = pdf.loc[pri]
        assert (row.n_orders, row.q1_cents, row.q3_cents) == (n, q1, q3)
        assert row.iqr_cents == iqr
        lo = sum(1 for x in v if 2 * int(x) < 2 * q1 - 3 * iqr)
        hi = sum(1 for x in v if 2 * int(x) > 2 * q3 + 3 * iqr)
        assert (row.n_low_outliers, row.n_high_outliers) == (lo, hi)
        assert lo == 0 and hi == 0  # uniform prices: fences never trip


def test_calibration_ece_identities(spark):
    """ECE bookkeeping: bins partition the feed, the per-bin gap recomputes
    from conf/acc, the weighted gap sum reproduces ece_micro, and the
    independence of score and outcome shows up as every bin's accuracy
    pinned near the purchase base rate while confidences climb."""
    pdf = (
        aggregates.QUERIES["agg_calibration_ece"](spark, SF)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert set(pdf.bin) <= set(range(10)) and len(pdf) >= 8
    assert pdf.ece_micro.nunique() == 1
    n = pdf.n.sum()
    ece = int(pdf.ece_micro.iloc[0])
    assert ece == int((pdf.n * (pdf.acc_micro - pdf.conf_micro).abs()).sum()) // n
    assert (pdf.gap_micro == (pdf.acc_micro - pdf.conf_micro).abs()).all()
    # confidences rise with the bin; accuracies hover at the base rate
    assert pdf.conf_micro.is_monotonic_increasing
    big = pdf[pdf.n >= 100]  # tiny tail bins are all-noise by construction
    assert big.acc_micro.sub(big.acc_micro.mean()).abs().max() < 100000
    assert ece > 100000  # the toy scorer is badly miscalibrated, ECE > 0.1


def test_gini_split_screen_finds_year_signal(spark):
    """Numpy replay of root/split impurities per feature. This synthetic
    generator assigns status independently of every feature (unlike real
    TPC-H, where date determines it), so the honest reading the screen
    must report is: all gains ~ 0."""
    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_gini_split_screen"](spark, SF)
        .toPandas()
        .set_index("feature")
    )
    con = duckdb.connect()
    base = con.execute(
        f"""
        SELECT o.o_orderstatus AS y, o.o_orderpriority AS priority,
               month(o.o_orderdate) AS month, year(o.o_orderdate) AS year,
               c.c_mktsegment AS segment
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        """
    ).df()
    n = len(base)
    root = 1 - sum((c / n) ** 2 for c in base.y.value_counts())
    for feat in ["priority", "month", "year", "segment"]:
        split = 0.0
        for _, g in base.groupby(feat):
            cc = g.y.value_counts()
            split += (cc * cc).sum() / len(g)
        split = 1 - split / n
        row = pdf.loc[feat]
        assert row.n_values == base[feat].nunique()
        assert abs(row.gini_split - split) < 5.1e-5
        assert abs(row.gini_root - root) < 5.1e-5
        assert abs(row.gini_gain - (root - split)) < 1.1e-4
    for feat in ["priority", "month", "year", "segment"]:
        assert 0 <= pdf.loc[feat].gini_gain < 0.01  # independence: no signal


def test_js_drift_identities(spark):
    """JS/TV identities: both vanish on identical halves, JS ≤ 1 bit,
    TV ≥ 0, and a numpy replay reproduces both for every type; the null
    regime (value independent of the calendar) keeps them small."""
    import duckdb
    import numpy as np

    pdf = (
        aggregates.QUERIES["agg_js_drift"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    con = duckdb.connect()
    cells = con.execute(
        f"""
        SELECT event_type, least(9, CAST(floor(value / 50) AS INT)) AS bin,
               sum(CASE WHEN epoch_ns(ts) // 1000 < 1705363200000000
                        THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN epoch_ns(ts) // 1000 < 1705363200000000
                        THEN 0 ELSE 1 END) AS b
        FROM '{SF}/events.parquet' GROUP BY 1, 2
        """
    ).df()
    for et, g in cells.groupby("event_type"):
        A, B = int(g.a.sum()), int(g.b.sum())
        js = 0.0
        tv_num = 0
        for _, r in g.iterrows():
            a, b = int(r.a), int(r.b)
            den = a * B + b * A
            if a > 0:
                js += 0.5 * (a / A) * np.log2(2 * a * B / den)
            if b > 0:
                js += 0.5 * (b / B) * np.log2(2 * b * A / den)
            tv_num += abs(a * B - b * A)
        row = pdf.loc[et]
        assert (row.n_first, row.n_second) == (A, B)
        assert abs(row.js_bits - js) < 5.1e-5
        assert row.tv_micro == 1000000 * tv_num // (2 * A * B)
        assert 0 <= row.js_bits <= 1.0 and row.js_bits < 0.05
        assert 0 <= row.tv_micro < 200000


def test_kendall_tau_bounds_and_pair_budget(spark):
    """|τ-b| ≤ 1 and C+D+Tx+Ty can never exceed n(n−1)/2 pairs (both-tied
    pairs are the only ones outside all four buckets)."""
    import pandas as pd

    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["m"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    n_months = o.groupby("o_orderpriority").m.nunique().to_dict()
    rows = aggregates.QUERIES["agg_kendall_tau"](spark, SF).collect()
    assert len(rows) == len(n_months)
    for r in rows:
        n = n_months[r.o_orderpriority]
        assert (
            r.concordant + r.discordant + r.ties_x + r.ties_y <= n * (n - 1) // 2
        )
        assert -1.0 <= r.tau_b <= 1.0


def test_kendall_tau_matches_python_pair_count(spark):
    """Brute-force the pair classification for one priority in Python."""
    import pandas as pd

    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o.o_orderpriority == "5-LOW"].copy()
    o["m"] = pd.to_datetime(o.o_orderdate).dt.year * 12 + pd.to_datetime(
        o.o_orderdate
    ).dt.month
    cents = (o.o_totalprice * 100).round().astype("int64")
    g = pd.DataFrame({"m": o.m, "c": cents}).groupby("m")
    x = g.size()
    y = g.c.sum().floordiv(100)
    ms = sorted(x.index)
    C = D = TX = TY = 0
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            dx = x[ms[j]] - x[ms[i]]
            dy = y[ms[j]] - y[ms[i]]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy != 0:
                TX += 1
            elif dy == 0 and dx != 0:
                TY += 1
    row = next(
        r
        for r in aggregates.QUERIES["agg_kendall_tau"](spark, SF).collect()
        if r.o_orderpriority == "5-LOW"
    )
    assert (row.concordant, row.discordant, row.ties_x, row.ties_y) == (C, D, TX, TY)
    import math

    assert row.tau_b == pytest.approx(
        round((C - D) / math.sqrt((C + D + TX) * (C + D + TY)), 4), abs=1e-9
    )


def test_lorenz_deciles_structure(spark):
    """10 deciles, near-equal counts (±1), shares sum to 1, cum_share is
    non-decreasing and ends at 1, and the curve is convex (later deciles
    carry ≥ earlier shares — spend-sorted bins can't invert)."""
    rows = sorted(
        aggregates.QUERIES["agg_lorenz_deciles"](spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    counts = [r.n_cust for r in rows]
    assert max(counts) - min(counts) <= 1
    assert sum(r.decile_cents for r in rows) > 0
    shares = [r.share for r in rows]
    assert shares == sorted(shares)
    assert rows[-1].cum_share == pytest.approx(1.0, abs=2e-4)
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)


def test_lorenz_deciles_match_pandas_rank(spark):
    """Exact decile cents against a pandas global-sort replay."""
    import pandas as pd

    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    spend = (
        pd.DataFrame({"k": o.o_custkey, "c": cents})
        .groupby("k").c.sum().reset_index()
        .sort_values(["c", "k"]).reset_index(drop=True)
    )
    n = len(spend)
    spend["decile"] = (spend.index * 10) // n + 1
    expect = spend.groupby("decile").c.sum().to_dict()
    got = {
        r.decile: r.decile_cents
        for r in aggregates.QUERIES["agg_lorenz_deciles"](spark, SF).collect()
    }
    assert got == expect


def test_eb_shrinkage_blend_properties(spark):
    """The m-estimate must land between the raw rate and the prior for
    every customer (floor-division tolerance 1 micro-unit), shrink MORE
    for smaller n, and reproduce the exact integer blend."""
    pdf = aggregates.QUERIES["agg_eb_shrinkage"](spark, SF).toPandas()
    prior = int(pdf.prior_micro.iloc[0])
    assert (pdf.prior_micro == prior).all()
    lo = pdf[["raw_rate_micro"]].assign(p=prior).min(axis=1) - 1
    hi = pdf[["raw_rate_micro"]].assign(p=prior).max(axis=1) + 1
    assert (pdf.shrunk_rate_micro >= lo).all()
    assert (pdf.shrunk_rate_micro <= hi).all()
    expect = (pdf.n_f * 1_000_000 + prior * 20) // (pdf.n_orders + 20)
    assert (pdf.shrunk_rate_micro == expect).all()


def test_sprt_trajectory_python_replay(spark):
    """Replay the daily SPRT walk in plain Python: the cumulative LLR,
    the per-day decision, and the unique first-crossing flag must all
    match; the trajectory must also equal the per-event walk's
    end-of-day values by LLR additivity."""
    import duckdb

    pdf = (
        aggregates.QUERIES["agg_sprt_sequential"](spark, SF)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    daily = duckdb.sql(
        """
        SELECT CAST(ts AS DATE) AS day, count(*) AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
        FROM '/root/testdata/sf0.01/events.parquet'
        WHERE (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
               % 10) >= 5
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    cum, first_seen = 0, None
    for i, r in enumerate(daily.itertuples()):
        cum += int(r.s) * 200_671 + (int(r.n) - int(r.s)) * -50_010
        row = pdf.iloc[i]
        assert row.cum_llr_micro == cum
        dec = (
            "accept_h1" if cum >= 2_944_439
            else "accept_h0" if cum <= -2_944_439
            else "continue"
        )
        assert row.decision == dec
        if dec != "continue" and first_seen is None:
            first_seen = row.day
        assert bool(row.is_first_crossing) == (
            dec != "continue" and row.day == first_seen
        )
    assert pdf.is_first_crossing.sum() <= 1


def test_anova_f_python_replay(spark):
    """Recompute the one-way ANOVA from raw cents in plain Python
    (exact integer moments, float only at the SS divisions — the same
    surface the operator declares) and match every output column."""
    import duckdb

    pdf = aggregates.QUERIES["agg_anova_f"](spark, SF).toPandas()
    g = duckdb.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
                   AS s1,
               sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
                   * CAST(round(o_totalprice * 100) AS BIGINT)) AS s2
        FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY 1
        """
    ).df()
    k = len(g)
    n_total = int(g.n.sum())
    s1_all = float(g.s1.sum())
    ssb = sum(float(r.s1) ** 2 / r.n for r in g.itertuples()) / 10000 - (
        s1_all**2 / n_total
    ) / 10000
    ssw = sum(
        float(r.s2) / 10000 - float(r.s1) ** 2 / r.n / 10000
        for r in g.itertuples()
    )
    row = pdf.iloc[0]
    assert len(pdf) == 1
    assert (row.n_groups, row.n_total) == (k, n_total)
    assert (row.df_between, row.df_within) == (k - 1, n_total - k)
    # relative tolerance: the replay's float summation order differs from
    # the engines' (which agree with each other bit-for-bit) in the last
    # few ulps of the ~1e10 sums of squares
    assert abs(row.ms_between - ssb / (k - 1)) < 1e-6 * abs(row.ms_between)
    assert abs(row.ms_within - ssw / (n_total - k)) < 1e-6 * abs(row.ms_within)
    f = (ssb / (k - 1)) / (ssw / (n_total - k))
    assert abs(row.f_stat - f) < 1e-3
    assert row.ms_within > 0


def test_ljung_box_composes_exactly_on_acf(spark):
    """Recompute Q from the REGISTERED agg_acf_lags output with integer
    arithmetic: composition means the two keys can never disagree; the
    verdict must match the fixed χ²(7) critical constant."""
    acf = aggregates.QUERIES["agg_acf_lags"](spark, SF).toPandas()
    lb = aggregates.QUERIES["agg_ljung_box"](spark, SF).toPandas()
    n = int((acf.n_terms + acf.lag).max())
    q = sum(
        (n * (n + 2) * int(r.acf_micro) ** 2) // ((n - int(r.lag)) * 1_000_000)
        for r in acf.itertuples()
    )
    row = lb.iloc[0]
    assert len(lb) == 1
    assert (row.df, row.n_obs) == (len(acf), n)
    assert row.q_micro == q
    assert row.crit_micro == 14_067_140
    assert bool(row.reject_white_noise) == (q > 14_067_140)


def test_quantile_sketch_geometry_ladder(spark):
    """Planner-table invariants at sf0.01 (every group n > 512): (a) state
    cost is exactly 5·K per rung — the ladder cut really is a prefix of
    one shared rank; (b) error at the K=512 rung equals the two-level
    shard merge of agg_quantile_sketch_merge (bottom-k algebra: the
    one-level cut and the 128-per-shard merge keep the SAME global
    bottom-512, so their read-outs must agree exactly); (c) the K=512
    rung is at least as accurate as the K=16 rung on both quantiles."""
    geom = {
        r.k_cap: r
        for r in aggregates.QUERIES["plan_quantile_sketch_geometry"](
            spark, SF
        ).collect()
    }
    assert sorted(geom) == [16, 32, 64, 128, 256, 512]
    for k_cap, r in geom.items():
        assert r.sample_rows == 5 * k_cap, r
    merge_rows = aggregates.QUERIES["agg_quantile_sketch_merge"](
        spark, SF
    ).collect()
    worst50 = max(r.err_p50_permille for r in merge_rows)
    worst90 = max(r.err_p90_permille for r in merge_rows)
    assert geom[512].max_err_p50_permille == worst50
    assert geom[512].max_err_p90_permille == worst90
    assert geom[512].max_err_p50_permille <= geom[16].max_err_p50_permille
    assert geom[512].max_err_p90_permille <= geom[16].max_err_p90_permille


def test_hll_deterministic_error_and_merge_bound(spark):
    """agg_hll_deterministic's raw Flajolet estimate must sit inside the
    m=64 theory envelope (σ ≈ 1.04/√64 ≈ 13%; allow 3σ ≈ 40% — the raw
    estimator also biases high below the 2.5m small-range threshold,
    which the sf0.01 cardinalities straddle), and the register state must
    be sane: v_zero registers in [0, 64) and estimate strictly positive.
    The hash oracle already proves shard-merge ≡ one-pass; this pins the
    STATISTICAL claim the sketch exists for."""
    rows = aggregates.QUERIES["agg_hll_deterministic"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.v_zero < 64
        assert r.est_raw > 0
        rel = abs(r.est_raw - r.n_exact) / r.n_exact
        assert rel <= 0.40, (
            f"{r.event_type}: HLL rel error {rel:.3f} outside the 3σ "
            f"envelope (est {r.est_raw} vs exact {r.n_exact})"
        )
