"""Registry-level invariants: the driver-contract surface must stay sane."""

from __future__ import annotations

import re

from data_integration_exercise_spark.registry import oracle_sql, queries
from data_integration_exercise_spark.schemas import TABLES

ROWS_ONLY_ALLOWED = {
    # approximate or trigger-dependent by design (SURVEY §2 / §8)
    "agg_approx_distinct",
    "agg_hll_sketch_merge",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "stream_watermark_late",
    "stream_foreachbatch",
}


def test_every_oracle_has_a_query():
    assert set(oracle_sql()) <= set(queries())


def test_rows_only_set_is_closed():
    """No query silently loses its oracle: the rows-only set is exactly the
    documented approximate/trigger-dependent ops."""
    assert set(queries()) - set(oracle_sql()) == ROWS_ONLY_ALLOWED


def test_keys_are_well_formed():
    assert all(re.fullmatch(r"[a-z0-9_]+", k) for k in queries())


def test_oracles_reference_known_tables():
    """Every oracle reads at least one pre-registered view (guards against
    typo'd table names the driver's DuckDB would reject)."""
    for k, sql in oracle_sql().items():
        assert any(
            re.search(rf"\b{t}\b", sql) for t in TABLES
        ), f"{k}: oracle references no known table"


def test_no_hugeint_typed_oracle_output_columns():
    """DESCRIBE every oracle through DuckDB at sf0.001 and reject any
    HUGEINT/UBIGINT-typed OUTPUT column. DuckDB types integer sums (and any
    division with a HUGEINT operand) as HUGEINT, which duckdb-pandas fetches
    as float64 while Spark returns int64 — the driver's dtype-sensitive hash
    then splits on identical values (130277 vs 130277.0). This exact class
    caused the repo's only driver hash failure ever (`agg_calibration_ece`,
    r10: the `// sum(n)` denominator lacked the CAST the numerator had).
    The fix discipline: CAST every integer sum/product that reaches an
    output column (or feeds a division) AS BIGINT. ~2 s, no Spark needed."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    offenders = []
    for k, sql in oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in desc:
            if "HUGEINT" in typ.upper() or "UBIGINT" in typ.upper():
                offenders.append((k, col, typ))
    assert not offenders, (
        "oracle output columns DuckDB types wider than BIGINT (pandas will "
        f"fetch these as float64 and the driver hash will split): {offenders}"
    )


def test_spark_and_oracle_dtype_kinds_agree(spark):
    """Static cross-engine dtype-kind check (no data execution): for every
    hash-oracled key, Spark's LAZY result schema and DuckDB's DESCRIBE of
    the oracle must agree per column on the int-vs-float axis. The driver
    fetches both sides into pandas and hashes stringified values per dtype,
    so a BIGINT-vs-DOUBLE split fails its hash even when every value is
    numerically identical (the r10 `agg_calibration_ece` failure mode).
    The HUGEINT lint above catches the DuckDB-widening subclass; this test
    catches the whole class — including a Spark-side double against an
    integer oracle — in one schema-only sweep (~2.5 min, plan time only)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    int_spark = {"byte", "short", "integer", "long"}
    float_spark = {"float", "double"}

    def spark_kind(dt):
        n = dt.typeName()
        return "i" if n in int_spark else "f" if n in float_spark else "o"

    def duck_kind(t):
        t = t.upper()
        if any(x in t for x in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                "HUGEINT", "UBIGINT", "UINTEGER")):
            return "i"
        if any(x in t for x in ("FLOAT", "DOUBLE", "REAL")):
            return "f"
        return "o"

    qs = queries()
    mismatched = []
    for k, sql in oracle_sql().items():
        sp = {f.name: spark_kind(f.dataType) for f in qs[k](spark, sf).schema.fields}
        du = {c: duck_kind(t) for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall()}
        for c in sp:
            if c in du and {sp[c], du[c]} == {"i", "f"}:
                mismatched.append((k, c, f"spark={sp[c]}", f"duck={du[c]}"))
    assert not mismatched, (
        "int-vs-float dtype splits the driver hash would fail on: "
        f"{mismatched}"
    )


def test_no_unrounded_float_aggregates_in_oracles():
    """Float-hash discipline: any avg(/stddev/corr/covar) in an oracle must
    sit inside a round() — raw float aggregates are summation-order traps."""
    for k, sql in oracle_sql().items():
        for m in re.finditer(r"(?<!_)(avg|stddev_samp|var_samp|corr|covar_samp)\(", sql):
            prefix = sql[: m.start()]
            # crude but effective: a round( must be open at this point
            assert prefix.count("round(") > prefix.count(")") - prefix.count("("), (
                f"{k}: unrounded float aggregate near …{sql[m.start():m.start() + 40]!r}"
            )


# The driver's correctness harness oracles exactly the first 50 queries()
# keys each round. Pin the round-11 window so a module reorder or
# priority-list edit can't silently re-verify already-green keys and waste
# a round.
#
# Composition (executes the pre-pinned round-10 plan, amended per VERDICT
# r10 item 1): slots 1-23 are ALL remaining never-driver-verified keys (the
# 23 round-10 additions, stable queue order); slots 24-25 re-verify the two
# graph keys rewritten after their last green rows (round-10 shared-edges
# refactor); slot 26 re-verifies `agg_calibration_ece` — the repo's
# first-ever driver hash failure (r10; HUGEINT-typed oracle division →
# float64 vs Spark int64, fixed by casting the denominator); slots 27-49
# re-verify the 23 keys whose latest green row is round 1; slot 50 takes
# the head of the round-2/3 cohort.
EXPECTED_R11_WINDOW = [
    "plan_lsh_band_geometry",
    "stream_dedup_minhash",
    "dedup_exact_substring_coverage",
    "sample_coreset_kcenter",
    "etl_dp_release",
    "win_matrix_profile",
    "graph_hits",
    "etl_k_anonymity",
    "events_shapley_attribution",
    "text_chao1_richness",
    "win_dtw_pairs",
    "sample_pps_systematic",
    "agg_eb_shrinkage",
    "agg_sprt_sequential",
    "events_eventually_follows",
    "text_burstiness",
    "agg_bitmap_distinct",
    "sample_ht_estimate",
    "graph_ppr",
    "text_heaps_curve",
    "agg_anova_f",
    "agg_ljung_box",
    "agg_tost_equivalence",
    "graph_modularity",
    "graph_label_propagation",
    "agg_calibration_ece",
    "proj_select_alias",
    "filter_compound",
    "filter_in_between",
    "filter_like",
    "filter_null_handling",
    "proj_case_when",
    "proj_cast",
    "join_inner_equi",
    "join_broadcast_dim",
    "join_multiway_star",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_range",
    "join_asof",
    "join_skew_salted",
    "win_topn_per_group",
    "win_ranking",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "stream_tumbling",
]

# The deliberate re-verification tail of the window: keys that ALREADY have
# a driver row (green, or red-with-verified-fix for agg_calibration_ece).
_R11_REVERIFY = set(EXPECTED_R11_WINDOW[23:])


def test_round11_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R11_WINDOW


def test_round11_window_head_is_fresh():
    """Window slots 1-23 must be keys with NO prior driver row — those slots
    only convert emulation-only keys to driver truth; the re-verification
    tail (slots 24-50) is the only place keys with driver rows may appear."""
    import json

    verified = set()
    for r in range(1, 11):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r:02d}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return  # correctness files absent (fresh checkout) — nothing to check
    stale = set(EXPECTED_R11_WINDOW[:23]) & verified
    assert not stale, f"window head wastes slots on already-verified keys: {sorted(stale)}"


def test_round11_window_covers_every_unverified_key():
    """window head ∪ _ADDED_R11 must be exactly the keys without a driver
    row, so round 11 converges to full driver coverage."""
    import json

    verified = set()
    for r in range(1, 11):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r:02d}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return
    from data_integration_exercise_spark.registry import _ADDED_R11

    unverified = set(queries()) - verified
    queue = set(EXPECTED_R11_WINDOW[:23]) | set(_ADDED_R11)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R11"
    )


def test_round11_window_tail_reverifies_stalest_keys():
    """The re-verification tail must target exactly: the post-green rewrites
    + the r10 red key + the stalest green cohort — never keys already fresh."""
    import json

    latest = {}
    for r in range(1, 11):
        try:
            d = json.load(open(f"/root/repo/CORRECTNESS_r{r:02d}.json"))
        except FileNotFoundError:
            continue
        for k in d:
            latest[k] = r
    if not latest:
        return
    tail = EXPECTED_R11_WINDOW[23:]
    # explicit slots: rewritten-after-green graphs + the r10 hash failure
    assert tail[:3] == [
        "graph_modularity",
        "graph_label_propagation",
        "agg_calibration_ece",
    ]
    # freshness slots: every key whose latest row is round 1 must be present
    round1 = {k for k, r in latest.items() if r == 1}
    assert round1 <= set(tail), f"round-1-stale keys left out: {sorted(round1 - set(tail))}"


def test_queries_count_matches_survey_addendum():
    """SURVEY §8 documents the registry totals; keep them in sync."""
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"Registry totals: \*\*(\d+) queries, (\d+) hash-oracled\*\*", survey)
    assert m, "SURVEY §8 registry-totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(queries()), len(oracle_sql()))


def test_every_registered_key_documented_in_survey():
    """Every registered key must have its own backticked mention in
    SURVEY.md (§2 inventory or a §8+ addendum row) — the totals-only check
    above let `win_kalman_filter` land undocumented in the round-7 snapshot
    commit (VERDICT r7 "What's wrong" #1). A bare matching total is not
    documentation; this fails on the first undocumented key."""
    survey = open("/root/repo/SURVEY.md").read()
    undocumented = [k for k in queries() if f"`{k}`" not in survey]
    assert not undocumented, (
        "registered keys missing a SURVEY.md row/mention (add a §8-style "
        f"table row in the same commit that registers them): {undocumented}"
    )
