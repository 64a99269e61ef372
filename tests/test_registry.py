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
# keys each round. Pin the round-14 window so a module reorder or
# priority-list edit can't silently re-verify already-green keys and waste
# a round.
#
# Composition (executes the pre-pinned round-13 plan, registry.py@r13
# `_ADDED_R13` block comment): slots 1-3 are ALL remaining
# never-driver-verified keys (`_ADDED_R13`, stable queue order); slots 4-5
# re-verify `sim_adc_search` / `sim_ndcg_eval` after the post-green
# round-13 `_PQ_ADC_CTE` extraction staled their fingerprints; slots 6-9
# re-verify the round-4 tail; slots 10-50 re-verify the stalest green
# cohort — the first 41 round-5 keys, stable registry order (the last 5
# queue as the round-15 head).
EXPECTED_R14_WINDOW = [
    "stream_watermark_deterministic",
    "sim_ann_ivfadc",
    "agg_hll_deterministic",
    "sim_adc_search",
    "sim_ndcg_eval",
    "sample_train_valid_test",
    "diag_skew_keys",
    "graph_pagerank",
    "graph_degree_distribution",
    "plan_cbo_stats",
    "plan_exchange_reuse",
    "plan_runtime_filter",
    "plan_adaptive_threshold_join",
    "sink_compacted",
    "sink_orc",
    "sink_clustered",
    "etl_upsert_latest",
    "etl_scd2_intervals",
    "etl_data_profile",
    "etl_calendar_spine",
    "etl_schema_evolution",
    "etl_dq_checks",
    "etl_forward_fill",
    "etl_pii_mask",
    "etl_snapshot_diff",
    "events_funnel",
    "events_retention_cohorts",
    "events_sessionize",
    "events_entropy_mix",
    "events_markov_transitions",
    "multimodal_resize",
    "multimodal_framesample",
    "multimodal_audio_energy",
    "text_gopher_quality",
    "text_repetition_stats",
    "text_domain_mix",
    "text_hashing_vectorizer",
    "text_bigram_lm_score",
    "sample_mix_rebalance",
    "dedup_containment_bigram",
    "dedup_incremental",
    "sim_nearest_centroid",
    "sim_embedding_hygiene",
    "agg_gini_segments",
    "agg_ab_ttest",
    "graph_triangle_count",
    "dedup_near_jaccard",
    "dedup_simhash",
    "dedup_connected_components",
    "sim_topk_cosine",
]

#: window slots holding keys with NO driver row in CORRECTNESS_r01-r13:
#: the three round-13 additions (slots 1-3).
_R14_NEVER_VERIFIED = EXPECTED_R14_WINDOW[:3]


def _driver_rows_through(last_round: int) -> dict:
    """key -> latest round with a driver row, across CORRECTNESS_r01..rN."""
    import json

    latest = {}
    for r in range(1, last_round + 1):
        try:
            d = json.load(open(f"/root/repo/CORRECTNESS_r{r:02d}.json"))
        except FileNotFoundError:
            continue
        for k in d:
            latest[k] = r
    return latest


def test_round14_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R14_WINDOW


def test_round14_window_never_verified_slots_are_fresh():
    """The never-verified slots must hold keys with NO prior driver row —
    they exist to convert emulation-only keys to driver truth; every other
    slot is deliberate re-verification of keys that already have rows."""
    latest = _driver_rows_through(13)
    if not latest:
        return  # correctness files absent (fresh checkout)
    stale = set(_R14_NEVER_VERIFIED) & set(latest)
    assert not stale, (
        f"never-verified slots waste coverage on already-verified keys: "
        f"{sorted(stale)}"
    )


def test_round14_window_covers_every_unverified_key():
    """never-verified slots ∪ _ADDED_R14 must be exactly the keys without
    a driver row, so round 14 converges to full driver coverage."""
    latest = _driver_rows_through(13)
    if not latest:
        return
    from data_integration_exercise_spark.registry import _ADDED_R14

    unverified = set(queries()) - set(latest)
    queue = set(_R14_NEVER_VERIFIED) | set(_ADDED_R14)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R14"
    )


def test_round14_window_tail_reverifies_stalest_keys():
    """The re-verification slots must target exactly: the two post-green
    `_PQ_ADC_CTE` rewrites + the stalest (round-4/round-5) green cohort —
    never keys already fresh."""
    latest = _driver_rows_through(13)
    if not latest:
        return
    # explicit rewrite-after-green slots
    assert EXPECTED_R14_WINDOW[3:5] == ["sim_adc_search", "sim_ndcg_eval"]
    # freshness slots: every key whose latest row is round <= 5 must be in
    # the window or the pinned round-15 head (the 5-key round-5 tail)
    from data_integration_exercise_spark.registry import _VERIFIED_R5

    stale5 = {k for k, r in latest.items() if r <= 5}
    missing = stale5 - set(EXPECTED_R14_WINDOW) - set(_VERIFIED_R5)
    assert not missing, f"round-5-stale keys left out: {sorted(missing)}"
    assert len(_VERIFIED_R5) == 5


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
