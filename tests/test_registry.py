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
# Composition (executes the pre-pinned round-11 plan, registry.py@r11):
# slots 1-4 are ALL remaining never-driver-verified keys from round 11
# (`_ADDED_R11`, stable queue order); slots 5-14 re-verify the ten
# streaming keys whose result-sink plumbing changed in the round-11
# `_sink_scope` fix after their last green rows; slot 15 re-verifies
# `sim_kmeans_lloyd` (post-green `_lloyd_centroids` helper extraction);
# slot 16 is the round-12 addition `agg_quantile_sketch_merge` (new, no
# driver row); slots 17-48 re-verify the 32 non-streaming keys whose
# latest green row is round 2/3; slots 49-50 take the round-4 cohort head.
EXPECTED_R12_WINDOW = [
    "dedup_minhash_openvocab",
    "sim_ann_append",
    "plan_ivf_probe_geometry",
    "stream_ann_ingest",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    "stream_static_join",
    "stream_foreachbatch",
    "stream_stateful_running",
    "stream_cdc_upsert",
    "stream_stream_join",
    "stream_topk_per_window",
    "sim_kmeans_lloyd",
    "agg_quantile_sketch_merge",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_explode",
    "fn_json",
    "fn_map_struct",
    "fn_null_family",
    "fn_hash",
    "text_tokenize_wordcount",
    "text_ngrams",
    "text_lang_stats",
    "text_sentiment_lexicon",
    "sim_ann_lsh",
    "multimodal_join",
    "skyline_pareto",
    "udf_python_scalar",
    "udf_pandas_vectorized",
    "udaf_grouped_agg",
    "udtf_python",
    "win_range_frame",
    "win_first_last_value",
    "sort_multikey",
    "topk_global",
    "limit_offset",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "dedup_exact_rows",
    "text_quality_score",
    "multimodal_decode",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_unshipped",
]

#: window slots holding keys with NO driver row in CORRECTNESS_r01-r11:
#: the four round-11 additions (slots 1-4) and the round-12 sketch (16).
_R12_NEVER_VERIFIED = EXPECTED_R12_WINDOW[:4] + ["agg_quantile_sketch_merge"]


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


def test_round12_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R12_WINDOW


def test_round12_window_never_verified_slots_are_fresh():
    """The never-verified slots must hold keys with NO prior driver row —
    they exist to convert emulation-only keys to driver truth; every other
    slot is deliberate re-verification of keys that already have rows."""
    latest = _driver_rows_through(11)
    if not latest:
        return  # correctness files absent (fresh checkout)
    stale = set(_R12_NEVER_VERIFIED) & set(latest)
    assert not stale, (
        f"never-verified slots waste coverage on already-verified keys: "
        f"{sorted(stale)}"
    )


def test_round12_window_covers_every_unverified_key():
    """never-verified slots ∪ _ADDED_R12 must be exactly the keys without
    a driver row, so round 12 converges to full driver coverage."""
    latest = _driver_rows_through(11)
    if not latest:
        return
    from data_integration_exercise_spark.registry import _ADDED_R12

    unverified = set(queries()) - set(latest)
    queue = set(_R12_NEVER_VERIFIED) | set(_ADDED_R12)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R12"
    )


def test_round12_window_tail_reverifies_stalest_keys():
    """The re-verification slots must target exactly: the sink-scope
    streaming rewrites + the post-green Lloyd refactor + the stalest
    (round-2/3) green cohort — never keys already fresh."""
    latest = _driver_rows_through(11)
    if not latest:
        return
    # explicit rewrite-after-green slots
    assert EXPECTED_R12_WINDOW[4:15] == [
        "stream_sliding",
        "stream_session",
        "stream_watermark_late",
        "stream_dedup",
        "stream_static_join",
        "stream_foreachbatch",
        "stream_stateful_running",
        "stream_cdc_upsert",
        "stream_stream_join",
        "stream_topk_per_window",
        "sim_kmeans_lloyd",
    ]
    # freshness slots: every key whose latest row is round <= 3 must be in
    # the window (the entire former round-2/3 cohort rotates through)
    stale23 = {k for k, r in latest.items() if r <= 3}
    missing = stale23 - set(EXPECTED_R12_WINDOW)
    assert not missing, f"round-2/3-stale keys left out: {sorted(missing)}"


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
