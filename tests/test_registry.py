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
# keys each round. Pin the round-13 window so a module reorder or
# priority-list edit can't silently re-verify already-green keys and waste
# a round.
#
# Composition (executes the pre-pinned round-12 plan, registry.py@r12
# `_ADDED_R12` block comment): slots 1-6 are ALL remaining
# never-driver-verified keys (`_ADDED_R12`, stable queue order); slot 7
# re-verifies `dedup_minhash_openvocab` after its post-green round-13
# size-bound-prefilter rewrite (VERDICT r12 item 5); slots 8-50 re-verify
# the stalest cohort — the first 43 round-4 keys, stable registry order
# (the last 4 queue as the round-14 head).
EXPECTED_R13_WINDOW = [
    "sample_weighted_reservoir",
    "etl_rendezvous_shard",
    "stream_quantile_ingest",
    "plan_quantile_sketch_geometry",
    "sample_epoch_shuffle",
    "sample_token_stream_batches",
    "dedup_minhash_openvocab",
    "tpch_q4_order_priority",
    "tpch_q6_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cardinality",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_dominant_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_customers",
    "agg_weighted_median",
    "agg_hll_sketch_merge",
    "win_gaps_islands",
    "win_percent_of_total",
    "win_ntile_distribution",
    "fn_bitwise",
    "fn_regexp",
    "ingest_csv_permissive",
    "text_token_count",
    "text_fingerprint",
    "text_keywords_topk",
    "text_pmi_cooccurrence",
    "text_pack_sequences",
    "text_chunk_overlap",
    "dedup_ngram_jaccard",
    "dedup_fuzzy_levenshtein",
    "dedup_embedding_cosine",
    "dedup_contamination_ngram",
    "sim_ann_ivf",
    "sim_quantized_cosine",
    "udf_pandas_iterator",
    "udf_map_in_arrow",
    "sample_hash_mod",
    "sample_stratified",
    "sample_k_per_stratum",
]

#: window slots holding keys with NO driver row in CORRECTNESS_r01-r12:
#: the six round-12 additions (slots 1-6).
_R13_NEVER_VERIFIED = EXPECTED_R13_WINDOW[:6]


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


def test_round13_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R13_WINDOW


def test_round13_window_never_verified_slots_are_fresh():
    """The never-verified slots must hold keys with NO prior driver row —
    they exist to convert emulation-only keys to driver truth; every other
    slot is deliberate re-verification of keys that already have rows."""
    latest = _driver_rows_through(12)
    if not latest:
        return  # correctness files absent (fresh checkout)
    stale = set(_R13_NEVER_VERIFIED) & set(latest)
    assert not stale, (
        f"never-verified slots waste coverage on already-verified keys: "
        f"{sorted(stale)}"
    )


def test_round13_window_covers_every_unverified_key():
    """never-verified slots ∪ _ADDED_R13 must be exactly the keys without
    a driver row, so round 13 converges to full driver coverage."""
    latest = _driver_rows_through(12)
    if not latest:
        return
    from data_integration_exercise_spark.registry import _ADDED_R13

    unverified = set(queries()) - set(latest)
    queue = set(_R13_NEVER_VERIFIED) | set(_ADDED_R13)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R13"
    )


def test_round13_window_tail_reverifies_stalest_keys():
    """The re-verification slots must target exactly: the post-green
    openvocab prefilter rewrite + the stalest (round-4) green cohort —
    never keys already fresh."""
    latest = _driver_rows_through(12)
    if not latest:
        return
    # explicit rewrite-after-green slot
    assert EXPECTED_R13_WINDOW[6] == "dedup_minhash_openvocab"
    # freshness slots: every key whose latest row is round <= 4 must be in
    # the window or the pinned round-14 head (the 4-key round-4 tail)
    from data_integration_exercise_spark.registry import _VERIFIED_R4

    stale4 = {k for k, r in latest.items() if r <= 4}
    missing = stale4 - set(EXPECTED_R13_WINDOW) - set(_VERIFIED_R4)
    assert not missing, f"round-4-stale keys left out: {sorted(missing)}"
    assert len(_VERIFIED_R4) == 4


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
