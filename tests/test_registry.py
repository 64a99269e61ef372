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
# keys each round. Pin the round-4 window so a module reorder or priority-list
# edit can't silently re-verify already-green keys and waste a round.
EXPECTED_R4_WINDOW = [
    "tpch_q2_min_cost_supplier",
    "tpch_q3_unshipped",
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
    "stream_stream_join",
    "udf_pandas_iterator",
    "udf_map_in_arrow",
    "sample_hash_mod",
    "sample_stratified",
    "sample_k_per_stratum",
    "sample_train_valid_test",
    "diag_skew_keys",
    "graph_pagerank",
    "graph_degree_distribution",
]


def test_round4_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R4_WINDOW


def test_round4_window_is_disjoint_from_prior_green_rounds():
    """Every key in the round-4 window must be one the driver has never
    oracled (rounds 1-3 covered two disjoint 50-key windows)."""
    import json

    verified = set()
    for r in ("01", "02", "03"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    overlap = set(EXPECTED_R4_WINDOW) & verified
    assert not overlap, f"window wastes verification on already-green keys: {sorted(overlap)}"


def test_queries_count_matches_survey_addendum():
    """SURVEY §8 documents the registry totals; keep them in sync."""
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"Registry totals: \*\*(\d+) queries, (\d+) hash-oracled\*\*", survey)
    assert m, "SURVEY §8 registry-totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(queries()), len(oracle_sql()))
