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
# keys each round. Pin the round-10 window so a module reorder or
# priority-list edit can't silently re-verify already-green keys and waste
# a round.
#
# Composition (executes the pre-pinned round-9 plan, VERDICT r9 item 2):
# slots 1-36 are ALL remaining never-driver-verified keys (the 36 round-8
# additions, stable queue order); slots 37-50 re-verify the 14 oldest
# r1-green keys (the previous 13 oldest were re-checked in the r8/r9
# windows).
EXPECTED_R10_WINDOW = [
    "events_interarrival_stats",
    "events_capture_recapture",
    "agg_cramers_v",
    "win_pettitt_changepoint",
    "win_sax_paa",
    "text_readability",
    "mine_frequent_triples",
    "sim_centroid_classify",
    "events_markov_entropy",
    "agg_mutual_information",
    "agg_ks_drift_bh",
    "text_rake_keyphrases",
    "text_spearman_length_vocab",
    "events_burst_kleinberg",
    "sim_silhouette_eval",
    "agg_tukey_fences",
    "agg_calibration_ece",
    "win_bollinger_bands",
    "graph_neighborhood_function",
    "join_asof_nearest",
    "agg_gini_split_screen",
    "agg_js_drift",
    "sample_kfold_assignments",
    "text_lexical_overlap",
    "stream_topk_per_window",
    "events_tier_migration",
    "tpch_q5_local_supplier",
    "win_rsi",
    "agg_kendall_tau",
    "text_bigram_richness",
    "graph_trade_reciprocity",
    "sample_systematic",
    "events_markov_eval",
    "agg_lorenz_deciles",
    "graph_scc_condensation",
    "sim_kmeans_lloyd",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_stats",
    "agg_percentiles",
    "agg_conditional",
    "agg_pivot",
    "agg_collect_sorted",
    "agg_min_max_by",
    "agg_first_last",
    "agg_histogram",
    "agg_mode_deterministic",
    "agg_corr_matrix",
]

# The deliberate re-verification tail of the window (slots 37-50): keys
# that ALREADY have a green driver row but have gone unchecked since
# round 1.
_R10_REVERIFY = set(EXPECTED_R10_WINDOW[36:])


def test_round10_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R10_WINDOW


def test_round10_window_head_is_fresh():
    """Window slots 1-36 must be keys with NO prior driver row — those slots
    only convert emulation-only keys to driver truth; the re-verification
    tail (slots 37-50) is the only place already-green keys may appear."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return  # correctness files absent (fresh checkout) — nothing to check
    stale = set(EXPECTED_R10_WINDOW[:36]) & verified
    assert not stale, f"window head wastes slots on already-verified keys: {sorted(stale)}"


def test_round10_window_covers_every_unverified_key():
    """window head ∪ _ADDED_R10 must be exactly the keys without a driver
    row, so round 10 converges to full driver coverage."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return
    from data_integration_exercise_spark.registry import _ADDED_R10

    unverified = set(queries()) - verified
    queue = set(EXPECTED_R10_WINDOW[:36]) | set(_ADDED_R10)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R10"
    )


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
