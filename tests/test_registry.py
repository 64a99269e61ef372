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
# keys each round. Pin the round-8 window so a module reorder or priority-list
# edit can't silently re-verify already-green keys and waste a round.
#
# Composition (the endgame rotation, VERDICT r7 item 1): slots 1-32 are ALL
# remaining never-driver-verified keys (12 `_ADDED_R5` stragglers + 9
# `_ADDED_R6` + 11 `_ADDED_R7`, stable queue order); slots 33-37 re-verify
# the five keys rewritten after their latest green row (four round-7
# rewrites + the round-8 `dedup_minhash_lsh` output bounding); slots 38-50
# re-verify the 13 oldest r1-green keys.
EXPECTED_R8_WINDOW = [
    "graph_adamic_adar",
    "agg_cuped_adjusted",
    "dedup_winnowing",
    "graph_modularity",
    "agg_price_volume_mix",
    "text_kl_source_drift",
    "agg_quantile_treatment_effect",
    "join_mutual_best_match",
    "agg_ipf_raking",
    "agg_mann_kendall",
    "sample_neyman_allocation",
    "sim_ndcg_eval",
    "dedup_minhash_keepers",
    "dedup_lsh_pr_eval",
    "sample_token_budget_mix",
    "sink_jsonl_shards",
    "text_bpe_encode",
    "agg_acf_lags",
    "graph_clustering_coefficient",
    "events_window_funnel",
    "etl_partition_backfill_plan",
    "win_stl_decompose",
    "win_theil_sen",
    "agg_srm_check",
    "dedup_threshold_sweep",
    "etl_vacuum_retention_plan",
    "sim_ann_graph",
    "win_holt_winters",
    "events_user_lifecycle",
    "etl_wap_rollback",
    "text_bigram_generate",
    "win_kalman_filter",
    "graph_link_prediction",
    "win_rolling_corr",
    "etl_surrogate_keys",
    "win_zscore_outliers",
    "dedup_minhash_lsh",
    "scan_parquet",
    "scan_projection_pushdown",
    "ingest_csv",
    "ingest_json",
    "sink_parquet",
    "sink_jdbc",
    "sink_partitioned",
    "sink_bucketed",
    "scan_dynamic_pruning",
    "agg_pricing_summary",
    "agg_global",
    "agg_count_distinct",
    "agg_approx_distinct",
]

# The deliberate re-verification tail of the window (slots 33-50): keys that
# ALREADY have a green driver row but either were rewritten afterwards
# (33-37) or have gone unchecked since round 1 (38-50).
_R8_REVERIFY = set(EXPECTED_R8_WINDOW[32:])


def test_round8_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R8_WINDOW


def test_round8_window_head_is_fresh():
    """Window slots 1-32 must be keys with NO prior driver row — those slots
    only convert emulation-only keys to driver truth; the re-verification
    tail (slots 33-50) is the only place already-green keys may appear."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06", "07"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return  # correctness files absent (fresh checkout) — nothing to check
    stale = set(EXPECTED_R8_WINDOW[:32]) & verified
    assert not stale, f"window head wastes slots on already-verified keys: {sorted(stale)}"


def test_round8_window_covers_every_unverified_key():
    """window head ∪ _ADDED_R8 must be exactly the keys without a driver
    row, so round 8 converges to full driver coverage."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06", "07"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return
    from data_integration_exercise_spark.registry import _ADDED_R8

    unverified = set(queries()) - verified
    queue = set(EXPECTED_R8_WINDOW[:32]) | set(_ADDED_R8)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R8"
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
