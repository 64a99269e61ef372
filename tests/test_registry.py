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
# keys each round. Pin the round-7 window so a module reorder or priority-list
# edit can't silently re-verify already-green keys and waste a round.
#
# Composition: the FIRST 50 of the 62 round-5 additions that remained after
# the round-6 window (`_ADDED_R5` queue order as of the round-6 snapshot) —
# none has ever had a driver row (VERDICT r6 item 1). No re-verification
# slots this round: no driver-green key was rewritten after its latest
# green row.
EXPECTED_R7_WINDOW = [
    "join_spatial_grid",
    "graph_label_propagation",
    "agg_quantile_sketch",
    "events_path_trigrams",
    "events_cohort_ltv",
    "scan_time_travel",
    "sink_wap_publish",
    "join_temporal_scd2",
    "events_funnel_latency",
    "events_bounce_rate",
    "text_zipf_slope",
    "sim_pq_quantize",
    "graph_k_core",
    "agg_seasonality_dow",
    "multimodal_shard_plan",
    "events_new_vs_returning",
    "sim_adc_search",
    "events_feature_pit",
    "text_dedup_paragraph_chunks",
    "agg_ratio_delta_method",
    "etl_data_vault",
    "text_bpe_train",
    "sql_parameterized",
    "scan_partition_evolution",
    "sim_truncated_dims_eval",
    "etl_reconcile_buckets",
    "agg_ab_power_mde",
    "events_peak_concurrency",
    "agg_rollforward_balance",
    "events_cumulative_reach",
    "agg_yoy_growth",
    "sample_importance_estimate",
    "graph_assortativity",
    "win_hampel_filter",
    "events_velocity_flags",
    "text_lm_backoff_score",
    "agg_kmv_set_ops",
    "agg_did_uplift",
    "win_rolling_slope",
    "events_survival_km",
    "text_langid_confusion",
    "sample_negatives",
    "join_null_safe",
    "etl_late_dim_unknown",
    "sim_cluster_purity",
    "sql_recursive_cte",
    "udf_grouped_train",
    "sim_hybrid_rrf",
    "events_forecast_backtest",
    "win_holt_linear",
]

# ROUND-8 endgame, pre-pinned (VERDICT r6 item 4): once the r7 window lands
# green these 21 keys are the ENTIRE remaining unverified tail — the 12
# `_ADDED_R5` stragglers then the 9 `_ADDED_R6` keys, in stable queue
# order. The round-8 rotation promotes them (plus any `_ADDED_R7` keys) to
# the window head; spare slots go to re-verification of post-green rewrites.
EXPECTED_R8_PREFIX = [
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
]


def test_round7_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R7_WINDOW


def test_round8_prefix_queues_directly_behind_window():
    """The 21-key round-8 tail sits immediately after the window (before any
    _ADDED_R7 keys), so the final rotation is a mechanical promotion."""
    assert list(queries())[50:71] == EXPECTED_R8_PREFIX


def test_round7_window_is_fresh():
    """Every round-7 window slot must be a key with NO prior driver row —
    the window only spends slots converting emulation-only keys to driver
    truth (VERDICT r6 item 1)."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return  # correctness files absent (fresh checkout) — nothing to check
    stale = (set(EXPECTED_R7_WINDOW) | set(EXPECTED_R8_PREFIX)) & verified
    assert not stale, f"window wastes slots on already-verified keys: {sorted(stale)}"


def test_round7_queue_covers_every_unverified_key():
    """window ∪ round-8 prefix ∪ _ADDED_R7 must be exactly the keys without
    a driver row, so rounds 7-8 converge to full driver coverage."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05", "06"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return
    from data_integration_exercise_spark.registry import _ADDED_R7

    unverified = set(queries()) - verified
    queue = set(EXPECTED_R7_WINDOW) | set(EXPECTED_R8_PREFIX) | set(_ADDED_R7)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R7"
    )


def test_queries_count_matches_survey_addendum():
    """SURVEY §8 documents the registry totals; keep them in sync."""
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"Registry totals: \*\*(\d+) queries, (\d+) hash-oracled\*\*", survey)
    assert m, "SURVEY §8 registry-totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(queries()), len(oracle_sql()))
