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
# keys each round. Pin the round-6 window so a module reorder or priority-list
# edit can't silently re-verify already-green keys and waste a round.
#
# Composition: the FIRST 50 of the 112 round-5 additions (`_ADDED_R5` queue
# order as of the round-5 snapshot) — none has ever had a driver row
# (VERDICT r5 item 1). No re-verification slots this round: no driver-green
# key was rewritten after its latest green row.
EXPECTED_R6_WINDOW = [
    "agg_ks_test",
    "agg_chi_square",
    "agg_mann_whitney",
    "win_ewma",
    "graph_link_prediction",
    "etl_gdpr_cascade",
    "text_pii_scrub",
    "multimodal_phash_dedup",
    "agg_heavy_hitters",
    "win_cusum_drift",
    "events_attribution",
    "events_anomaly_mad",
    "join_interval_overlap",
    "sample_priority_topk",
    "dedup_semdedup",
    "join_bloom_prefilter",
    "dedup_soft_weights",
    "sim_mmr_diversify",
    "agg_bootstrap_ci",
    "sample_balanced_classes",
    "etl_cdc_deletes",
    "text_ccnet_buckets",
    "pipeline_corpus_curate",
    "stream_cdc_upsert",
    "sink_zorder",
    "graph_bfs_distances",
    "scan_manifest_pruned",
    "sample_temperature_mix",
    "agg_benford_deviation",
    "events_dau_wau",
    "etl_incremental_agg_refresh",
    "sink_idempotent_overwrite",
    "agg_hhi_concentration",
    "events_churn_hazard",
    "sql_adhoc_interface",
    "agg_winsorized_mean",
    "agg_pareto_crossover",
    "win_drawdown",
    "etl_surrogate_keys",
    "sim_recall_eval",
    "text_ngram_novelty",
    "events_bot_detection",
    "etl_table_fingerprint",
    "mine_association_rules",
    "sim_item_neighbors",
    "agg_linear_trend",
    "text_bm25_search",
    "events_rfm_segments",
    "etl_unpivot_melt",
    "agg_count_min_sketch",
]


def test_round6_verification_window_is_pinned():
    assert list(queries())[:50] == EXPECTED_R6_WINDOW


def test_round6_window_is_fresh():
    """Every round-6 window slot must be a key with NO prior driver row —
    the window only spends slots converting emulation-only keys to driver
    truth (VERDICT r5 item 1)."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return  # correctness files absent (fresh checkout) — nothing to check
    stale = set(EXPECTED_R6_WINDOW) & verified
    assert not stale, f"window wastes slots on already-verified keys: {sorted(stale)}"


def test_round6_queue_covers_every_unverified_key():
    """window ∪ _ADDED_R5 remainder ∪ _ADDED_R6 must be exactly the keys
    without a driver row, so rounds 6-8 converge to full driver coverage."""
    import json

    verified = set()
    for r in ("01", "02", "03", "04", "05"):
        try:
            verified |= set(json.load(open(f"/root/repo/CORRECTNESS_r{r}.json")))
        except FileNotFoundError:
            pass
    if not verified:
        return
    from data_integration_exercise_spark.registry import _ADDED_R5, _ADDED_R6

    unverified = set(queries()) - verified
    queue = set(EXPECTED_R6_WINDOW) | set(_ADDED_R5) | set(_ADDED_R6)
    assert queue == unverified, (
        f"queue misses: {sorted(unverified - queue)}; "
        f"wastes slots on: {sorted(queue - unverified)}; "
        "a key added this round must be listed in registry._ADDED_R6"
    )


def test_queries_count_matches_survey_addendum():
    """SURVEY §8 documents the registry totals; keep them in sync."""
    survey = open("/root/repo/SURVEY.md").read()
    m = re.search(r"Registry totals: \*\*(\d+) queries, (\d+) hash-oracled\*\*", survey)
    assert m, "SURVEY §8 registry-totals line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(queries()), len(oracle_sql()))
