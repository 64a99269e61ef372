"""Aggregated operator registry — the single source for the driver contract.

``queries()`` / ``oracle_sql()`` here are re-exported by /root/repo/
__spark_entry__.py. Every SURVEY.md §2 inventory row lands in exactly one
operator module below.
"""

from __future__ import annotations

from .functions import scalar
from .operators import (
    aggregates,
    analytics,
    behavioral,
    curation,
    etl,
    graph,
    joins,
    mining,
    pipeline,
    projections,
    sampling,
    setops,
    similarity,
    sorts,
    text,
    udfs,
    windows,
)
from .registry_util import merge
from .sources import connectors
from .streaming import streams

_MODULES = [
    connectors,
    aggregates,
    projections,
    joins,
    windows,
    sorts,
    setops,
    scalar,
    text,
    similarity,
    streams,
    udfs,
    pipeline,
    analytics,
    sampling,
    etl,
    behavioral,
    graph,
    curation,
    mining,
]

# The driver's per-round correctness harness samples a fixed-size prefix of
# ``queries()`` in iteration order, so key order decides which operators get a
# driver-side oracle row each round. Every window through round 12 is
# recorded in CORRECTNESS_r01–r12 (only one red row ever:
# `agg_calibration_ece`, r10 — converted to a hash-pass by its r11 row after
# the `// CAST(sum(n) AS BIGINT)` oracle fix; r11 and r12 are 50/50 green).
#
# ROUND-15 WINDOW (executes the pre-pinned round-14 plan, extended with the
# keys REWRITTEN during round 15 itself — this round's optimization targets —
# so driver truth lands on current code; confirmed against the green 50/50
# CORRECTNESS_r14): slots 1-2 = the two `_ADDED_R14` keys — the ONLY
# registered keys without a driver row in CORRECTNESS_r01–r14; slots 3-7 =
# rewrite-after-green re-verifications of the round-14 rewrites the driver
# has never run on current code (VERDICT r14 item 1: `dedup_semdedup` —
# output changed BY DESIGN in r14, k=max(10,⌈√n⌉) — then
# `dedup_soft_weights`, `sim_ann_lsh`, `sim_ann_graph`,
# `dedup_minhash_openvocab`); slots 8-11 = round-15 rewrite-after-green
# re-verifications (`dedup_containment_bigram`, `dedup_minhash_lsh`,
# `stream_stateful_running`, `plan_ivf_probe_geometry` — this round's
# optimization targets, each hash-identical by construction and
# emulator-green post-change); slots 12-16 = the round-5 tail (last 5 keys
# whose latest green row is round 5); slots 17-50 = the stalest green
# cohort — the first 34 remaining round-6 keys (`_VERIFIED_R6`, stable
# registry order; the last 11 queue as the round-16 head).
_PRIORITY = [
    # --- 2 never-driver-verified (the entire remaining queue, _ADDED_R14) ---
    "sink_manifest_atomic",
    "sink_manifest_expire",
    # --- round-14 rewrite-after-green re-verifications (VERDICT r14 item 1) ---
    "dedup_semdedup",
    "dedup_soft_weights",
    "sim_ann_lsh",
    "sim_ann_graph",
    "dedup_minhash_openvocab",
    # --- round-15 rewrite-after-green re-verifications ---
    "dedup_containment_bigram",
    "dedup_minhash_lsh",
    "stream_stateful_running",
    "plan_ivf_probe_geometry",
    # --- round-5 tail (stalest green rows) ---
    "sim_threshold_join",
    "sim_knn_query",
    "text_tfidf",
    "dedup_exact_text",
    "text_lang_id",
    # --- 34 stalest round-6 keys (latest green row = round 6) ---
    "agg_ks_test",
    "agg_chi_square",
    "agg_mann_whitney",
    "win_ewma",
    "etl_gdpr_cascade",
    "text_pii_scrub",
    "multimodal_phash_dedup",
    "agg_heavy_hitters",
    "win_cusum_drift",
    "events_attribution",
    "events_anomaly_mad",
    "join_interval_overlap",
    "sample_priority_topk",
    "join_bloom_prefilter",
    "sim_mmr_diversify",
    "agg_bootstrap_ci",
    "sample_balanced_classes",
    "etl_cdc_deletes",
    "text_ccnet_buckets",
    "pipeline_corpus_curate",
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
]

# Keys ADDED during round 15 (no driver row yet). Every new operator lands
# here in the same commit that registers it UNLESS it also gets a window
# slot the same round; keys here queue directly behind the window for the
# round-16 rotation. (Round 15 is an optimization round — no new features.)
_ADDED_R15: list[str] = []

# Keys hash/rows-verified green by the driver in round 14 (the former
# round-14 _PRIORITY window; CORRECTNESS_r14.json 50/50 green — the three
# `_ADDED_R13` keys, the `_PQ_ADC_CTE` re-verifications, the round-4 tail,
# and the 41 stalest round-5 keys all converted) — demoted directly behind
# the round-15 additions. `dedup_containment_bigram` is NOT here: it
# re-entered the round-15 window above after its post-green
# MinHash-prefilter rewrite.
_VERIFIED_R14 = [
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

# Keys hash/rows-verified green by the driver in round 13 (the former
# round-13 _PRIORITY window; CORRECTNESS_r13.json 50/50 green — all six
# r12 additions, the post-green openvocab prefilter rewrite, and the first
# 43 round-4 keys converted) — demoted directly behind the round-14
# additions.
_VERIFIED_R13 = [
    "sample_weighted_reservoir",
    "etl_rendezvous_shard",
    "stream_quantile_ingest",
    "plan_quantile_sketch_geometry",
    "sample_epoch_shuffle",
    "sample_token_stream_batches",
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


# Keys hash/rows-verified green by the driver in round 12 (the former
# round-12 _PRIORITY window; CORRECTNESS_r12.json 50/50 green — all four
# r11 additions, the ten sink-scope streaming re-verifications, the Lloyd
# refactor, the quantile sketch, and the entire stale round-2/3 cohort
# converted) — demoted directly behind the round-13 additions.
# `dedup_minhash_openvocab` is NOT here: it re-entered the round-13 window
# above after its post-green prefilter rewrite.
_VERIFIED_R12 = [
    "sim_ann_append",
    "stream_ann_ingest",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    "stream_static_join",
    "stream_foreachbatch",
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
    # --- freshness head of the round-4 cohort ---
    "tpch_q2_min_cost_supplier",
    "tpch_q3_unshipped",
]

# Keys hash/rows-verified green by the driver in round 11 (the former
# round-11 _PRIORITY window; CORRECTNESS_r11.json 50/50 green — the first
# all-green window since r5/r6, converting the r10 `agg_calibration_ece`
# red row to a hash-pass) — demoted directly behind the round-12 additions.
_VERIFIED_R11 = [
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

# Keys hash/rows-verified green by the driver in round 10 (the former
# round-10 _PRIORITY window; CORRECTNESS_r10.json 49/50 — the one red key,
# `agg_calibration_ece`, moved into the round-11 window above) — demoted
# directly behind the round-11 additions.
_VERIFIED_R10 = [
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
    "win_bollinger_bands",
    "graph_neighborhood_function",
    "join_asof_nearest",
    "agg_gini_split_screen",
    "agg_js_drift",
    "sample_kfold_assignments",
    "text_lexical_overlap",
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

# Keys hash/rows-verified green by the driver in rounds 8+9 (the former
# round-8 _PRIORITY window; CORRECTNESS_r08 50/50 green, re-confirmed
# verbatim by the r09 re-run). `graph_modularity` moved into the
# round-11 re-verification slots above (post-green shared-edges rewrite).
_VERIFIED_R8 = [
    "graph_adamic_adar",
    "agg_cuped_adjusted",
    "dedup_winnowing",
    "agg_price_volume_mix",
    "text_kl_source_drift",
    "agg_quantile_treatment_effect",
    "join_mutual_best_match",
    "agg_ipf_raking",
    "agg_mann_kendall",
    "sample_neyman_allocation",
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
    "win_holt_winters",
    "events_user_lifecycle",
    "etl_wap_rollback",
    "text_bigram_generate",
    "win_kalman_filter",
    "graph_link_prediction",
    "win_rolling_corr",
    "etl_surrogate_keys",
    "win_zscore_outliers",
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

# Keys hash/rows-verified green by the driver in round 7 (the former
# _PRIORITY window; CORRECTNESS_r07.json 50/50) — demoted directly behind
# the round-8 additions.
_VERIFIED_R7 = [
    "join_spatial_grid",
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

# Keys hash/rows-verified green by the driver in round 6 (the former
# _PRIORITY window; CORRECTNESS_r06.json 50/50) — demoted directly behind
# the round-7/8 queue.
_VERIFIED_R6 = [
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

# Round 5's cohort is fully absorbed: the round-14 window took its first 41
# keys and the round-15 window takes the 5-key tail (slots 12-16 above).
_VERIFIED_R5: list[str] = []





def _reorder(d: dict) -> dict:
    lists = (
        _PRIORITY
        + _ADDED_R15
        + _VERIFIED_R14
        + _VERIFIED_R13
        + _VERIFIED_R12
        + _VERIFIED_R11
        + _VERIFIED_R10
        + _VERIFIED_R8
        + _VERIFIED_R7
        + _VERIFIED_R6
        + _VERIFIED_R5
    )
    missing = [k for k in lists if k not in d]
    if missing:
        raise ValueError(f"registry priority lists name unknown keys: {missing}")
    dupes = {k for k in lists if lists.count(k) > 1}
    if dupes:
        raise ValueError(f"registry priority lists overlap: {sorted(dupes)}")
    unlisted = [k for k in d if k not in set(lists)]
    if unlisted:
        raise ValueError(
            "registered keys missing from the rotation queue (add to _ADDED_R15): "
            f"{unlisted}"
        )
    return {k: d[k] for k in lists}


def queries():
    return _reorder(merge(_MODULES)[0])


def oracle_sql():
    merged_q, merged_o = merge(_MODULES)
    # Keep oracle iteration order consistent with queries() for readability.
    ordered_q = _reorder(merged_q)
    return {k: merged_o[k] for k in ordered_q if k in merged_o}
