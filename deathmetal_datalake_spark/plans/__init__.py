"""Query catalog: every operator from SURVEY.md §2 (+ the large-scale
training-data extensions) as a named (Spark DataFrame fn, DuckDB oracle
SQL) pair. Importing this package populates the registry."""

from deathmetal_datalake_spark.plans.registry import QUERIES, ORACLES, register

# Domain modules register themselves on import.
from deathmetal_datalake_spark.plans import relational  # noqa: E402,F401
from deathmetal_datalake_spark.plans import events  # noqa: E402,F401
from deathmetal_datalake_spark.plans import text  # noqa: E402,F401
from deathmetal_datalake_spark.plans import dedup  # noqa: E402,F401
from deathmetal_datalake_spark.plans import similarity  # noqa: E402,F401
from deathmetal_datalake_spark.plans import multimodal  # noqa: E402,F401
from deathmetal_datalake_spark.plans import advanced  # noqa: E402,F401
from deathmetal_datalake_spark.plans import tpch_extra  # noqa: E402,F401
from deathmetal_datalake_spark.plans import pipeline  # noqa: E402,F401
from deathmetal_datalake_spark.plans import sqlsurface  # noqa: E402,F401
from deathmetal_datalake_spark.plans import streaming_catalog  # noqa: E402,F401
from deathmetal_datalake_spark.plans import snapshot_queries  # noqa: E402,F401
from deathmetal_datalake_spark.plans import dq  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]

# Driver-sample freshness (r5 verdict #8): the per-round correctness
# gate samples a PREFIX of this dict, and registration order is
# chronological (oldest modules first) — two rounds running it sampled
# the same 50 early names. Reverse in place so the newest operators
# are driver-checked first; every reference shares these dict objects,
# and the full catalog is still swept each round (docs/SWEEP_r0N.json).
_rev_q = list(reversed(QUERIES.items()))
QUERIES.clear()
QUERIES.update(_rev_q)
_rev_o = list(reversed(ORACLES.items()))
ORACLES.clear()
ORACLES.update(_rev_o)
del _rev_q, _rev_o

# Within-module additions land mid-dict after the reversal (module
# order, not recency, dominates), so the operators added THIS round are
# promoted to the head explicitly — the driver's prefix sample then
# always covers the newest, least-battle-tested surface first.
_NEWEST_FIRST = [
    # round 13 batch 6: lead/lag cross-correlation, partial
    # correlation, the 33rd replay (AMS F2 sign sketch)
    "events_cross_correlation_lagged",
    "lineitem_partial_correlation",
    "streaming_ams_f2_replay",
    # round 13 batch 5: auto-fold policy audit, Hill tail index,
    # deterministic hash-seeded Poisson bootstrap
    "catalog_fold_policy_audit",
    "lineitem_hill_tail_index",
    "sample_poisson_bootstrap_means",
    # round 13 batch 4: spectral analysis (periodogram), market
    # concentration (HHI), key-space gap audit, the 32nd replay
    # (count-min sketch)
    "events_periodogram_daily",
    "supplier_hhi_by_nation",
    "dq_orderkey_gap_audit",
    "streaming_countmin_replay",
    # round 13 batch 3: clustering eval (ARI), the 31st replay (bloom
    # filter), Wilson proportion intervals, language-divergence matrix
    "embedding_ari_kmeans_labels",
    "streaming_bloom_filter_replay",
    "lineitem_return_wilson_monthly",
    "text_lang_divergence_matrix",
    # round 13 batch 2: distribution-shift scores (PSI/JSD), Markov
    # entropy rate, CvM two-sample, duplicate-cap retention,
    # systematic sampling, the 30th streaming replay (KMV sketch)
    "dq_psi_jsd_price_drift",
    "events_entropy_rate_markov",
    "orders_cramer_von_mises_two_sample",
    "corpus_influence_dedup_cap",
    "sample_systematic_interval",
    "streaming_kmv_distinct_replay",
    # round 13 batch 1: branch-surface completion — merged_from base
    # advance (re-merge of a continued branch), fold-tolerant rebase,
    # the merge-log view, additive-schema rebase
    "catalog_remerge_continuation",
    "catalog_rebase_across_fold",
    "catalog_merge_log",
    "catalog_rebase_additive_schema",
    # round 12 batch 9: block-design nonparametrics (Friedman, Cochran
    # Q), classifier-pair agreement (kappa/McNemar), and the
    # temperature-scaled multilingual sampling mix
    "orders_friedman_priority_ranks",
    "events_cochran_q_actions",
    "dq_rule_agreement_kappa",
    "corpus_temperature_sampling_mix",
    # round 12 batch 8: branch rebase (ours/theirs policy) + ref-log
    # topology — the git-rebase / Nessie-reflog analogs
    "catalog_branch_rebase_policies",
    "catalog_ref_log_topology",
    # round 12 batch 7: ordered-alternative k-group trend
    "orders_jonckheere_terpstra_trend",
    # round 12 batch 6: prune-simulation retention
    "corpus_length_prune_retention",
    # round 12 batch 5: price-ending uniformity, WAV round trip
    "dq_price_ending_uniformity",
    "multimodal_wav_decimate_stats",
    # round 12 batch 4: three-way branch merge, 29th streaming replay
    "catalog_branch_merge_threeway",
    "streaming_fixed_histogram_replay",
    # round 12 batch 3: attribution + engagement + spectrum flatness
    "events_shapley_attribution",
    "events_bounce_rate_daily",
    "embedding_participation_ratio",
    # round 12 batch 2: concentration + association + forecastability
    # statistics and the corpus-curation rule battery
    "events_gini_user_activity",
    "events_lorenz_activity_deciles",
    "dq_chi2_type_dow_independence",
    "orders_theil_u_weekly",
    "corpus_gopher_quality_rules",
    "corpus_intra_doc_repetition",
    "corpus_pattern_scrub_rates",
    # round 12 batch 1: length-banded edit-distance blocking (verdict
    # #6 — catches the insertion/deletion near-dups equal-length
    # blocking misses by construction)
    "dedup_levenshtein_banded_lengths",
    # round 11 batch 10: mergeable-sketch streaming state, ordered funnel
    "streaming_hll_sketch_replay",
    "events_ordered_funnel",
    # round 11 batch 9: classifier eval, hash integrity, exact
    # surge flagging, sampling-theory audit
    "text_langid_confusion_matrix",
    "dq_hash_collision_audit",
    "events_chebyshev_outlier_hours",
    "sample_bottomk_ht_estimate",
    # round 11 batch 8: PNG codec in-pipeline, cross-shard dup leakage
    "multimodal_png_roundtrip_stats",
    "dedup_cross_shard_leakage",
    # round 11 batch 7: count dispersion, retention triangle, price
    # indices
    "events_fano_factor_hourly",
    "events_cohort_retention_triangle",
    "lineitem_price_index_pair",
    # round 11 batch 6: matryoshka energy, shard uniformity, exact
    # entropy bound, packing histogram
    "embedding_prefix_energy_profile",
    "corpus_shard_assignment_uniformity",
    "text_unigram_entropy_bits",
    "corpus_length_log2_histogram",
    # round 11 batch 5: segmented regression, rank concordance, the
    # 27th replay (incremental categorical drift)
    "orders_its_level_shift",
    "events_kendall_volume_value",
    "streaming_tv_drift_replay",
    # round 11 batch 4: O(delta) MERGE via sequence-scoped equality deletes
    "catalog_incremental_merge",
    # round 11 batch 3: monotone-trend test, categorical drift, exact
    # diversity, survey-design receipts, LPC codec in-pipeline
    "orders_mann_kendall_trend",
    "dq_total_variation_drift",
    "text_simpson_diversity",
    "sample_kish_effective_size",
    "multimodal_flac_zero_crossings",
    # round 11 batch 2: metric drift, burstiness, edit-distance dedup,
    # embedding drift, corpus quality rollup
    "dq_wasserstein_value_drift",
    "events_burstiness_by_type",
    "dedup_levenshtein_block_pairs",
    "similarity_centroid_shift_drift",
    "corpus_dedup_rate_by_source",
    # round 11 batch 1: paired/k-group nonparametrics, drift-tolerant
    # changepoint, randomness audit, effect size, deterministic sampling
    "events_page_hinkley_drift",
    "events_wilcoxon_signed_rank",
    "events_runs_test_daily",
    "dq_cliffs_delta_effect_size",
    "dq_kruskal_wallis_rank_sums",
    "sample_bottomk_uniform",
    # round 10 batch 5: rank correlation, ACF, Markov attribution
    "text_signal_spearman",
    "events_daily_autocorrelation",
    "events_markov_attribution",
    # round 10 batch 4: wavelets, optimal allocation, PCA deflation
    "events_haar_energy_levels",
    "sample_neyman_allocation",
    "embedding_second_pc_deflation",
    # round 10 batch 3: sketches, Markov dynamics, IR feedback
    "events_hll_registers",
    "events_markov_stationary_2step",
    "text_rocchio_expansion",
    # round 10 batch 2: nonparametric drift/trend statistics
    "dq_mannwhitney_value_drift",
    "dq_ks_two_sample_drift",
    "events_cusum_changepoint",
    "orders_theil_sen_weekly_trend",
    # round 10: verdict/advice closures + FLAC codec round-trip
    "multimodal_flac_roundtrip_stats",
    "multimodal_silence_trim",
    "multimodal_phash_neardup",
    "events_rfm_quintiles",
    "text_interpolated_lm_surprisal",
    "dq_column_profile_multitable",
    "text_rare_token_ratio",
    "dedup_bloom_prefilter",
    "dedup_semdedup_eval",
    # round 9 continuation (batch 10)
    "similarity_result_diversity_at_k",
    "events_user_resurrection",
    "events_session_depth_conversion",
    # round 9 continuation (batch 9; lm_surprisal moved to the r10 block)
    "dq_category_set_drift",
    "dq_cardinality_ratios",
    "similarity_ivf_nprobe_recall_curve",
    # round 9 continuation (batch 8)
    "orders_abc_classification",
    "corpus_perplexity_quartile_mix",
    # round 9 continuation (batch 7)
    "events_holt_linear_forecast",
    "supplier_revenue_hhi",
    # round 9 continuation (batch 6)
    "events_burst_episodes",
    "lineitem_discount_qty_ols",
    "text_mattr_lexical_diversity",
    # round 9 continuation (batch 5)
    "dq_column_profile_multitable",
    # round 9 continuation (batch 4)
    "orders_ship_lag_quantiles",
    "events_seasonal_residual_anomaly",
    "events_user_features",
    # round 9 continuation (batches 1-3)
    "events_time_weighted_average",
    "orders_cohort_ltv",
    "text_keyphrase_rake",
    "embedding_top_pc_power_iteration",
    "dq_l_diversity_customer",
    "dq_chisquare_value_drift",
    "embedding_knn_label_agreement",
    "text_bigram_surprisal_score",
    "events_survival_kaplan_meier",
    "dq_daily_volume_anomaly",
    "embedding_silhouette_by_label",
    "embedding_dimension_robust_stats",
    "dq_price_robust_outliers",
    # round 9 (batch 4)
    "corpus_sentence_dedup",
    "orders_repeat_interval_profile",
    # round 9 (batch 3)
    "dq_embedding_coverage",
    "similarity_centroid_separation",
    "events_audience_overlap_jaccard",
    # round 9 (batch 2)
    "events_dau_wau_stickiness",
    "lineitem_market_basket_lift",
    "text_code_detection",
    # round 9
    "streaming_static_enrich_replay",
    "similarity_triplet_margin_audit",
    "text_vocab_mass_coverage",
    "dedup_crosslingual_exact",
    "orders_pareto_concentration",
    "dq_candidate_key_multitable",
    # round 8 (batch 3)
    "events_outage_gaps",
    "corpus_anneal_apportionment",
    # round 8 (batch 2)
    "corpus_dedup_token_savings",
    "streaming_peak_concurrency_replay",
    "orders_yoy_revenue_growth",
    "dedup_shingle_df_profile",
    "dedup_cluster_size_histogram",
    "similarity_label_centroid_drift",
    "embedding_norm_outliers",
    # round 8
    "dq_benford_first_digit",
    "dq_candidate_key_uniqueness",
    "events_rfm_quintiles",
    "events_peak_concurrency",
    "text_readability_scores",
    "text_boilerplate_lines",
    "similarity_radius_search",
    "multimodal_silence_trim",
    # round 7 (session 2)
    "dq_referential_integrity",
    "dq_distribution_drift_orders",
    "corpus_token_budget_fill",
    "streaming_transition_matrix_replay",
    "dedup_simhash_wide_pairs",
    "corpus_heaps_vocab_growth",
    "text_zipf_rank_frequency",
    # round 7
    "events_type_transition_matrix",
    "events_top_session_paths",
    "events_ab_cuped_adjusted_lift",
    "text_hashed_linear_quality_score",
    "text_winnowing_fingerprint",
    "similarity_binary_sign_quant",
    "multimodal_scene_changes",
    "dq_k_anonymity_customer",
    # round 6
    "corpus_quality_weighted_sample",
    "events_new_vs_returning",
    "streaming_bitmap_distinct_replay",
    "similarity_hybrid_rrf_fusion",
    "dq_freshness_events",
    "dq_column_profile_orders",
    "events_conversion_lag_quantiles",
    "events_bitmap_distinct_rollup",
    "events_histogram_numeric",
    "text_langid_confusion",
    "catalog_snapshots_metadata_read",
    "catalog_orphan_audit",
    "text_bigram_lift",
    "streaming_hourly_top_replay",
    "similarity_filtered_ann",
    "events_hourly_top_types",
    "distinct_on_latest_order",
    "multimodal_phash_neardup",
    "corpus_epoch_repeats",
    "catalog_rollback_read",
    "corpus_dsir_importance",
    "similarity_mutual_topk",
    "similarity_mmr_rerank",
    "events_interval_overlap_join",
    "events_session_features",
    "text_tokenizer_fertility",
    "text_gopher_rules_audit",
    "similarity_ivfpq_topk",
    "dedup_cdc_incremental",
    "dedup_content_chunks",
    "catalog_maintain_policy_read",
    "catalog_zorder_clustered_scan",
    "catalog_spec_evolution_pruned_read",
    "dedup_fuzzy_name_join",
    "similarity_pq_adc_topk",
    "similarity_pq_recall",
    "embedding_pq_distortion",
    "text_robust_length_outliers",
    "tpch_q12_shipmode_priority",
    "tpch_q14_promo_effect",
]


def _promote(front: list[str]) -> None:
    for reg in (QUERIES, ORACLES):
        head = {n: reg[n] for n in front if n in reg}
        rest = {n: v for n, v in reg.items() if n not in head}
        reg.clear()
        reg.update(head)
        reg.update(rest)


_promote(_NEWEST_FIRST)
