"""Automated plan-quality gate over the whole catalog: no accidental
cartesian products, no row-at-a-time Python UDFs, scans prune columns.

These are the plan properties that decide whether a query survives a
100 TB deployment; asserting them across every registered query keeps
new operators honest by construction."""

from __future__ import annotations

import pyarrow.parquet as _pq
import pytest

from deathmetal_datalake_spark.plans import QUERIES
from deathmetal_datalake_spark.plans.registry import release_caches

SF = "/root/testdata/sf0.001"

# Full physical schemas of the testdata tables, read once from the
# parquet footers (pyarrow — avoids the events TIMESTAMP(NANOS) read
# restriction). The pruning gate applies to tables wide enough that an
# all-columns scan is distinguishable from a projecting one.
_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
_FULL_SCHEMA = {
    t: frozenset(_pq.read_schema(f"{SF}/{t}.parquet").names) for t in _TABLES
}
_PRUNE_GATED = {t for t, s in _FULL_SCHEMA.items() if len(s) >= 5}

# Queries allowed to read EVERY column of a gated table (none today:
# full-row materializations in the catalog happen inside eager write
# paths, not in the returned plan).
_FULL_SCAN_OK: set[str] = set()


def _parquet_scans(df):
    """(rootPaths, requiredSchema column set) for every parquet file
    scan in the executed plan, via the JVM plan tree — the plan's
    toString truncates wide ReadSchemas, so string parsing would
    under-count columns."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    out = []
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() == "FileSourceScanExec":
            fields = frozenset(node.requiredSchema().fieldNames())
            paths = node.relation().location().rootPaths().mkString(",")
            out.append((paths, fields))
    return out

def _empty_partition_windows(plan: str) -> list[str]:
    """windowspecdefinition(...) snippets whose PARTITION spec is empty.

    Spark executes such windows as one task holding the whole frame
    (Exchange SinglePartition → sort → window) — the round-8 verdict's
    scale-killer class. In the spec's printed args, partition columns
    come before the sort orders, and sort orders always carry ASC/DESC,
    so an empty partition spec ⇔ the FIRST top-level argument is a sort
    spec. Top-level split tolerates nested parens (CASE WHEN keys)."""
    out = []
    pos = 0
    while True:
        i = plan.find("windowspecdefinition(", pos)
        if i < 0:
            return out
        j = i + len("windowspecdefinition(")
        depth, args, cur = 1, [], []
        while j < len(plan) and depth:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            if ch == "," and depth == 1:
                args.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            j += 1
        args.append("".join(cur))
        pos = j
        first = args[0] if args else ""
        if " ASC" in first or " DESC" in first:
            out.append(plan[i : min(j + 1, i + 300)])


# Queries whose plan legitimately contains an EMPTY-partition window
# spec: audited bounded frames (never data-proportional), each with the
# reason its row count is bounded by construction.
_GLOBAL_WINDOW_OK = {
    "orders_yoy_revenue_growth",   # per-YEAR frame (time-range bound, ~7 rows)
    "text_bm25_retrieval",         # rank over the post-limit top-k frame
    "events_gap_filled_locf",      # LOCF carry over the 5-min window SPINE
                                   # (time-range bound, not event-count bound)
    "similarity_hybrid_rrf_fusion",  # ranks over two post-limit top-20 frames
    "events_cusum_changepoint",      # prefix sums/minima over the DAILY spine
                                     # (time-range bound, not event-count bound)
    "events_page_hinkley_drift",     # drawup/drawdown over the DAILY spine
    "events_runs_test_daily",        # rank + lag over the DAILY spine
    "events_haar_energy_levels",     # day-index assignment over the DAILY spine
    "sample_neyman_allocation",      # remainder ranking over the source-enum frame
}


# Queries whose plan legitimately contains a broadcast nested-loop or
# cross join: scalar-subquery frames (1 row), bounded band dims, and
# the IVF/k-means corpus x centroids assignment (the algorithm).
_NONEQUI_OK = {
    "subquery_above_avg_balance",    # 1-row mean frame
    "tpch_q11_important_parts",      # 1-row threshold frame
    "tpch_q15_top_supplier",         # 1-row max-revenue frame
    "tpch_q22_sales_opportunity",    # 1-row avg-balance frame
    "events_value_band_rollup",      # 3-row band dim
    "similarity_bruteforce_topk",    # deliberate full-scan baseline
    "similarity_mutual_topk",        # fixed ≤200-vector eval-set pairwise pass
    "similarity_mmr_rerank",         # broadcast query-set relevance scan
    "similarity_pandas_udf_topk",    # same baseline, Arrow path
    "similarity_ivf_topk",           # corpus x ~centroids assignment
    "similarity_retrieval_with_metadata",  # brute-force scorer + tiny topk join
    "kmeans_two_rounds",             # corpus x centroids, twice
    "kmeans_converged_sizes",        # same assignment shape, iterated
    "pagerank_neardup_two_rounds",   # 1-row N frame joined per round
    "text_tfidf_top_terms",          # 1-row N frame for the IDF
    "text_bm25_retrieval",           # 1-row N/avgdl stats frame
    "dataset_mixture_weights",       # 1-row grand-total frame
    "corpus_dsir_importance",        # 1-row token-totals frame for smoothing
    "corpus_epoch_repeats",          # 1-row target-budget frame
    "text_bigram_lift",              # two 1-row totals frames
    "text_bigram_surprisal_score",   # 1-row vocabulary-size frame
    "events_survival_kaplan_meier",  # 1-row watermark frame
    "embedding_top_pc_power_iteration",  # 1-row norm frames per round
    "dq_chisquare_value_drift",      # 1-row era-bounds frame
    "embedding_knn_label_agreement",  # ≤40-anchor broadcast scan
    "orders_abc_classification",     # 1-row revenue-total frame
    "corpus_perplexity_quartile_mix",  # 1-row vocabulary-size frame
    "text_interpolated_lm_surprisal",  # 1-row token-total frame
    "dq_category_set_drift",         # 1-row era-bounds frame
    "similarity_ivf_nprobe_recall_curve",  # corpus×centroids assignment + 3-row nprobe dim
    "similarity_result_diversity_at_k",  # ≤40-query broadcast truth scan
    "similarity_hybrid_rrf_fusion",  # 1-row query-vector + BM25 stats frames
    "dq_freshness_events",           # 1-row corpus-watermark frame
    "corpus_temperature_resampling",  # 1-row grand-total + weight-sum frames
    "similarity_ivf_multiprobe_topk",  # corpus x ~centroids assignment
    "similarity_hard_negatives",     # corpus x ~centroids assignment
    "dedup_semdedup_ivf",            # corpus x 16-centroid assignment
    "dedup_semdedup_eval",           # composes the semdedup assignment
    "similarity_ann_recall",         # brute-force truth + IVF assignment
    "similarity_filtered_ann",       # filtered brute-force truth + IVF assignment
    "text_rare_token_ratio",         # 1-row corpus-count frame
    "similarity_dim_truncation_recall",  # brute-force truth + truncated rescan
    "dedup_graph_triangles",         # three 1-row count frames crossJoined
    "corpus_curation_funnel",        # 1-row corpus-total frame
    "similarity_pq_recall",          # brute-force L2 truth side (≤40-query broadcast)
    "similarity_binary_sign_quant",  # Hamming scan + brute-force cosine truth (≤40-query broadcast)
    "corpus_heaps_vocab_growth",     # 10-row checkpoint frame crossJoined (bounded)
    "corpus_token_budget_fill",      # 1-row corpus-total frame crossJoined
    "dq_distribution_drift_orders",  # 1-row era-totals frame crossJoined
    "dq_referential_integrity",      # per-relationship 1-row count frames crossJoined
    "dedup_content_chunks",          # two 1-row stats frames crossJoined
    "dedup_cdc_incremental",         # three 1-row stats frames crossJoined
    "similarity_ivfpq_topk",         # corpus x 16-centroid coarse assignment
    "events_rfm_quintiles",          # 1-row watermark frame crossJoined
    "similarity_radius_search",      # brute-force radius scan (≤40-query broadcast)
    "dq_benford_first_digit",        # 1-row digit-total frame crossJoined
    "dq_candidate_key_uniqueness",   # per-key 1-row count frames crossJoined
    "dq_candidate_key_multitable",   # per-key 1-row exact+KMV frames crossJoined
    "dq_embedding_coverage",         # five 1-row count frames crossJoined
    "orders_pareto_concentration",   # 1-row revenue-total frame crossJoined
    "text_vocab_mass_coverage",      # 1-row corpus-total frame crossJoined
    "similarity_triplet_margin_audit",  # ≤40-anchor broadcast eval-set scan
    "corpus_anneal_apportionment",   # 1-row median frame crossJoined
    "events_conversion_lag_quantiles",  # 1-row quantile pivot crossJoined
    "percentile_prices_by_status",   # ≤3-row literal fraction frame crossJoined
    "text_robust_length_outliers",   # 1-row fraction frame crossJoined (median+MAD)
    "embedding_norm_outliers",       # 1-row fraction frame crossJoined (median+MAD)
    "orders_ship_lag_quantiles",     # ≤2-row literal fraction frame crossJoined
    "events_user_features",          # 1-row watermark frame
    "dq_mannwhitney_value_drift",    # 1-row era-bounds frame crossJoined
    "dq_ks_two_sample_drift",        # 1-row bounds/totals/max frames crossJoined
    "events_cusum_changepoint",      # 1-row totals/max frames crossJoined
    "orders_theil_sen_weekly_trend",  # time-bounded weekly frame pairwise self-join + 1-row medians
    "events_lorenz_activity_deciles",  # 10x10 decile triangle join
    "dq_chi2_type_dow_independence",  # [1row] grand-total frame
    "orders_theil_u_weekly",          # [1row] week-count frame
    "events_shapley_attribution",     # 8-subset x 8-mask lattice joins
    "embedding_participation_ratio",  # [1row] vector-count frame
    "dq_price_ending_uniformity",     # [1row] totals/numerator/mode frames
    "corpus_length_prune_retention",  # [dim] 3-row cutoff dim cross joins
    "orders_jonckheere_terpstra_trend",  # [1row] group-count frame
    "events_hll_registers",          # 1-row sketch-summary frames crossJoined
    "events_markov_stationary_2step",  # K x K bounded type-space matrix
    "text_rocchio_expansion",        # 1-row counts + post-limit term frames
    "events_haar_energy_levels",     # 1-row level-count frame crossJoined
    "sample_neyman_allocation",      # 1-row weight-total/remainder frames
    "embedding_second_pc_deflation",  # 1-row norm/ortho frames crossJoined
    "events_daily_autocorrelation",  # 14-row literal lag dim + 1-row denominator
    "events_page_hinkley_drift",     # 1-row totals + peak-day frames crossJoined
    "events_wilcoxon_signed_rank",   # 1-row era-bounds frame crossJoined
    "events_runs_test_daily",        # 1-row count/median frames crossJoined
    "dq_cliffs_delta_effect_size",   # 1-row era-bounds frame crossJoined
    "dq_kruskal_wallis_rank_sums",   # 1-row totals frame crossJoined
    "dq_wasserstein_value_drift",    # 1-row bounds/totals/num frames crossJoined
    "orders_mann_kendall_trend",     # time-bounded weekly pairwise self-join + 1-row frames
    "dq_total_variation_drift",      # 1-row bounds/totals frames crossJoined
    "sample_kish_effective_size",    # 1-row stratum-fold frames crossJoined
    "orders_its_level_shift",        # 1-row era-fit/cut frames crossJoined
    "events_kendall_volume_value",   # time-bounded weekly pairwise self-join + 1-row frames
    "streaming_tv_drift_replay",     # 1-row bounds/totals frames over the drained sink
    "embedding_prefix_energy_profile",  # 4-row literal prefix dim + 1-row total
    "corpus_shard_assignment_uniformity",  # 1-row total frame crossJoined
    "corpus_length_log2_histogram",  # 1-row total frame crossJoined
    "sample_bottomk_ht_estimate",    # 1-row truth/sample frames crossJoined
    "events_ordered_funnel",         # 1-row stage-count frames crossJoined
    "orders_friedman_priority_ranks",  # 1-row block-count/statistic frames crossJoined
    "corpus_temperature_sampling_mix",  # 1-row corpus-totals frame crossJoined
    "catalog_branch_rebase_policies",  # two 1-row branch-aggregate frames crossJoined
    # round 13
    "dq_psi_jsd_price_drift",        # 1-row era-totals frame crossJoined
    "events_entropy_rate_markov",    # 1-row totals + bounded pair/state-count frames
    "orders_cramer_von_mises_two_sample",  # 1-row group-counts frame crossJoined
    "sample_systematic_interval",    # 1-row frame-totals crossJoined
    "embedding_ari_kmeans_labels",   # corpus x 16-centroid assignment + 1-row pair sums
    "text_lang_divergence_matrix",   # 1-row per-lang totals over the <=200-row dense frame
    "dq_orderkey_gap_audit",         # 1-row gap-stats frame crossJoined
    "events_periodogram_daily",      # 1-row day-span bounds frame crossJoined x2
    "lineitem_hill_tail_index",      # 1-row threshold order-statistic crossJoined x2
    "events_cross_correlation_lagged",  # 7-row lag dim crossJoined with the day spine
}

# (events_fano_factor_hourly, events_cohort_retention_triangle, and
# lineitem_price_index_pair need no whitelist entries: hash aggregates
# and equi-joins only.)


# Rule 4 (round-10, closing the round-9 verdict's broadcast-hint
# scale-killer class): a FORCED broadcast hint — `strategy=broadcast`
# on a Join in the optimized logical plan, i.e. an explicit
# F.broadcast() in the code, NOT a stats-based AQE decision — is
# allowed only on audited bounded frames. The map below is the audit:
# query → max hint count, each entry naming why every hinted frame is
# bounded by CONSTRUCTION (never data-proportional). A new F.broadcast()
# anywhere in the catalog fails here until its frame is audited.
# Bounded-frame classes seen in the audit:
#   [dim]   fixed TPC-H dims (nation=25 rows, region=5) or literal dims
#   [1row]  single-row aggregate frames (totals, watermarks, thresholds)
#   [k]     fixed-k frames (centroids, PQ codebooks, sketch cells)
#   [enum]  per-group stats over a bounded-cardinality key
#           (event_type, source, lang, o_orderpriority, label, status)
#   [q40]   the ≤40-row query/anchor eval-set frame
#   [topk]  post-limit top-k frames
#   [time]  time-range-bounded frames (date grids, window spines,
#           cohort months)
#   [bkt]   operators/ordering.py offsets/spec frames — one row per
#           value-bucket x partition, fixed bucket count
_HINTED_BROADCAST_OK = {
    "corpus_anneal_apportionment": 5,    # [1row] median/total + [enum] per-source quotas
    "corpus_curation_funnel": 1,         # [1row] corpus total
    "corpus_dsir_importance": 2,         # [1row] token totals
    "corpus_epoch_repeats": 4,           # [1row] budget + [enum] per-source plan
    "corpus_heaps_vocab_growth": 4,      # 10-row checkpoints + [1row] + [bkt]
    "corpus_perplexity_quartile_mix": 1, # [1row] vocab size
    "corpus_temperature_resampling": 1,  # [1row] totals
    "corpus_token_budget_fill": 2,       # [1row] corpus total + [bkt]
    "dataset_mixture_weights": 1,        # [1row] grand total
    "dedup_cdc_incremental": 2,          # [1row] stats frames
    "dedup_content_chunks": 1,           # [1row] stats frame
    "dedup_graph_triangles": 2,          # [1row] count frames
    "dedup_semdedup_eval": 2,            # [k] 16-centroid frames (via semdedup_ivf)
    "dedup_semdedup_ivf": 2,             # [k] 16-centroid frames
    "dq_benford_first_digit": 1,         # [1row] digit total
    "dq_category_set_drift": 1,          # [1row] era bounds
    "dq_daily_volume_anomaly": 4,        # [enum] per-event_type median/MAD
    "dq_distribution_drift_orders": 1,   # [1row] era totals
    "dq_embedding_coverage": 4,          # [1row] count frames
    "dq_freshness_events": 1,            # [1row] watermark
    "dq_price_robust_outliers": 4,       # [enum] per-o_orderpriority median/MAD
    "embedding_dimension_robust_stats": 3,  # [k] per-pos (fixed dim) frames
    "embedding_int8_quantization": 1,    # [k] per-pos scale frame
    "embedding_knn_label_agreement": 1,  # [q40] anchor frame
    "embedding_norm_outliers": 3,        # [1row] median/MAD/fraction
    "embedding_pq_distortion": 1,        # [k] PQ codebook
    "embedding_silhouette_by_label": 1,  # [enum] per-label centroids
    "embedding_top_pc_power_iteration": 9,  # [1row] norm frames per round
    "events_audience_overlap_jaccard": 2,   # [enum] per-event_type set sizes
    "events_conversion_lag_quantiles": 5,   # [1row] quantile pivot + literal fractions
    "events_countmin_user_freq": 1,      # [k] fixed sketch cells
    "events_dau_wau_stickiness": 1,      # [time] date grid
    "events_interval_overlap_join": 1,   # [time] window spine
    "events_rfm_quintiles": 7,           # [1row] watermark + 3x[bkt] offsets
    "events_survival_kaplan_meier": 1,   # [1row] watermark
    "events_user_features": 1,           # [1row] watermark
    "events_value_band_rollup": 1,       # [dim] 3-row literal bands
    "g1_top10_customers_per_nation": 1,  # [dim] nation
    "g2_customer_order_stats": 1,        # [dim] nation
    "g3_customer_counts_per_nation": 1,  # [dim] nation
    "g4_filtered_nation_ranking": 1,     # [dim] nation
    "j1_customer_catalog": 1,            # [dim] nation
    "kmeans_two_rounds": 2,              # [k] centroid frames
    "orders_abc_classification": 2,      # [1row] revenue totals
    "orders_cohort_ltv": 1,              # [time] per-cohort-month sizes
    "orders_pareto_concentration": 2,    # [1row] totals
    "orders_ship_lag_quantiles": 2,      # [dim] literal fraction frames
    "pack_sequences_by_lang": 1,         # [enum]x[bkt] per-(lang,bucket) offsets
    "pagerank_neardup_two_rounds": 4,    # [1row] N frames per round
    "percentile_prices_by_status": 12,   # [dim] fractions x [enum] status spec frames
    "similarity_ann_lsh_topk": 1,        # [q40] query frame
    "similarity_ann_recall": 2,          # [q40] + [k] centroids
    "similarity_binary_sign_quant": 2,   # [q40] query frames
    "similarity_bruteforce_topk": 1,     # [q40] query frame
    "similarity_centroid_separation": 2, # [enum] per-label centroids
    "similarity_dim_truncation_recall": 2,  # [q40] query frames
    "similarity_filtered_ann": 1,        # [q40] query frame
    "similarity_hard_negatives": 3,      # [q40] + [k] centroids + probes
    "similarity_hybrid_rrf_fusion": 4,   # [1row] qvec/stats + [topk] rank frames
    "similarity_ivf_multiprobe_topk": 1, # [k] centroids/probes
    "similarity_ivf_nprobe_recall_curve": 3,  # [k] centroids + 3-row nprobe dim
    "similarity_ivf_topk": 3,            # [k] centroids + [q40] probes
    "similarity_ivfpq_topk": 4,          # [k] centroids + codebook + [q40]
    "similarity_mmr_rerank": 1,          # [q40] relevance frame
    "similarity_pandas_udf_topk": 1,     # [q40] query frame
    "similarity_pq_adc_topk": 3,         # [k] codebook + [q40] LUT
    "similarity_pq_recall": 4,           # [k] codebook + [q40] frames
    "similarity_radius_search": 3,       # [q40] query frames
    "similarity_retrieval_with_metadata": 2,  # [q40] + [topk] join-back
    "similarity_triplet_margin_audit": 1,     # [q40] anchor frame
    "subquery_above_avg_balance": 1,     # [1row] mean
    "supplier_revenue_hhi": 1,           # [1row] total
    "text_bigram_lift": 2,               # [1row] totals
    "text_bigram_surprisal_score": 1,    # [1row] vocab size
    "text_bm25_retrieval": 3,            # [enum] query-term df + [1row] N/avgdl
    "text_bpe_merge_coverage": 1,        # [topk] top-N merges
    "text_interpolated_lm_surprisal": 1, # [1row] token total
    "text_quality_mean_filter": 1,       # [enum] per-lang cutoffs
    "text_rare_token_ratio": 1,          # [1row] n_docs
    "text_robust_length_outliers": 3,    # [enum] per-source median/MAD + [1row]
    "text_tfidf_top_terms": 1,           # [1row] N frame
    "text_vocab_mass_coverage": 2,       # [1row] totals
    "text_zipf_rank_frequency": 1,       # [bkt] offsets
    "tpch_q10_returned_items": 1,        # [dim] nation
    "tpch_q11_important_parts": 3,       # [dim] nation + [1row] threshold
    "tpch_q15_top_supplier": 1,          # [1row] max revenue
    "tpch_q20_part_promotion": 1,        # [dim] nation
    "tpch_q22_sales_opportunity": 1,     # [1row] avg balance
    "tpch_q2_min_cost_supplier": 2,      # [dim] nation + region
    "tpch_q5_regional_revenue": 2,       # [dim] region + nation
    "tpch_q7_nation_volume": 2,          # [dim] nation x2
    "tpch_q8_market_share": 3,           # [dim] nation x2 + region
    "tpch_q9_profit_by_nation": 1,       # [dim] nation
    "window_dense_rank_ntile": 1,        # [dim] nation
    "dq_mannwhitney_value_drift": 3,     # [1row] era bounds + [bkt] offsets
    "dq_ks_two_sample_drift": 3,         # [1row] bounds/totals/dmax + [bkt] offsets
    "events_cusum_changepoint": 5,       # [1row] totals + peak-day frames
    "orders_theil_sen_weekly_trend": 3,  # [1row] medians/counts frames
    "events_hll_registers": 2,           # [1row] sketch summary + check frames
    "events_markov_stationary_2step": 2,  # [enum] K-type dims + [1row] K
    "text_rocchio_expansion": 4,         # [topk] feedback/term frames + [1row] counts
    "events_haar_energy_levels": 1,      # [1row] level-count frame
    "sample_neyman_allocation": 1,       # [enum]/[1row] allocation frames
    "embedding_second_pc_deflation": 2,  # [k] localized PC vectors + [1row] norms
    "text_signal_spearman": 2,           # [bkt] rank-cumsum offsets x2
    "events_page_hinkley_drift": 6,      # [1row] totals + peak-day frames
    "events_wilcoxon_signed_rank": 3,    # [1row] era bounds + [bkt] offsets
    "events_runs_test_daily": 3,         # [1row] count/median/agg frames
    "dq_cliffs_delta_effect_size": 3,    # [1row] era bounds + [bkt] offsets
    "dq_kruskal_wallis_rank_sums": 3,    # [1row] totals + [bkt] offsets
    "dq_wasserstein_value_drift": 5,     # [1row] bounds/totals/num + [bkt] offsets
    "orders_mann_kendall_trend": 2,      # [1row] pair-sum + tie frames
    "dq_total_variation_drift": 3,       # [1row] bounds/totals/num frames
    "sample_kish_effective_size": 1,     # [1row] stratum reciprocal fold
    "orders_its_level_shift": 4,         # [1row] bounds + era-fit + cut frames
    "events_kendall_volume_value": 1,    # [1row] pair-count frame
    "streaming_tv_drift_replay": 3,      # [1row] bounds/totals/num frames
    "embedding_prefix_energy_profile": 2,  # [dim] 4-row prefix lens + [1row] total
    "corpus_shard_assignment_uniformity": 1,  # [1row] corpus total
    "corpus_length_log2_histogram": 1,   # [1row] corpus total
    "sample_bottomk_ht_estimate": 1,     # [1row] sample-sum frame
    "events_ordered_funnel": 6,          # [1row] stage-count frames, replicated per union branch
    "events_chebyshev_outlier_hours": 1,  # [enum] per-type moment frame
    "events_daily_autocorrelation": 2,   # [dim] lag frame + [1row] totals
    # round 12
    "events_gini_user_activity": 1,      # [bkt] two-phase rank offsets
    "events_lorenz_activity_deciles": 4, # [bkt] offsets + 10-row decile frame + [1row] total
    "dq_chi2_type_dow_independence": 7,  # [enum] Kx7 cell/row/col frames + [1row] N
    "orders_theil_u_weekly": 1,          # [1row] week count
    "events_shapley_attribution": 5,     # [enum] 8-mask/8-subset lattice + [1row] total
    "embedding_participation_ratio": 1,  # [1row] vector count
    "dq_price_ending_uniformity": 3,     # [1row] totals + numerator + [topk] mode
    "corpus_length_prune_retention": 3,  # [dim] 3-row cutoff dim x2 + [bkt] offsets
    "orders_friedman_priority_ranks": 2,  # [1row] block-count + statistic frames
    "corpus_temperature_sampling_mix": 1,  # [1row] corpus-totals frame
    "orders_jonckheere_terpstra_trend": 2,  # [bkt] offsets + [1row] group counts
    # round 13
    "dq_psi_jsd_price_drift": 1,         # [1row] era-totals frame
    "events_entropy_rate_markov": 5,     # [enum] state totals + [1row] N / n_states / n_pairs
    "orders_cramer_von_mises_two_sample": 4,  # [bkt] offsets x2 specs (+1 tie sub-bounds) + [1row] group counts
    "sample_systematic_interval": 2,     # [bkt] offsets + [1row] frame totals
    "embedding_ari_kmeans_labels": 2,    # [1row] pair-sum frames (centroid scans un-hinted)
    "text_lang_divergence_matrix": 3,    # [topk] 200-word vocab cut x2 reuse + [1row] lang totals
    "events_periodogram_daily": 2,       # [1row] day-span bounds frames
    "dq_orderkey_gap_audit": 3,          # [bkt] two-phase offsets x2 join sides + [1row] gap stats
    "supplier_hhi_by_nation": 2,         # [enum] 25-nation totals + 25-row nation dim
    "streaming_countmin_replay": 1,      # [k] bounded 2x1024 cell bank
    "lineitem_hill_tail_index": 5,       # [bkt] offsets (+tie sub-bounds) replicated across the top-k filter branches + [1row] threshold x2
    "events_cross_correlation_lagged": 1,  # [dim] 7-row lag frame
    "streaming_ams_f2_replay": 1,        # [1row] exact-F2 frame
}


# Rule 5 (round-12, closing the round-11 verdict's prune-after-
# expansion class): a candidate-pair self-join — an Inner/Cross join
# whose BOTH subtrees reach the SAME source (parquet relation or cached
# frame, identified by leaf class + sorted output column names) without
# passing a cardinality-reducing node (Aggregate / limit / Deduplicate),
# a prune-applying join (LeftSemi / LeftAnti), or a rank-cap filter
# (Filter directly over a Window through Projects) — expands
# quadratically in the intermediate even when a cap frame prunes it
# downstream (Catalyst preserves written join order; the levenshtein
# block-pair bug). Every such join must be audited below: each entry
# names why the join is LINEAR or bounded by construction. A new
# unpruned self-join anywhere in the catalog fails here until audited
# — or, better, restructured so the prune sits upstream (semi-join the
# cap frame into both sides, or anchor-decompose an OR-cap).
# Bounded classes seen in the audit:
#   [key]    equi-join back on a unique id (doc_id/vec_id/o_orderkey/
#            phash/rank) — linear by key uniqueness
#   [q40]    one side is the ≤40-row eval/query frame
#   [k]      fixed-k frames (centroids, PQ codebooks, probe sets)
#   [dim]    fixed TPC-H dims on both sides (nation n1 x n2, 25 rows)
#   [enum]   bounded-cardinality key frames (event_type, label, source)
#   [1row]   scalar frames (cached — the cache leaf hides the upstream
#            aggregate from the walker)
#   [user]   per-user equi-join with a time-band filter — fan-out
#            bounded by per-user activity inside the band; AQE skew
#   [basket] per-order pair join — basket size bounded by data model
#   [edge]   closure joins over the already-capped candidate-pair edge
#            frame (degree-bounded by the upstream band caps)
#   [doc]    documented brute-force baseline with a bucketed scale-path
#            sibling query
_SELF_JOIN_PAIR_OK = {
    "corpus_anneal_apportionment": 1,    # [1row] cached quota frame
    "corpus_curation_funnel": 1,         # [key] sig-cache join-back on doc_id
    "corpus_split_leakage": 2,           # [key] doc/sig join-backs on doc_id
    "dedup_embedding_cosine": 1,         # [doc] label-blocked brute force; scale path = dedup_semdedup_ivf
    "dedup_graph_triangles": 2,          # [edge] triangle closure over capped pair graph
    "dedup_method_agreement": 1,         # [key] sig-cache join-back on doc_id
    "dedup_minhash_calibration": 1,      # [key] sig-cache join-back on doc_id
    "dedup_minhash_incremental": 1,      # [key] sig-cache join-back on doc_id
    "dedup_minhash_lsh": 1,              # [key] sig-cache join-back on doc_id
    "dedup_semdedup_eval": 3,            # [k] corpus x 16-centroid assignment + [q40]
    "dedup_semdedup_ivf": 2,             # [k] corpus x 16-centroid assignment
    "dedup_source_crossrate": 2,         # [key] doc/sig join-backs on doc_id
    "dq_wasserstein_value_drift": 1,     # [key] rank equi-join on unique rk
    "embedding_knn_label_agreement": 1,  # [q40] anchor frame x corpus
    "embedding_pq_distortion": 1,        # [key] join-back on vec_id
    "events_audience_overlap_jaccard": 1,  # [enum] K^2 type-pair sets on user_id
    "events_view_purchase_attribution": 1,  # [user] per-user join, 30-min band
    "flagship_multijoin": 1,             # [key] join-back on o_orderkey
    "kmeans_two_rounds": 1,              # [k] corpus x 8-centroid assignment
    "lineitem_market_basket_lift": 1,    # [basket] per-order pairs, ≤7 items
    "multimodal_phash_neardup": 1,       # [key] clusters join-back on unique phash
    "similarity_ann_lsh_topk": 1,        # [q40] query frame x bucketed corpus
    "similarity_ann_recall": 2,          # [q40] query frames
    "similarity_binary_sign_quant": 2,   # [q40] query frames
    "similarity_bruteforce_topk": 1,     # [doc]+[q40] documented brute-force baseline
    "similarity_centroid_separation": 1, # [enum] per-label centroid pairs
    "similarity_dim_truncation_recall": 2,  # [q40] query frames
    "similarity_hard_negatives": 3,      # [q40] + [k] centroids/probes
    "similarity_hybrid_rrf_fusion": 1,   # [1row] qvec frame x corpus
    "similarity_ivf_multiprobe_topk": 1, # [k] probe assignment x corpus
    "similarity_ivf_nprobe_recall_curve": 1,  # [k] probe assignment x corpus
    "similarity_ivf_topk": 3,            # [q40] + [k] centroids/probes
    "similarity_ivfpq_topk": 3,          # [k] codebooks + [q40]
    "similarity_mmr_rerank": 1,          # [topk] cached rerank frame pairs
    "similarity_mutual_topk": 1,         # [topk] cached top-k pair frame
    "similarity_pandas_udf_topk": 1,     # [q40] query frame x corpus
    "similarity_pq_adc_topk": 2,         # [k] codebook + [q40] LUT
    "similarity_pq_recall": 3,           # [k] codebook + [q40] frames
    "similarity_radius_search": 2,       # [q40] query frames
    "similarity_retrieval_with_metadata": 1,  # [q40] + join-back on vec_id
    "similarity_triplet_margin_audit": 1,     # [q40] anchor frame
    "tpch_q7_nation_volume": 1,          # [dim] nation n1 x n2 (25 rows)
    "tpch_q8_market_share": 1,           # [dim] nation n1 x n2 (25 rows)
    "orders_friedman_priority_ranks": 2,  # [block] within-week pair join, ≤5 rows/block
    "events_cross_correlation_lagged": 1,  # [dim] day-spine x shifted day-spine
                                           # (time-range bounded; date join key
                                           # unique per side, x7 lag dim)
                                          # ((wn,g) unique ⇒ ≤k=5 per block; the
                                          # full-block filter join is reordered
                                          # across both pair sides)
}

_R5_PRUNE_NODES = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}
_R5_PRUNE_JOIN_TYPES = {"LeftSemi", "LeftAnti"}
_R5_LEAF_CLASSES = {
    "LogicalRelation",
    "InMemoryRelation",
    "LocalRelation",
    "LogicalRDD",
    "DataSourceV2Relation",
    "Range",
}


def _jseq(seq):
    return [seq.apply(i) for i in range(seq.size())]


def _r5_is_rank_prune(node):
    """Filter whose input is a Window through Projects — the top-k /
    anchor rank-cap shape (per-group cardinality cut to a constant)."""
    if node.nodeName() != "Filter":
        return False
    ch = _jseq(node.children())
    while ch:
        c = ch[0]
        n = c.nodeName()
        if n == "Window":
            return True
        if n != "Project":
            return False
        ch = _jseq(c.children())
    return False


def _r5_raw_leaves(node):
    """Leaf signatures (class, sorted output column names) reachable
    from `node` without passing a cardinality-reducing or
    prune-applying node."""
    if node.nodeName() in _R5_PRUNE_NODES:
        return set()
    if (
        node.nodeName() == "Join"
        and node.joinType().toString() in _R5_PRUNE_JOIN_TYPES
    ):
        return set()
    if _r5_is_rank_prune(node):
        return set()
    cls = node.getClass().getSimpleName()
    ch = _jseq(node.children())
    if cls in _R5_LEAF_CLASSES or not ch:
        cols = tuple(sorted(a.name() for a in _jseq(node.output())))
        return {(cls, cols)}
    out = set()
    for c in ch:
        out |= _r5_raw_leaves(c)
    return out


# Rule 6 (round-13, gating the round-12 verdict's NEW hazard class):
# AQE's input-byte partition coalescing under-provisions a stage whose
# per-row compute is SUPERLINEAR — it sees 3 MB of joined pair input,
# picks 1 partition, and serializes an O(len^2)-per-pair edit-distance
# stage onto one core (the levenshtein 15 s -> 1.8 s round-12 fix).
# Static signature: a plan node whose OWN expressions invoke
# `levenshtein` while its subtree contains an Inner/Cross join (a
# pair-distance stage). Every such stage must carry an EXPLICIT-WIDTH
# RepartitionByExpression in its subtree — `df.repartition(n, cols)`,
# which AQE's coalescer is contractually forbidden to shrink; a bare
# `repartition(cols)` does NOT count (user repartitions without a
# number are coalescible). Audited exceptions go in _R6_EXPANSION_OK
# with a bounds note, like rules 1-5.
_R6_EXPANSION_OK: dict = {}

_R6_SUPERLINEAR_FNS = ("levenshtein",)


def _r6_has_inner_join(node):
    stack = [node]
    while stack:
        n = stack.pop()
        if n.nodeName() == "Join" and n.joinType().toString() in (
            "Inner",
            "Cross",
        ):
            return True
        stack.extend(_jseq(n.children()))
    return False


def _r6_has_pinned_repartition(node):
    stack = [node]
    while stack:
        n = stack.pop()
        if n.nodeName() == "RepartitionByExpression":
            try:
                if n.optNumPartitions().isDefined():
                    return True
            except Exception:
                # API drift fallback: the string form renders the
                # explicit count as a trailing ", <n>".
                import re as _re

                if _re.search(r",\s*\d+\s*$", n.simpleString(1000)):
                    return True
        stack.extend(_jseq(n.children()))
    return False


def _unpinned_superlinear_stages(optimized_jplan):
    """Nodes computing a superlinear per-row function over a pair-join
    subtree WITHOUT an explicit-width repartition pinning the stage."""
    out = []
    stack = [optimized_jplan]
    while stack:
        node = stack.pop()
        ch = _jseq(node.children())
        stack.extend(ch)
        s = node.simpleString(10000)
        if not any(fn + "(" in s for fn in _R6_SUPERLINEAR_FNS):
            continue
        if not _r6_has_inner_join(node):
            continue
        if not _r6_has_pinned_repartition(node):
            out.append(node.nodeName() + ": " + s[:200])
    return out


def _unpruned_self_joins(optimized_jplan):
    """Inner/Cross join nodes in the optimized logical plan where both
    sides reach the same raw (unpruned) source leaf."""
    out = []
    stack = [optimized_jplan]
    while stack:
        node = stack.pop()
        ch = _jseq(node.children())
        stack.extend(ch)
        if node.nodeName() != "Join":
            continue
        if node.joinType().toString() not in ("Inner", "Cross"):
            continue
        shared = _r5_raw_leaves(ch[0]) & _r5_raw_leaves(ch[1])
        if shared:
            out.append(sorted(shared))
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_sane(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    jopt = df._jdf.queryExecution().optimizedPlan()
    optimized = jopt.toString()
    scans = _parquet_scans(df)
    self_joins = _unpruned_self_joins(jopt)
    unpinned6 = _unpinned_superlinear_stages(jopt)
    release_caches()
    # 1. No unbounded cartesian products outside the whitelist.
    if name not in _NONEQUI_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
    # 2. No row-at-a-time Python UDFs anywhere (Arrow batch ops show up
    #    as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    # 2b. No single-partition window over a data-proportional frame: an
    #     empty-partition window spec is allowed only on the audited
    #     bounded frames above, or when ordered by a __bounded marker
    #     column (operators/ordering.two_phase_order's #partitions-row
    #     offsets frame — bounded by construction).
    if name not in _GLOBAL_WINDOW_OK:
        offenders = [
            s for s in _empty_partition_windows(plan) if "__bounded" not in s
        ]
        assert not offenders, (
            f"{name}: window with EMPTY partition spec over an unbounded "
            f"frame (single-task sort at scale): {offenders[0]}"
        )
    # 4. Forced broadcast hints only on audited bounded frames: a
    #    `strategy=broadcast` join hint in the optimized logical plan
    #    means an explicit F.broadcast() in the code — a frame the plan
    #    SHIPS THROUGH THE DRIVER regardless of
    #    autoBroadcastJoinThreshold, which OOMs at 100x if the frame is
    #    data-proportional (the round-9 verdict's multimodal finding).
    #    Un-hinted joins stay free to broadcast via AQE runtime stats.
    n_hints = optimized.count("strategy=broadcast")
    allowed = _HINTED_BROADCAST_OK.get(name, 0)
    assert n_hints <= allowed, (
        f"{name}: {n_hints} forced broadcast hint(s) in the optimized "
        f"plan but only {allowed} audited as bounded — a new "
        "F.broadcast() needs a bounded-frame audit entry in "
        "_HINTED_BROADCAST_OK (or drop the hint and let AQE decide)"
    )
    # 5. Candidate-pair self-joins must apply their cap/prune UPSTREAM
    #    of the pair join (round-11 verdict's prune-after-expansion
    #    class): any Inner/Cross join reaching the same unpruned source
    #    on both sides needs an audit entry naming why it is linear or
    #    bounded by construction.
    allowed5 = _SELF_JOIN_PAIR_OK.get(name, 0)
    assert len(self_joins) <= allowed5, (
        f"{name}: {len(self_joins)} unpruned self-join(s) in the "
        f"optimized plan but only {allowed5} audited — shared raw "
        f"leaves: {self_joins} — restructure so the cap/prune frame "
        "joins UPSTREAM of the pair join (semi-join it into both "
        "sides, or anchor-decompose an OR-cap), or audit the join as "
        "linear/bounded in _SELF_JOIN_PAIR_OK"
    )
    # 6. Superlinear pair stages must pin their width (round-12
    #    verdict's AQE input-byte-coalescing class): a node computing
    #    levenshtein over a pair-join subtree needs an explicit-width
    #    repartition (df.repartition(n, cols)) in that subtree — AQE
    #    sizes stages by input BYTES and will coalesce a few-MB pair
    #    stage onto one core while its compute expands quadratically.
    allowed6 = _R6_EXPANSION_OK.get(name, 0)
    assert len(unpinned6) <= allowed6, (
        f"{name}: {len(unpinned6)} superlinear pair stage(s) without an "
        f"explicit-width repartition (only {allowed6} audited): "
        f"{unpinned6[:1]} — add .repartition(n, <block cols>) upstream "
        "of the distance stage, or audit in _R6_EXPANSION_OK"
    )
    # 3. Column pruning reaches every parquet scan: a scan over a gated
    #    (>= 5 column) testdata table must read a STRICT subset of the
    #    table's physical schema — an all-columns scan under a
    #    projecting query means pruning broke.
    if name in _FULL_SCAN_OK:
        return
    for paths, fields in scans:
        for t in _PRUNE_GATED:
            if f"{SF}/{t}.parquet" in paths:
                assert not fields >= _FULL_SCHEMA[t], (
                    f"{name}: scan of {t} reads all {len(fields)} columns "
                    "(no column pruning)"
                )


def test_readme_counts_are_current(request):
    # README's header counts are generated (tools/gen_readme_counts.py)
    # and pinned here the way CATALOG.md is: the query phrase against
    # the live registry always, the test count against this very
    # session's collected item count whenever the full suite runs
    # (subset runs can't know the total, so they check only the query
    # phrase). Round-12: the hand-maintained counts drifted two rounds
    # running.
    import pathlib
    import re

    from deathmetal_datalake_spark.plans import ORACLES

    readme = (
        pathlib.Path(__file__).resolve().parent.parent / "README.md"
    ).read_text()
    phrase = f"{len(QUERIES)} named queries, ALL {len(ORACLES)} with"
    assert phrase in readme, (
        f"README query count is stale (expected '{phrase}') — run "
        "`python tools/gen_readme_counts.py`"
    )
    # Full-run detection from the invocation itself, not a magic item
    # threshold (round-12 ADVICE): the count check applies whenever no
    # selection/deselection narrowed the collection — no -k/-m
    # expression, no per-file/per-test path args, no --lf/--co tricks —
    # so a shrinking suite still gets its count pinned.
    cfg = request.config
    narrowed = bool(
        cfg.getoption("keyword", default="")
        or cfg.getoption("markexpr", default="")
        or cfg.getoption("--last-failed", default=False)
        or any("::" in a or a.endswith(".py") for a in cfg.args)
    )
    items = request.session.items
    if not narrowed:
        m = re.search(r"(\d+) tests:", readme)
        assert m, "README test-count phrase missing"
        assert int(m.group(1)) == len(items), (
            f"README says {m.group(1)} tests but this full run collected "
            f"{len(items)} — run `python tools/gen_readme_counts.py`"
        )


def test_catalog_index_is_current():
    # docs/CATALOG.md is generated from the registry
    # (tools/gen_catalog_index.py); this pins doc/code drift — if a
    # query is added/moved without regenerating, the diff shows here.
    import pathlib

    from tools.gen_catalog_index import render

    committed = (
        pathlib.Path(__file__).resolve().parent.parent / "docs" / "CATALOG.md"
    ).read_text()
    assert committed == render(), (
        "docs/CATALOG.md is stale — run `python tools/gen_catalog_index.py`"
    )


def test_cited_receipt_files_exist():
    # Round-12 verdict finding #2: docs/NEXT.md cited a sweep receipt
    # (docs/SWEEP_r12.json) that was never committed. Any
    # docs/SWEEP_r*.json or docs/BENCH_FULL.json path cited in a
    # committed markdown file must exist in the tree — a cited receipt
    # is a claim, and claims need their evidence present.
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    md_files = list(root.glob("*.md")) + list((root / "docs").glob("*.md"))
    # VERDICT/ADVICE are DRIVER-written judgments — they may legitimately
    # DISCUSS a receipt that was never produced (that is the round-12
    # finding this gate exists to prevent in builder-maintained docs).
    md_files = [m for m in md_files if m.name not in ("VERDICT.md", "ADVICE.md")]
    missing = []
    for md in md_files:
        text = md.read_text()
        for ref in set(re.findall(r"docs/(?:SWEEP_r\d+|BENCH_FULL)\.json", text)):
            if not (root / ref).exists():
                missing.append(f"{md.name} cites {ref}")
    assert not missing, f"cited receipts missing from the tree: {missing}"


def test_next_md_counts_match_registry():
    # NEXT.md is the round-handoff document; its headline catalog count
    # drifted in round 12 ("390 queries" vs the registry's 396). Pin
    # the stated count to the live registry the way README's is.
    import pathlib
    import re

    from deathmetal_datalake_spark.plans import ORACLES

    text = (
        pathlib.Path(__file__).resolve().parent.parent / "docs" / "NEXT.md"
    ).read_text()
    m = re.search(r"\*\*(\d+) queries / (\d+) exact oracles\*\*", text)
    assert m, (
        "NEXT.md must state the catalog size as '**N queries / M exact "
        "oracles**' so this gate can pin it"
    )
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLES)), (
        f"NEXT.md says {m.group(0)} but the registry holds "
        f"{len(QUERIES)} queries / {len(ORACLES)} oracles — refresh NEXT.md"
    )
