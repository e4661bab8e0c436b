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
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_sane(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = _parquet_scans(df)
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
