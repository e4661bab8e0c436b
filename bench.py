#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + execution to completion. Small
results are drained with ``collect`` (matching how the driver consumes
them). Large results are drained with an xxhash64-of-every-column
aggregate: ``count()`` would let Catalyst prune computed columns and
time little more than the scan, while hashing every output column
forces the full projection/window/regex work without materializing
millions of rows on the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from deathmetal_datalake_spark.session import get_spark
from deathmetal_datalake_spark.plans import QUERIES
from deathmetal_datalake_spark.plans.registry import release_caches

# Headline set: the flagship chain, the gold-mart analogs, the TPC-H
# volume queries, and one representative of each extension family.
BENCH_QUERIES = [
    "flagship_multijoin",
    "g1_top10_customers_per_nation",
    "g2_customer_order_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    "tpch_q6_forecast_revenue",
    "window_running_total",
    "events_sessionization_30min",
    "events_tumbling_5min",
    "text_quality_scores",
    "text_language_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "similarity_bruteforce_topk",
    "similarity_ann_lsh_topk",
    "tpch_q10_returned_items",
    "multimodal_decode_stats",
    # round 2: remaining TPC-H shapes + corpus-assembly family
    "tpch_q2_min_cost_supplier",
    "tpch_q21_waiting_supplier",
    "contamination_ngram_overlap",
    "pack_sequences_by_lang",
    "sample_stratified_by_lang",
    "dedup_simhash_pairs",
    "kmeans_two_rounds",
    "events_asof_click_before_purchase",
    "text_tfidf_top_terms",
    # round 3: multi-probe indexes, calibration/eval audits, repetition
    # scoring, survivorship, versioned-table time travel
    "dedup_simhash_multiprobe",
    "similarity_ivf_multiprobe_topk",
    "similarity_ann_recall",
    "dedup_minhash_calibration",
    "text_repetition_scores",
    "dedup_cluster_canonical",
    "embedding_int8_quantization",
    "catalog_snapshot_time_travel",
    # round 3 (cont.): CDC diff, novelty, cross-method + graph audits,
    # truncation recall
    "catalog_snapshot_diff",
    "text_ngram_novelty",
    "dedup_method_agreement",
    "dedup_graph_triangles",
    "similarity_dim_truncation_recall",
    "pipeline_daily_increment",
    "events_gap_filled_5min",
    # late round 3: row-level deletes + CDC over the versioned table
    "catalog_delete_takedown",
    "catalog_changes_cdc",
    "catalog_stats_pruned_scan",
    # exact-substring (span) dedup — the Lee-et-al pass
    "dedup_exact_substring",
    # record-transport replay + trailing-frame anomaly scoring
    "streaming_transport_replay",
    "events_trailing_zscore",
]

# Queries whose full result is large; drain with a hash aggregate
# instead of collect() so driver materialization doesn't dominate the
# timing while every computed column is still forced.
_HASH_DRAIN = {
    "flagship_multijoin",
    "g2_customer_order_stats",
    "window_running_total",
    "events_sessionization_30min",
    "events_tumbling_5min",
    "text_quality_scores",
    "text_language_id",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_exact_substring",
    "events_trailing_zscore",
    "multimodal_decode_stats",
    "contamination_ngram_overlap",
    "pack_sequences_by_lang",
    "sample_stratified_by_lang",
    "dedup_simhash_pairs",
    "events_asof_click_before_purchase",
    "text_tfidf_top_terms",
    "dedup_simhash_multiprobe",
    "dedup_minhash_calibration",
    "text_repetition_scores",
    "dedup_cluster_canonical",
    "catalog_snapshot_diff",
    "text_ngram_novelty",
    "events_gap_filled_5min",
    "catalog_delete_takedown",
    "catalog_changes_cdc",
}


def _run_suite(spark, sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        start = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        if name in _HASH_DRAIN:
            df.agg(F.sum(F.xxhash64(*df.columns))).collect()
        else:
            df.collect()
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr, flush=True)
        release_caches()  # free shared-subplan caches between queries
    return timings


def _sf_tag(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="deathmetal-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/code paths once so the measured numbers reflect
    # steady-state execution, not first-query classloading. The write
    # path (parquet output committer) is warmed too: the versioned-table
    # entries are the session's first writers and would otherwise pay
    # one-time committer classloading inside their measurement.
    import tempfile

    QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir).collect()
    with tempfile.TemporaryDirectory(prefix="dml-bench-warm-") as d:
        spark.range(8).write.mode("overwrite").parquet(os.path.join(d, "warm"))

    timings = _run_suite(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_tag(sf_dir),
            }
        )
    )

    # Optional second point for the scaling slope: when
    # SPARK_GRAFT_SCALE_DIR names a larger dataset (e.g. the 10×
    # scratch copy, docs/SCALING.md §5), run the same suite there and
    # emit a SECOND JSON line with a distinct metric name. Sub-linear
    # total growth vs the data-size ratio is the signal that plans
    # scale by partitioning, not by luck.
    scale_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR")
    if scale_dir and os.path.isdir(scale_dir):
        scale_timings = _run_suite(spark, scale_dir)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_scale",
                    "value": round(sum(scale_timings.values()), 3),
                    "unit": "sec",
                    "queries": scale_timings,
                    "sf": _sf_tag(scale_dir),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
