#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Noise protocol (docs/SCALING.md documents ±2-3× host noise): each query
runs $SPARK_GRAFT_REPS times (default 3); ``queries``/``value`` carry
the per-query MEDIANS and ``queries_min`` the per-query minima, so
round-over-round deltas are separable from scheduler luck.

Scaling slope: at the default sf0.1 the suite also runs once against a
10× scratch dataset (built via tools/make_scale10x.build on first use,
cached at /tmp/dml-scale10x and reused across driver rounds). Skip
with SPARK_GRAFT_SCALE=0, or point SPARK_GRAFT_SCALE_DIR at a
prebuilt directory. Sub-linear scale/base growth vs the 10× data
ratio is the signal that plans scale by partitioning, not by luck.

Output contract (round-4 lesson — the driver's stdout capture keeps
only the LAST 2000 characters, and BENCH_r04 recorded
``"parsed": null`` because the full record overflowed it): the FULL
record (medians + minima + the per-query 10× scale breakdown) is
written to ``docs/BENCH_FULL.json`` ONLY when ``SPARK_GRAFT_SEAL=1``
(a deliberate canary-checked sealing run); every other invocation
writes it to a scratch path under $TMPDIR so ad-hoc/driver runs never
shadow the sealed record (round-12 gating); stdout gets exactly ONE final
compact JSON line — ``{metric, value, canary, unit, sf, queries,
...}`` rendered by :func:`render_compact_line`, which sheds precision
and derivable envelope fields level by level so the per-query dict is
NEVER dropped (round-13 verdict #1) — and nothing is printed to
stdout after it. ``canary`` (round-9) is a
pinned data-independent CPU burn timed right before each suite: two
records are comparable only after normalizing by their canary ratio
(docs/BENCH_GOVERNANCE.md "Cross-record normalization").

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
import tempfile
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
    # (similarity_ann_lsh_topk rotated out late round 6 for the new PQ
    # family's ADC query — the ANN-LSH two-scale history lives in
    # docs/BENCH_FULL.json through r6, and the family keeps ivf_multiprobe
    # + ann_recall representatives.)
    "similarity_pq_adc_topk",
    "tpch_q10_returned_items",
    "multimodal_decode_stats",
    # round 2: remaining TPC-H shapes + corpus-assembly family
    "tpch_q2_min_cost_supplier",
    "tpch_q21_waiting_supplier",
    "contamination_ngram_overlap",
    "pack_sequences_by_lang",
    # (sample_stratified_by_lang rotated out round 7, stdout budget —
    # the corpus family keeps pack_sequences + dsir.)
    "dedup_simhash_pairs",
    "kmeans_two_rounds",
    # (events_asof_click_before_purchase rotated out round 7 to keep
    # per-query medians on the compact stdout line after three round-7
    # queries rotated in; the as-of shape stays covered by its
    # streaming twin in CORRECTNESS and the two-scale history lives in
    # docs/BENCH_FULL.json through r7.)
    "text_tfidf_top_terms",
    # round 3: multi-probe indexes, calibration/eval audits, repetition
    # scoring, survivorship, versioned-table time travel
    # (dedup_simhash_multiprobe rotated out round 11 (late), stdout
    # budget for the round-11 rotation — the multi-probe shape stays
    # benched via similarity_ivf_multiprobe_topk and the simhash family
    # via dedup_simhash_pairs; dedup keeps 9 benched representatives,
    # two-scale history in docs/BENCH_FULL.json through the r11 seal.)
    "similarity_ivf_multiprobe_topk",
    # (similarity_ann_recall rotated out late round 6 for
    # similarity_filtered_ann — the recall-audit shape stays covered by
    # the filtered variant; two-scale history in docs/BENCH_FULL.json.)
    # (dedup_minhash_calibration rotated out round 11, stdout budget
    # for the round-10 statistics rotation — the banded-LSH shape stays
    # benched via dedup_minhash_lsh and the df-cap audit via
    # dedup_shingle_df_profile; dedup keeps 9 benched representatives,
    # two-scale history in docs/BENCH_FULL.json through r10.)
    # (text_repetition_scores rotated out late round 6 for
    # corpus_dsir_importance — text kept 7 other representatives.
    # dedup_cluster_canonical and embedding_int8_quantization rotated
    # out round 7 for the same stdout-budget reason — the dedup family
    # keeps 9 benched representatives, the embedding/PQ family keeps
    # pq_adc + filtered_ann + sign_quant.)
    "catalog_snapshot_time_travel",
    # round 3 (cont.): CDC diff, novelty, cross-method + graph audits,
    # truncation recall
    # (catalog_snapshot_diff rotated out round 11, stdout budget — the
    # snapshot-compare shape stays benched via catalog_changes_cdc,
    # whose CDC diff is a superset; catalog keeps 5 benched
    # representatives, two-scale history in docs/BENCH_FULL.json
    # through r10.)
    "text_ngram_novelty",
    "dedup_method_agreement",
    # (dedup_graph_triangles rotated out late round 6 for
    # multimodal_phash_neardup — dedup kept 10 other representatives.
    # similarity_dim_truncation_recall rotated out round 8, stdout
    # budget — similarity keeps 6 benched representatives.)
    "pipeline_daily_increment",
    # (events_gap_filled_5min rotated out in round 6 to keep the
    # compact stdout line under the driver's 2000-char tail capture
    # with per-query medians intact — the events family keeps four
    # representatives and the gap-fill two-scale history lives in
    # docs/BENCH_FULL.json through r5.)
    # late round 3: row-level deletes + CDC over the versioned table
    "catalog_delete_takedown",
    "catalog_changes_cdc",
    # (catalog_stats_pruned_scan rotated out round 9, stdout budget —
    # its runtime is ~write-construction-bound like bloom_point_lookup,
    # the catalog family keeps 6 benched representatives, and the
    # two-scale history is in docs/BENCH_FULL.json through r8.)
    # exact-substring (span) dedup — the Lee-et-al pass
    "dedup_exact_substring",
    # record-transport replay + trailing-frame anomaly scoring
    "streaming_transport_replay",
    "events_trailing_zscore",
    # round 4: hidden-partitioning spec pruning + colocated bucket join
    "catalog_partition_pruned_scan",
    "catalog_bucket_colocated_join",
    # round 4 (cont.): corpus-gate operators + schema evolution
    # (dedup_bloom_prefilter rotated out round 8, stdout budget — dedup
    # keeps 8 benched representatives; two-scale history in
    # docs/BENCH_FULL.json through r7.)
    # (text_bpe_merge_step rotated out round 11 (late), stdout budget —
    # text keeps 6 benched representatives incl. the core quartet;
    # two-scale history in docs/BENCH_FULL.json through the r11 seal.)
    # round 5: semantic dedup over embeddings (IVF-cell SemDeDup) +
    # BM25 retrieval (rational-IDF, corpus-linear)
    "dedup_semdedup_ivf",
    "text_bm25_retrieval",
    # round 6: broker-adapter group-consume replay (Kafka mapping with
    # byte<->record offset translation; the fake broker is in-process,
    # so unlike the HTTP twin this times the adapter itself)
    "streaming_kafka_group_replay",
    # (catalog_decimal_widening_read and text_unigram_logfreq_score
    # rotated out round 8, stdout budget: the widening read was rotated
    # in to watch the r6 hash failure and has been green for two rounds
    # (r7 driver pass + sweeps); the catalog family keeps 7 and text 7
    # benched representatives. Two-scale histories in BENCH_FULL.json.)
    # late round 6: Arrow pHash + banded-LSH media near-dup, DSIR
    # hashed-unigram importance selection, and filtered vector search
    # (metadata predicate inside the IVF probe, recall audited)
    "multimodal_phash_neardup",
    "corpus_dsir_importance",
    "similarity_filtered_ann",
    # round 7: char-level winnowing (the suite's heaviest per-byte text
    # probe: one gram per character through a window min), 1-bit
    # quantized retrieval with its brute-force recall audit, and the
    # Markov transition rollup (lag window + bounded aggregate)
    "text_winnowing_fingerprint",
    # (similarity_binary_sign_quant rotated out round 12, stdout
    # budget — the 1-bit quantized retrieval shape stays covered by
    # similarity_pq_adc_topk (codebook quantization) and
    # similarity_filtered_ann; similarity keeps 4 benched
    # representatives, two-scale history in docs/BENCH_FULL.json
    # through r11.)
    # (events_type_transition_matrix rotated out round 9, stdout
    # budget — the events family keeps 4 benched representatives incl.
    # peak_concurrency, which exercises the same lag-window shape;
    # two-scale history in docs/BENCH_FULL.json through r8.)
    # round 8: the sweep-line concurrency audit (new window shape), the
    # shingle-df audit behind the _MAX_DF cap (one full shingle pass),
    # and threshold-based range retrieval (O(n*40) broadcast scan)
    # (events_peak_concurrency rotated out round 11 (late), stdout
    # budget — the sweep-line shape stays covered by its streaming twin
    # in CORRECTNESS; events keeps 6 benched representatives incl. the
    # core trio, two-scale history through the r11 seal.)
    # (dedup_shingle_df_profile rotated out round 12, stdout budget —
    # the full-shingle-pass shape stays benched via dedup_ngram_jaccard
    # (same explode + df aggregate upstream of its cap); dedup keeps 8
    # benched representatives, two-scale history through the r11 seal.)
    # (similarity_radius_search rotated out round 11, stdout budget —
    # the broadcast-scan threshold shape stays benched via
    # similarity_filtered_ann; similarity keeps 5 benched
    # representatives, two-scale history in docs/BENCH_FULL.json
    # through r10.)
    # round 9: the Lorenz-decile audit (distributed two-phase rank +
    # decimal running sum — the new ordering helper's showcase) and the
    # stream-static broadcast enrichment (the 26th replay's join shape)
    "orders_pareto_concentration",
    "streaming_static_enrich_replay",
    # NOT here: dq_candidate_key_multitable — five-table scan whose
    # runtime is dominated by lineitem distincts the TPC-H family
    # already times; two-scale profile in docs/SCALING.md §Round 9,
    # CORRECTNESS covers it every round.
    # NOT here: catalog_bloom_point_lookup — its runtime is ~80%
    # deliberate 7-write table construction + opt-in bloom harvest
    # (write-side costs the catalog family already represents via
    # catalog_stats_pruned_scan); its two-scale profile is recorded in
    # docs/SCALING.md instead, and CORRECTNESS covers it every round.
    # NOT here: streaming_remote_transport_replay — per-record HTTP
    # round-trips to a subprocess broker dominate (protocol-bound by
    # design, like its local twin streaming_transport_replay at ~6 s,
    # which IS benched); CORRECTNESS covers it every round.
    # NOT here: catalog_rename_evolution_read — runtime is deliberate
    # multi-write table construction like bloom_point_lookup.
    # Rotated IN round 10 (newest-first, per governance): one
    # representative per new family — the real-FLAC Arrow round-trip,
    # the nonparametric drift pair's rank-sum half (KS shares its
    # era-split scan shape), and the bounded-DP attribution model.
    "multimodal_flac_roundtrip_stats",
    "dq_mannwhitney_value_drift",
    "events_markov_attribution",
    # Rotated IN round 11 (newest-first, per governance): the remaining
    # round-10 statistics batches — rank-transform correlation, the
    # dyadic wavelet energy pyramid, and variance-proportional stratum
    # allocation.
    "text_signal_spearman",
    # (events_haar_energy_levels + sample_neyman_allocation rotated out
    # round 12, stdout budget — the statistics family keeps 5 benched
    # representatives (mannwhitney, wasserstein, spearman, markov
    # attribution, gini) and the bounded-frame allocation shape stays
    # covered by corpus_dsir_importance + pack_sequences_by_lang;
    # two-scale histories in docs/BENCH_FULL.json through r11.)
    # Rotated IN round 11 (late, newest-first): one representative per
    # new round-11 family axis — the 1-D Wasserstein drift (two-phase
    # ECDF + rank equi-join), edit-distance blocking dedup (levenshtein
    # at scale behind the counted heavy-block cap), and the cohort
    # retention triangle (per-user first-active + distinct cells).
    "dq_wasserstein_value_drift",
    "dedup_levenshtein_block_pairs",
    "events_cohort_retention_triangle",
    # Rotated IN round 12 (newest-first, per governance): one
    # representative per new family axis — banded-length edit-distance
    # dedup (the adjacent-bucket pair branches + rule-5 upstream
    # prune), the Gini concentration scalar (128-bit rank-weighted
    # sums over the two-phase rank), the Gopher quality-rule battery
    # (integer cross-multiplied thresholds, map-only), and the
    # 29th streaming replay (32-bucket mergeable histogram state).
    "dedup_levenshtein_banded_lengths",
    "events_gini_user_activity",
    "corpus_gopher_quality_rules",
    "streaming_fixed_histogram_replay",
]

# Governance (round-8, VERDICT r7 #2): the headline set may rotate —
# additions land newest-first, rotations out require (a) the family
# keeps ≥2 representatives, (b) the two-scale history is preserved in
# docs/BENCH_FULL.json (git), (c) a dated comment above names the
# reason. The CORE set below NEVER rotates: 30 queries present since
# their family landed, one-per-shape across the relational, window,
# streaming, text, dedup, similarity, multimodal, catalog, and corpus
# families. Its subtotal (core30_total) is reported every round at both
# scales so round-over-round totals stay comparable even when the full
# headline set's membership changes. Policy: docs/BENCH_GOVERNANCE.md.
CORE_QUERIES = [
    "flagship_multijoin",
    "g1_top10_customers_per_nation",
    "g2_customer_order_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q2_min_cost_supplier",
    "tpch_q10_returned_items",
    "tpch_q21_waiting_supplier",
    "window_running_total",
    "events_sessionization_30min",
    "events_tumbling_5min",
    "events_trailing_zscore",
    "text_quality_scores",
    "text_language_id",
    "text_tfidf_top_terms",
    "text_ngram_novelty",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_method_agreement",
    "dedup_exact_substring",
    "similarity_bruteforce_topk",
    "similarity_ivf_multiprobe_topk",
    "multimodal_decode_stats",
    "contamination_ngram_overlap",
    "pack_sequences_by_lang",
    "catalog_snapshot_time_travel",
]
assert set(CORE_QUERIES) <= set(BENCH_QUERIES), "core must stay benched"
assert len(CORE_QUERIES) == 30

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
    # (sample_stratified_by_lang rotated out round 7, stdout budget —
    # the corpus family keeps pack_sequences + dsir.)
    "dedup_simhash_pairs",
    "events_asof_click_before_purchase",
    "text_tfidf_top_terms",
    # (dedup_simhash_multiprobe rotated out round 11 (late), stdout
    # budget for the round-11 rotation — the multi-probe shape stays
    # benched via similarity_ivf_multiprobe_topk and the simhash family
    # via dedup_simhash_pairs; dedup keeps 9 benched representatives,
    # two-scale history in docs/BENCH_FULL.json through the r11 seal.)
    "dedup_minhash_calibration",
    "text_repetition_scores",
    "dedup_cluster_canonical",
    # (catalog_snapshot_diff rotated out round 11, stdout budget — the
    # snapshot-compare shape stays benched via catalog_changes_cdc,
    # whose CDC diff is a superset; catalog keeps 5 benched
    # representatives, two-scale history in docs/BENCH_FULL.json
    # through r10.)
    "text_ngram_novelty",
    "events_gap_filled_5min",
    "catalog_delete_takedown",
    "catalog_changes_cdc",
    "catalog_bucket_colocated_join",
    "text_unigram_logfreq_score",
    "text_winnowing_fingerprint",
}


def _run_suite(
    spark, sf_dir: str, reps: int = 1
) -> tuple[dict[str, float], dict[str, float]]:
    """Run every headline query ``reps`` times; returns (median, min)
    per-query timing dicts."""
    import statistics

    med: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in BENCH_QUERIES:
        ts: list[float] = []
        for _ in range(reps):
            start = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if name in _HASH_DRAIN:
                df.agg(F.sum(F.xxhash64(*df.columns))).collect()
            else:
                df.collect()
            ts.append(time.perf_counter() - start)
            release_caches()  # free shared-subplan caches between runs
        med[name] = round(statistics.median(ts), 3)
        mins[name] = round(min(ts), 3)
        print(
            f"# {name}: median {med[name]:.3f}s min {mins[name]:.3f}s (n={reps})",
            file=sys.stderr,
            flush=True,
        )
    return med, mins


def _canary(spark, reps: int = 5) -> tuple[float, float]:
    """Noise canary (round-9 verdict #2): a pinned, data-independent,
    IO-free CPU burn — sum of xxhash64 over a generated 4M range —
    whose runtime moves ONLY with host load / JVM state, never with
    catalog changes. Recorded on the compact stdout line at both
    scales so any two bench records (driver vs builder, round N vs
    N+1) can be normalized mechanically: query-time deltas that track
    the canary delta are environment, not regressions.

    Round-10 adjudication finding: at local[32] a 4M-row burn is
    scheduler/JIT-dominated, not compute-dominated — on a VERIFIED-idle
    host the first 8 reps spread 0.21–4.64 s and an 8-thread session
    beats a 32-thread one. The r9 record's base-vs-scale canary gap
    (0.195 vs 0.087) was JVM warm-up state (the scale canary ran after
    the full base suite in the same process), NOT host load. Kept
    bit-identical for cross-record continuity; `_canary2` below is the
    compute-dominated instrument to cite going forward."""
    import statistics

    ts = []
    for _ in range(reps):
        start = time.perf_counter()
        spark.range(4_000_000).agg(F.sum(F.xxhash64("id"))).collect()
        ts.append(time.perf_counter() - start)
    return round(statistics.median(ts), 3), round(min(ts), 3)


def _canary2(spark, reps: int = 5) -> tuple[float, float]:
    """Compute-dominated canary (round-10): 64M-row xxhash64 burn with
    3 unmeasured warm reps so JIT compilation of the hash/range path is
    done before the clock starts. ~16x the work of `_canary` amortizes
    per-task scheduling, so the reading tracks per-core throughput +
    genuine host load and is stable run-to-run on an idle host — the
    number to use when normalizing two bench records against each
    other. Recorded in BENCH_FULL.json alongside cpu count and 1-min
    load average so a record carries its own environment receipt."""
    import statistics

    for _ in range(3):
        spark.range(64_000_000).agg(F.sum(F.xxhash64("id"))).collect()
    ts = []
    for _ in range(reps):
        start = time.perf_counter()
        spark.range(64_000_000).agg(F.sum(F.xxhash64("id"))).collect()
        ts.append(time.perf_counter() - start)
    return round(statistics.median(ts), 3), round(min(ts), 3)


def render_compact_line(payload: dict, budget: int = 1950) -> str:
    """Render the ONE-line stdout JSON within the driver's 2000-char
    tail capture. Round-13 verdict #1: with 58 headline queries the old
    two-step degrade always overflowed and dropped the ``queries`` dict,
    leaving the driver with no per-query times two rounds running. This
    ladder instead sheds precision and DERIVABLE envelope fields, level
    by level, and never drops ``queries``:

      0  today's full format (per-query medians at 2dp)
      1  medians at 1dp
      2  per-query MINIMA at 1dp (integral values as bare ints), marked
         ``"qstat":"min"``; core30 dropped (= sum of the CORE_QUERIES
         entries, recomputable from the dict)
      3  scale block reduced to {value, value_min, sf, ratio_vs_base};
         top-level value_min dropped (derivable: FULL record)
      4  scale block minimal {value (1dp), sf, ratio_vs_base}
      5  scale block replaced by a pointer
      6  minima at 0dp (absolute last resort)

    Shedding priorities: the base per-query dict is the one signal the
    driver's round-over-round/scaling judgment needs (round-13 verdict
    #1), so its precision is shed LAST; ``canary`` (the cross-record
    normalizer — most needed exactly when the host is dirty and the
    line is long) and the ``qstat`` marker survive at EVERY level; the
    scale-block envelope is recoverable from the sealed FULL record,
    so it degrades first. Minima (not medians) at level ≥2 because
    they are the less noisy per-query statistic under host-load bursts
    (docs/SCALING.md); medians + minima both stay in the FULL record.
    Worst cases are pinned by tests/test_bench_contract.py against the
    real BENCH_QUERIES names.
    """

    def _nums(vals: dict, dp: int) -> dict:
        out = {}
        for k, v in vals.items():
            r = round(v, dp)
            out[k] = int(r) if float(r).is_integer() else r
        return out

    def _at(level: int) -> dict:
        c = {
            "metric": payload["metric"],
            "value": payload["value"],
            # canary median at 2dp (stdout-budget — full med+min in the
            # BENCH_FULL record): kept at every level.
            "canary": round(payload["canary"], 2),
            "unit": "sec",
            "sf": payload["sf"],
        }
        if level <= 1:
            c["value_min"] = payload["value_min"]
            c["core30"] = payload["core30_total"]
            c["queries"] = _nums(payload["queries"], 2 if level == 0 else 1)
        else:
            if level == 2:
                c["value_min"] = payload["value_min"]
            c["qstat"] = "min"
            c["queries"] = _nums(payload["queries_min"], 0 if level >= 6 else 1)
        if "scale" in payload:
            s = payload["scale"]
            if level <= 2:
                c["scale"] = {
                    "value": s["value"],
                    "value_min": s["value_min"],
                    "canary": round(s["canary"], 2),
                    "sf": s["sf"],
                    "ratio_vs_base": s["ratio_vs_base"],
                }
                if level <= 1:
                    c["scale"]["core30"] = s["core30_total"]
            elif level == 3:
                c["scale"] = {
                    "value": s["value"],
                    "value_min": s["value_min"],
                    "sf": s["sf"],
                    "ratio_vs_base": s["ratio_vs_base"],
                }
            elif level == 4:
                c["scale"] = {
                    "value": round(s["value"], 1),
                    "sf": s["sf"],
                    "ratio_vs_base": s["ratio_vs_base"],
                }
            else:
                c["scale_in"] = "docs/BENCH_FULL.json"
        return c

    for level in range(7):
        line = json.dumps(_at(level), separators=(",", ":"))
        if len(line) <= budget:
            return line
    return line  # level-6 floor: queries always present


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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    canary_med, canary_min = _canary(spark)
    canary2_med, canary2_min = _canary2(spark)
    # Pre-flight seal gate (round 13): a SEALING run refuses to start
    # on a host whose compute canary exceeds the clean receipt band —
    # a dirty seal becomes structurally impossible instead of a
    # protocol promise (rounds 10-13 each lost a record to exactly
    # this). Threshold: the 0.121 clean receipt + ~15% headroom,
    # overridable for future hardware via SPARK_GRAFT_SEAL_MAX_CANARY2.
    if os.environ.get("SPARK_GRAFT_SEAL") == "1":
        limit = float(os.environ.get("SPARK_GRAFT_SEAL_MAX_CANARY2", "0.14"))
        if canary2_min > limit:
            print(
                f"# SEAL ABORTED: canary2_min {canary2_min} > {limit} "
                "(host not clean; nothing written)",
                file=sys.stderr,
                flush=True,
            )
            print(
                json.dumps(
                    {
                        "metric": "seal_aborted_dirty_canary",
                        "value": canary2_min,
                        "unit": "sec",
                        "queries": {},
                        "sf": _sf_tag(sf_dir),
                    },
                    separators=(",", ":"),
                )
            )
            spark.stop()
            return
    med, mins = _run_suite(spark, sf_dir, reps=reps)
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(med.values()), 3),
        "value_min": round(sum(mins.values()), 3),
        "core30_total": round(sum(med[q] for q in CORE_QUERIES), 3),
        "core30_min": round(sum(mins[q] for q in CORE_QUERIES), 3),
        "canary": canary_med,
        "canary_min": canary_min,
        "canary2": canary2_med,
        "canary2_min": canary2_min,
        "host_cpus": os.cpu_count(),
        "host_load1": round(os.getloadavg()[0], 2),
        "unit": "sec",
        "queries": med,
        "queries_min": mins,
        "reps": reps,
        "sf": _sf_tag(sf_dir),
    }

    # Second point for the scaling slope, embedded in the SAME JSON line
    # (the driver parses exactly one object). Resolution order:
    # SPARK_GRAFT_SCALE_DIR if set; else, at the default sf0.1, the
    # cached-or-built 10× scratch; SPARK_GRAFT_SCALE=0 disables.
    scale_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR")
    scale_tag = _sf_tag(scale_dir) if scale_dir else None
    if not scale_dir and os.environ.get("SPARK_GRAFT_SCALE") != "0" and _sf_tag(
        sf_dir
    ) == 0.1:
        from tools import make_scale10x

        scale_dir, scale_tag = "/tmp/dml-scale10x", "0.1x10"
        if not make_scale10x.is_built(scale_dir):
            print("# building 10x scale scratch...", file=sys.stderr, flush=True)
            make_scale10x.build(spark, scale_dir)
    if scale_dir and os.path.isdir(scale_dir):
        # Per-rep receipts at 10x too (round-6 lesson: a single-rep 10x
        # record left a 21s-vs-3s g2 conflict unresolvable — with
        # median+min recorded, session interference shows up as
        # median >> min instead of poisoning round-over-round deltas).
        sreps = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2")))
        scanary_med, scanary_min = _canary(spark)
        scanary2_med, scanary2_min = _canary2(spark)
        smed, smins = _run_suite(spark, scale_dir, reps=sreps)
        payload["scale"] = {
            "metric": "headline_queries_total_scale",
            "value": round(sum(smed.values()), 3),
            "value_min": round(sum(smins.values()), 3),
            "core30_total": round(sum(smed[q] for q in CORE_QUERIES), 3),
            "core30_min": round(sum(smins[q] for q in CORE_QUERIES), 3),
            "canary": scanary_med,
            "canary_min": scanary_min,
            "canary2": scanary2_med,
            "canary2_min": scanary2_min,
            "host_load1": round(os.getloadavg()[0], 2),
            "unit": "sec",
            "queries": smed,
            "queries_min": smins,
            "reps": sreps,
            "sf": scale_tag,
            "ratio_vs_base": round(sum(smed.values()) / max(sum(med.values()), 1e-9), 3),
        }

    # Full record: stdout gets ONE compact final line that fits the
    # driver's 2000-char tail capture; the full payload goes to the
    # committed docs/BENCH_FULL.json ONLY under SPARK_GRAFT_SEAL=1 (a
    # deliberate, canary-checked sealing run per docs/BENCH_GOVERNANCE.md
    # "Seal gating"). Any other invocation — driver per-round runs,
    # iteration loops — writes a scratch path instead, so contaminated
    # ad-hoc records can never shadow the sealed one in the working
    # tree (the recurring round-10/11 wart).
    repo_root = os.path.dirname(os.path.abspath(__file__))
    if os.environ.get("SPARK_GRAFT_SEAL") == "1":
        full_path = os.path.join(repo_root, "docs", "BENCH_FULL.json")
    else:
        full_path = os.path.join(
            tempfile.gettempdir(), "dml_bench_full_scratch.json"
        )
    try:
        with open(full_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"# full record -> {full_path}", file=sys.stderr, flush=True)
    except OSError as exc:  # read-only checkout: keep benching
        print(f"# full record not written: {exc}", file=sys.stderr, flush=True)

    print(render_compact_line(payload))
    spark.stop()


if __name__ == "__main__":
    main()
