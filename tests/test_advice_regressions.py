"""Regression tests for the round-6 ADVICE findings: inputs the stock
test corpus never exercises (single-token documents, empty payloads)
must not abort the plan, and the Spark/DuckDB semantics must agree on
the degenerate branch, not just avoid crashing.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


def _corpus_with(tmp_path, docs_rows, spark):
    """A sibling of sf0.001 whose documents table is replaced by
    crafted rows (other tables are linked in unchanged)."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for name in os.listdir(SF_DIR):
        if name != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    crafted = spark.createDataFrame(docs_rows, base.schema)
    crafted.coalesce(1).write.parquet(str(tmp_path / "docs_tmp"))
    part = [
        f for f in os.listdir(tmp_path / "docs_tmp") if f.endswith(".parquet")
    ][0]
    shutil.copyfile(
        str(tmp_path / "docs_tmp" / part), os.path.join(d, "documents.parquet")
    )
    return d


def _doc_rows(spark, texts):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    template = base.limit(1).collect()[0].asDict()
    rows = []
    for i, t in enumerate(texts):
        r = dict(template)
        r["doc_id"] = i + 1
        r["text"] = t
        rows.append(tuple(r[f.name] for f in base.schema.fields))
    return rows


def test_phash_empty_payload_is_zero():
    from deathmetal_datalake_spark.operators.multimodal import deterministic_phash

    assert deterministic_phash(b"") == 0
    assert deterministic_phash(b"\x00") == 0  # all-equal bytes: no bit set
    assert deterministic_phash(b"abcxyz") != 0


def test_bigram_lift_survives_single_token_and_empty_docs(spark, tmp_path):
    # Single-token doc: Spark's unguarded sequence(1, size-1) would
    # descend to [1, 0] and element_at(toks, 0) aborts; the oracle's
    # end-exclusive range is empty. Both sides must agree: no bigrams.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = [
        "solo",
        "",
        "alpha beta alpha beta",
        "alpha beta gamma alpha beta gamma",
        "beta gamma beta gamma beta gamma",
    ]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    report = compare_query(
        spark,
        "text_bigram_lift",
        QUERIES["text_bigram_lift"],
        ORACLES["text_bigram_lift"],
        d,
    )
    assert report["match"] is True, report


def test_phash_neardup_survives_empty_document(spark, tmp_path):
    # One empty payload used to abort the whole plan on both engines
    # (IndexError in the hasher; '0x' cast failure in the oracle).
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["", "same bytes here", "same bytes here", "other content x"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    report = compare_query(
        spark,
        "multimodal_phash_neardup",
        QUERIES["multimodal_phash_neardup"],
        ORACLES["multimodal_phash_neardup"],
        d,
    )
    assert report["match"] is True, report


def test_heaps_vocab_growth_tiny_corpus_emits_all_checkpoints(spark, tmp_path):
    # Round-8 ADVICE (low): with fewer than 10 documents some
    # checkpoints have an EMPTY doc prefix (cp=0); the old inner join
    # dropped those rows while the oracle's scalar subqueries emit them
    # with NULL SUM / zero COUNT. Both engines must agree on all 10.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["alpha beta", "beta gamma delta", "alpha alpha"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    report = compare_query(
        spark,
        "corpus_heaps_vocab_growth",
        QUERIES["corpus_heaps_vocab_growth"],
        ORACLES["corpus_heaps_vocab_growth"],
        d,
    )
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Round-8 hardening: the seventeen round-8 operators are the newest
# surface — drive the text/corpus ones through a crafted DEGENERATE
# corpus (empty docs, single-token docs, punctuation-only docs, a
# whole source with zero tokens) on BOTH engines before any external
# review finds the edge. This is the corpus_heaps lesson generalized.
# ---------------------------------------------------------------------------

_DEGENERATE_TEXTS = [
    "",                     # empty payload
    "   ",                  # whitespace-only (zero tokens after filter)
    "solo",                 # one token, no sentence terminator
    "...!?.",               # punctuation only: sentences split to nothing
    "a b. c d! e f? g h.",  # regular multi-sentence doc
    "xyz " * 30,            # repetitive doc
    "shared boilerplate sentence here. unique tail one.",
    "shared boilerplate sentence here. unique tail two.",
    "shared boilerplate sentence here. unique tail three.",
]


@pytest.mark.parametrize(
    "name",
    [
        "text_readability_scores",
        "text_boilerplate_lines",
        "corpus_dedup_token_savings",
        "corpus_anneal_apportionment",
        "dedup_cluster_size_histogram",
        "dedup_shingle_df_profile",
        "text_zipf_rank_frequency",
        "corpus_heaps_vocab_growth",
        # the round-8 find: the shingle family crashed on sub-3-token
        # docs (descending sequence -> slice start 0); pin the guard
        # across the whole family plus the unguarded top-bigrams twin
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "text_top_bigrams",
        "contamination_ngram_overlap",
        # round-8 ANSI-division finds: empty docs crashed the quality
        # scorer's punct ratio (zero chars) on the Spark side only
        "text_quality_scores",
        "text_quality_filter",
    ],
)
def test_round8_text_ops_survive_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Degenerate EMBEDDINGS: a zero-norm vector (all-zero embedding — a
# realistic padding/dead-row artifact) must not abort the cosine
# family. Spark 4 runs ANSI mode, so the unguarded ‖a‖·‖b‖ divisor
# raised DIVIDE_BY_ZERO while the DuckDB oracle returned NULL and
# dropped the row — _normprod's NULLIF makes both engines agree.
# ---------------------------------------------------------------------------


def _embeddings_with(tmp_path, spark, rows):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for name in os.listdir(SF_DIR):
        if name != "embeddings.parquet":
            os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    crafted = spark.createDataFrame(rows, base.schema)
    crafted.coalesce(1).write.parquet(str(tmp_path / "emb_tmp"))
    part = [f for f in os.listdir(tmp_path / "emb_tmp") if f.endswith(".parquet")][0]
    shutil.copyfile(
        str(tmp_path / "emb_tmp" / part), os.path.join(d, "embeddings.parquet")
    )
    return d


@pytest.mark.parametrize(
    "name",
    [
        "similarity_bruteforce_topk",
        "similarity_radius_search",
        "dedup_embedding_cosine",
        "embedding_norm_outliers",
        "similarity_mutual_topk",
    ],
)
def test_cosine_family_survives_zero_norm_vector(spark, tmp_path, name):
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rng_rows = []
    for i in range(60):
        # deterministic pseudo-embedding; vec 7 (corpus side) AND
        # vec 50 (a query vector) are all-zero rows
        emb = [0.0] * 64 if i in (7, 50) else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rng_rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rng_rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Degenerate EVENTS: constant-value users (zero variance), single-event
# users, null values/props, identical timestamps (tie-break stress),
# and — the round-8 ANSI find — an experiment window with NO pre-period
# data (every per-user covariate sums to 0, so CUPED's variance
# denominator is exactly zero; Spark's default ANSI mode aborted while
# the oracle yielded NULL).
# ---------------------------------------------------------------------------


def _events_with(tmp_path, spark, rows):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for name in os.listdir(SF_DIR):
        if name != "events.parquet":
            os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
    crafted = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    crafted.coalesce(1).write.parquet(str(tmp_path / "ev_tmp"))
    part = [f for f in os.listdir(tmp_path / "ev_tmp") if f.endswith(".parquet")][0]
    shutil.copyfile(
        str(tmp_path / "ev_tmp" / part), os.path.join(d, "events.parquet")
    )
    return d


def _degenerate_event_rows():
    import datetime

    T0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for k in range(40):  # constant value: zero variance windows
        rows.append((eid, T0 + datetime.timedelta(minutes=10 * k), 1, "click", 5.0, '{"k": 1}'))
        eid += 1
    rows.append((eid, T0 + datetime.timedelta(hours=3), 2, "view", 1.0, '{"k": 2}'))
    eid += 1
    for k in range(5):  # null value + props
        rows.append((eid, T0 + datetime.timedelta(hours=k), 3, "purchase", None, None))
        eid += 1
    for k in range(4):  # identical timestamps
        rows.append((eid, T0 + datetime.timedelta(hours=1), 4, "click", float(k), '{"k":4}'))
        eid += 1
    return rows


@pytest.mark.parametrize(
    "name",
    [
        "events_ab_cuped_adjusted_lift",
        "events_trailing_zscore",
        "events_sessionization_30min",
        "events_peak_concurrency",
        "events_type_transition_matrix",
        "events_asof_click_before_purchase",
        "events_session_features",
        "events_outage_gaps",
    ],
)
def test_events_ops_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_cuped_survives_empty_pre_period(spark, tmp_path):
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2025, 6, 1)  # entirely after _CUPED_CUTOFF
    rows = [
        (i, T0 + datetime.timedelta(hours=i), i % 7, "click", 2.5, None)
        for i in range(50)
    ]
    d = _events_with(tmp_path, spark, rows)
    report = compare_query(
        spark,
        "events_ab_cuped_adjusted_lift",
        QUERIES["events_ab_cuped_adjusted_lift"],
        ORACLES["events_ab_cuped_adjusted_lift"],
        d,
    )
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Degenerate ORDERS: all rows in one drift era (a fresh feed has no
# reference window — n_ref = 0 zeroed the share denominator and
# Spark's ANSI mode aborted the audit where the oracle yields NULL),
# plus sub-1 prices (Benford filter edge), a single-order customer,
# and flat prices (quintile tie stress).
# ---------------------------------------------------------------------------


def _orders_with(tmp_path, spark, rows):
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for name in os.listdir(SF_DIR):
        if name != "orders.parquet":
            os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
    crafted = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    crafted.coalesce(1).write.parquet(str(tmp_path / "o_tmp"))
    part = [f for f in os.listdir(tmp_path / "o_tmp") if f.endswith(".parquet")][0]
    shutil.copyfile(
        str(tmp_path / "o_tmp" / part), os.path.join(d, "orders.parquet")
    )
    return d


@pytest.mark.parametrize(
    "name",
    [
        "dq_distribution_drift_orders",
        "dq_benford_first_digit",
        "dq_candidate_key_uniqueness",
        "events_rfm_quintiles",
        "orders_yoy_revenue_growth",
    ],
)
def test_orders_ops_survive_single_era_orders(spark, tmp_path, name):
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T1 = datetime.datetime(1998, 6, 1)  # entirely after the drift cutoff
    rows = [
        (i, 1, "O", 100.0, T1 + datetime.timedelta(days=i), "1-URGENT")
        for i in range(30)
    ]
    rows.append((30, 2, "F", 0.5, T1, "2-HIGH"))
    rows.append((31, 3, "P", 250000.0, T1, "3-MEDIUM"))
    d = _orders_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Round-9 additions: the new operators against the same degenerate
# batteries — tiny frames (fewer customers than deciles / fewer types
# than coverage checkpoints), duplicate-free corpora (empty crosslingual
# rollup), zero-norm anchors in the triplet audit.
# ---------------------------------------------------------------------------


def test_pareto_concentration_with_fewer_customers_than_deciles(spark, tmp_path):
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T1 = datetime.datetime(1998, 6, 1)
    # 3 customers -> NTILE(10) degenerates to one bucket per customer.
    rows = [
        (i, i % 3, "O", 100.0 * (i + 1), T1, "1-URGENT") for i in range(9)
    ]
    d = _orders_with(tmp_path, spark, rows)
    name = "orders_pareto_concentration"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["text_vocab_mass_coverage", "dedup_crosslingual_exact"]
)
def test_round9_text_ops_survive_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    # Tiny duplicate-free corpus: vocab smaller than most coverage
    # checkpoints (LEFT-join coalesce path), and ZERO duplicate
    # clusters (the crosslingual rollup must emit an empty frame in
    # both engines, not crash).
    d = _corpus_with(
        tmp_path, _doc_rows(spark, ["alpha beta", "gamma", "", "delta epsilon"]),
        spark,
    )
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_triplet_margin_survives_zero_norm_and_single_label(spark, tmp_path):
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(60):
        # anchor 0 (vec_id 0) is all-zero; label 2 has exactly one
        # member (vec 50 — also an anchor), so its pos_cosine side has
        # no same-label candidates -> NULL margin in both engines.
        emb = [0.0] * 64 if i == 0 else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, 2 if i == 50 else i % 2))
    d = _embeddings_with(tmp_path, spark, rows)
    name = "similarity_triplet_margin_audit"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Round-9-continuation battery: the four newest operators (bigram
# surprisal, Kaplan-Meier, daily-volume anomaly, silhouette) through
# the same degenerate inputs as their predecessors — BOTH engines via
# compare_query, before any external review finds the edge.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["text_bigram_surprisal_score"])
def test_bigram_surprisal_survives_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["events_survival_kaplan_meier", "dq_daily_volume_anomaly"]
)
def test_survival_and_anomaly_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_kaplan_meier_all_users_censored(spark, tmp_path):
    # Every user active at the watermark: zero deaths, survival == 1.0
    # at every time point, and no division anywhere goes degenerate.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, T0 + datetime.timedelta(days=i % 3), i % 5, "view", 1.0, None)
        for i in range(30)
    ]
    # everyone's last event within the censor horizon of the watermark
    d = _events_with(tmp_path, spark, rows)
    name = "events_survival_kaplan_meier"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_kaplan_meier_single_day_corpus(spark, tmp_path):
    # All events on ONE day: a single t=0 row, all censored.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, T0 + datetime.timedelta(minutes=i), i % 4, "click", 1.0, None)
        for i in range(12)
    ]
    d = _events_with(tmp_path, spark, rows)
    name = "events_survival_kaplan_meier"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["embedding_silhouette_by_label", "embedding_dimension_robust_stats"]
)
def test_embedding_audits_survive_zero_and_single_label(spark, tmp_path, name):
    # Zero vectors (a == 0 against own centroid when a label holds only
    # zeros) and the general zero-norm artifact rows.
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(60):
        emb = [0.0] * 64 if i in (7, 50) else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["embedding_silhouette_by_label", "embedding_dimension_robust_stats"]
)
def test_embedding_audits_survive_one_label_corpus(spark, tmp_path, name):
    # ONE label in the whole corpus: silhouette's b (nearest OTHER
    # centroid) is NULL for every vector — both engines must agree on
    # the NULL propagation, not crash.
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = [
        (i, [math.cos(0.05 * i + 0.02 * j) for j in range(64)], 1)
        for i in range(20)
    ]
    d = _embeddings_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize("name", ["text_keyphrase_rake"])
def test_rake_survives_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_rake_stopword_only_corpus(spark, tmp_path):
    # Every token is a stopword: zero candidate phrases on both sides.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(
        tmp_path,
        _doc_rows(spark, ["the a and of to in", "the the the", "of and a"]),
        spark,
    )
    name = "text_keyphrase_rake"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize("name", ["events_time_weighted_average"])
def test_twa_survives_degenerate_events(spark, tmp_path, name):
    # Includes the 4 identical-timestamp rows (zero-duration intervals,
    # lead() pairing pinned by the event_id tie-break) and a
    # single-event user/type shape.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_twa_all_simultaneous_type(spark, tmp_path):
    # One type whose events ALL share a timestamp: total duration 0 —
    # NULLIF must yield NULL on both engines, not an ANSI abort.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 5, 1)
    rows = [(i, T0, 1, "burst", float(i), None) for i in range(6)]
    rows += [
        (10 + k, T0 + datetime.timedelta(minutes=k), 2, "steady", 2.0, None)
        for k in range(5)
    ]
    d = _events_with(tmp_path, spark, rows)
    name = "events_time_weighted_average"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["embedding_top_pc_power_iteration"]
)
def test_top_pc_survives_zero_vectors(spark, tmp_path, name):
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(60):
        emb = [0.0] * 64 if i in (7, 50) else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["orders_cohort_ltv", "dq_price_robust_outliers"]
)
def test_cohort_ltv_and_price_mad_survive_single_era_orders(
    spark, tmp_path, name
):
    # Single-customer-dominated corpus, one cohort month, flat prices
    # (median == every value, MAD == 0), sub-1 and 250k price extremes.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T1 = datetime.datetime(1998, 6, 1)
    rows = [
        (i, 1, "O", 100.0, T1 + datetime.timedelta(days=i), "1-URGENT")
        for i in range(30)
    ]
    rows.append((30, 2, "F", 0.5, T1, "2-HIGH"))
    rows.append((31, 3, "P", 250000.0, T1, "3-MEDIUM"))
    d = _orders_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize("name", ["embedding_knn_label_agreement"])
def test_knn_agreement_survives_zero_vectors(spark, tmp_path, name):
    # Zero-norm anchor AND corpus rows: NULL cosines must rank and
    # vote identically on both engines.
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(60):
        emb = [0.0] * 64 if i in (7, 50) else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["dq_chisquare_value_drift", "dq_daily_volume_anomaly"]
)
def test_dq_event_audits_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name",
    [
        "events_seasonal_residual_anomaly",
        "events_user_features",
        "events_survival_kaplan_meier",
    ],
)
def test_batch4_event_ops_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_ship_lag_single_priority_flat_lag(spark, tmp_path):
    # One priority, every line shipping the same day as ordered: lag 0
    # everywhere — histogram selection must interpolate trivially.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T1 = datetime.datetime(1998, 6, 1)
    rows = [
        (i, 1, "O", 100.0, T1 + datetime.timedelta(days=i), "1-URGENT")
        for i in range(10)
    ]
    d = _orders_with(tmp_path, spark, rows)
    # lineitem keeps its real payload; orders shrink to 10 keys, so
    # most lines drop out of the inner join — the thin-join edge.
    name = "orders_ship_lag_quantiles"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_burst_episodes_merge_consecutive_hot_minutes(spark, tmp_path):
    # Crafted bursts: minutes 0-3 hot (one 4-minute episode), minute 6
    # hot (singleton), minute 10 cold — the island merge itself, which
    # the driver corpus never exercises at base scale (no consecutive
    # hot minutes there).
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for minute, n in [(0, 3), (1, 4), (2, 2), (3, 5), (6, 2), (10, 1)]:
        for k in range(n):
            rows.append(
                (eid, T0 + datetime.timedelta(minutes=minute, seconds=k),
                 1, "click", 1.0, None)
            )
            eid += 1
    d = _events_with(tmp_path, spark, rows)
    name = "events_burst_episodes"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    got = QUERIES[name](spark, d).collect()
    clicks = [r for r in got if r["event_type"] == "click"]
    assert [(r["n_minutes"], r["n_events"]) for r in clicks] == [(4, 14), (1, 2)]


@pytest.mark.parametrize("name", ["text_mattr_lexical_diversity"])
def test_mattr_survives_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def _tables_with(tmp_path, spark, crafted: dict):
    """Symlink the sf dir, replacing the named tables with crafted
    frames (generalizes _orders_with/_events_with to several tables)."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for name in os.listdir(SF_DIR):
        if name[:-8] not in crafted:  # strip .parquet
            os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
    for t, (rows, schema) in crafted.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"{t}_tmp")
        )
        part = [
            f for f in os.listdir(tmp_path / f"{t}_tmp") if f.endswith(".parquet")
        ][0]
        shutil.copyfile(
            str(tmp_path / f"{t}_tmp" / part), os.path.join(d, f"{t}.parquet")
        )
    return d


def test_ols_zero_variance_brand(spark, tmp_path):
    # Brand A: every line the SAME discount (variance 0 -> slope and
    # r2 NULL via NULLIF on both engines, no ANSI abort). Brand B: a
    # perfect line (r2 == 1). Brand C: a single line.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    li_rows = []
    for i in range(8):  # brand A: flat discount
        li_rows.append((1, 100 + 0, 1, i, float(10 + i), 100.0, 0.05, 0.0,
                        "N", "O", None))
    for i in range(6):  # brand B: qty = 100*discount + 1 exactly
        disc = round(0.01 * i, 2)
        li_rows.append((2, 101, 1, i, 100.0 * disc + 1.0, 100.0, disc, 0.0,
                        "N", "O", None))
    li_rows.append((3, 102, 1, 0, 7.0, 100.0, 0.03, 0.0, "N", "O", None))
    part_rows = [(100, "pa", "BRAND#A", "t", 1, 1.0),
                 (101, "pb", "BRAND#B", "t", 1, 1.0),
                 (102, "pc", "BRAND#C", "t", 1, 1.0)]
    d = _tables_with(tmp_path, spark, {
        "lineitem": (li_rows,
                     "l_orderkey long, l_partkey long, l_suppkey long,"
                     " l_linenumber int, l_quantity double,"
                     " l_extendedprice double, l_discount double,"
                     " l_tax double, l_returnflag string,"
                     " l_linestatus string, l_shipdate timestamp_ntz"),
        "part": (part_rows,
                 "p_partkey long, p_name string, p_brand string,"
                 " p_type string, p_size int, p_retailprice double"),
    })
    name = "lineitem_discount_qty_ols"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    rows = {r["brand"]: r for r in QUERIES[name](spark, d).collect()}
    # Brand A's flat discount leaves only fp residue in the variance;
    # both engines agree bit-for-bit (parity above) whether that
    # residue is exactly 0 (-> NULL via NULLIF) or a harmless ~1e-17
    # (-> degenerate 0.0 slope). Brand C (single point) is exactly 0.
    assert rows["BRAND#A"]["slope"] in (None, 0.0)
    assert rows["BRAND#B"]["slope"] == 100.0 and rows["BRAND#B"]["r2"] == 1.0
    assert rows["BRAND#C"]["slope"] is None


@pytest.mark.parametrize(
    "name", ["events_holt_linear_forecast", "events_burst_episodes"]
)
def test_holt_and_burst_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_holt_single_day_series(spark, tmp_path):
    # One day per type: level = first count, trend 0, forecast = level.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 2, 1)
    rows = [(i, T0 + datetime.timedelta(minutes=i), 1, "view", 1.0, None)
            for i in range(9)]
    d = _events_with(tmp_path, spark, rows)
    name = "events_holt_linear_forecast"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    r = QUERIES[name](spark, d).collect()[0]
    assert (r["n_days"], r["level"], r["trend"], r["forecast_7d"]) == (1, 9.0, 0.0, 9.0)


@pytest.mark.parametrize(
    "name", ["corpus_perplexity_quartile_mix", "text_bigram_surprisal_score"]
)
def test_bigram_lm_family_survives_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_abc_classification_single_customer(spark, tmp_path):
    # One customer holds 100% of revenue: a single class-A row.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T1 = datetime.datetime(1998, 6, 1)
    rows = [(i, 1, "O", 100.0, T1, "1-URGENT") for i in range(5)]
    d = _orders_with(tmp_path, spark, rows)
    name = "orders_abc_classification"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    got = QUERIES[name](spark, d).collect()
    assert [(r["abc_class"], r["n_customers"]) for r in got] == [("A", 1)]


@pytest.mark.parametrize("name", ["text_interpolated_lm_surprisal"])
def test_jm_surprisal_survives_degenerate_corpus(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _corpus_with(tmp_path, _doc_rows(spark, _DEGENERATE_TEXTS), spark)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_category_set_drift_detects_new_and_vanished(spark, tmp_path):
    # Crafted eras: 'legacy' vanishes after the midpoint, 'beta'
    # appears after it — the driver corpus never produces either
    # (every type spans both halves), so pin the non-vacuous path.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for k in range(10):  # stable type across the window
        rows.append((eid, T0 + datetime.timedelta(hours=3 * k), 1, "click", 1.0, None))
        eid += 1
    for k in range(3):  # first half only
        rows.append((eid, T0 + datetime.timedelta(hours=k), 2, "legacy", 1.0, None))
        eid += 1
    for k in range(3):  # second half only
        rows.append((eid, T0 + datetime.timedelta(hours=24 + k), 3, "beta", 1.0, None))
        eid += 1
    d = _events_with(tmp_path, spark, rows)
    name = "dq_category_set_drift"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    r = QUERIES[name](spark, d).collect()[0]
    assert (r["n_new"], r["n_vanished"], r["new_values"], r["vanished_values"]) == (
        1, 1, "beta", "legacy",
    )


@pytest.mark.parametrize(
    "name",
    [
        "events_user_resurrection",
        "events_session_depth_conversion",
        "events_time_weighted_average",
    ],
)
def test_batch10_event_ops_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_resurrection_classifies_gap_user(spark, tmp_path):
    # A user active on day 0, dormant past the gap, back on day 5 —
    # must land as resurrected exactly once (driver data never gaps).
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 4, 1)
    rows = [(0, T0, 1, "view", 1.0, None),
            (1, T0 + datetime.timedelta(days=5), 1, "view", 1.0, None),
            (2, T0 + datetime.timedelta(days=1), 2, "view", 1.0, None),
            (3, T0 + datetime.timedelta(days=2), 2, "view", 1.0, None)]
    d = _events_with(tmp_path, spark, rows)
    name = "events_user_resurrection"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    rows_out = {str(r["day"]): r for r in QUERIES[name](spark, d).collect()}
    assert rows_out["2024-04-06"]["n_resurrected"] == 1


@pytest.mark.parametrize("name", ["similarity_result_diversity_at_k"])
def test_diversity_survives_zero_vectors(spark, tmp_path, name):
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(60):
        emb = [0.0] * 64 if i in (7, 50) else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rows)
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Round-11 (r10 ADVICE): empty-input parity for scalar-subquery-shaped
# queries, and degenerate documents through the FLAC round-trip.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["dq_ks_two_sample_drift", "events_cusum_changepoint"]
)
def test_ks_and_cusum_emit_one_row_on_empty_events(spark, tmp_path, name):
    # The oracle's scalar-subquery form yields exactly one NULL/0 row on
    # an empty events table; limit(1) over the data frame yielded zero.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, [])
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_ks_survives_all_null_values(spark, tmp_path):
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 3, 1)
    rows = [
        (i, T0 + datetime.timedelta(hours=i), i % 5, "click", None, None)
        for i in range(30)
    ]
    d = _events_with(tmp_path, spark, rows)
    report = compare_query(
        spark,
        "dq_ks_two_sample_drift",
        QUERIES["dq_ks_two_sample_drift"],
        ORACLES["dq_ks_two_sample_drift"],
        d,
    )
    assert report["match"] is True, report


def test_flac_roundtrip_drops_empty_and_null_docs(spark, tmp_path):
    # Oracle's UNNEST(range(0, 0)) emits no row for an empty doc; a NULL
    # text used to crash bytes(None) inside the Arrow batch fn.
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["payload one", "", None, "another real payload", "x"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    name = "multimodal_flac_roundtrip_stats"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


# ---------------------------------------------------------------------------
# Round-11 statistics batch: degenerate- and empty-events parity.
# ---------------------------------------------------------------------------

_R11_STATS = [
    "events_page_hinkley_drift",
    "events_wilcoxon_signed_rank",
    "events_runs_test_daily",
    "dq_cliffs_delta_effect_size",
    "dq_kruskal_wallis_rank_sums",
]


@pytest.mark.parametrize("name", _R11_STATS)
def test_r11_stats_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize("name", _R11_STATS)
def test_r11_stats_survive_empty_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, [])
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_r11_stats_single_day_single_user(spark, tmp_path):
    # One day, one user, constant activity: runs test drops every
    # equal-to-median day (n_kept 0), Wilcoxon has no nonzero pairs,
    # Page-Hinkley's single-day drawup is 0 — all must match the oracle.
    import datetime

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    T0 = datetime.datetime(2024, 5, 1)
    rows = [
        (i, T0 + datetime.timedelta(minutes=i), 1, "click", 2.0, None)
        for i in range(10)
    ]
    d = _events_with(tmp_path, spark, rows)
    for name in _R11_STATS:
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (name, report)


_R11_STATS_B2 = [
    "dq_wasserstein_value_drift",
    "events_burstiness_by_type",
]


@pytest.mark.parametrize("name", _R11_STATS_B2)
def test_r11_batch2_survive_degenerate_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, _degenerate_event_rows())
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize("name", _R11_STATS_B2)
def test_r11_batch2_survive_empty_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    d = _events_with(tmp_path, spark, [])
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_levenshtein_pairs_with_crafted_near_dups(spark, tmp_path):
    # Known-answer corpus: two single-char-edit twins inside one block,
    # one exact-length unrelated doc, one heavy block above the cap.
    # n_chars is set to the real length so the (lang, n_chars) blocking
    # groups by actual equal-length documents.
    import os as _os

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["the quick brown fox", "the quick brown fix", "abcdefghijklmnopqrs"]
    texts += [f"heavy block filler {i:03d}" for i in range(45)]  # same length
    base = spark.read.parquet(_os.path.join(SF_DIR, "documents.parquet"))
    template = base.limit(1).collect()[0].asDict()
    rows = []
    for i, t in enumerate(texts):
        r = dict(template)
        r["doc_id"], r["text"], r["n_chars"] = i + 1, t, len(t)
        rows.append(tuple(r[f.name] for f in base.schema.fields))
    d = _corpus_with(tmp_path, rows, spark)
    name = "dedup_levenshtein_block_pairs"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    # The crafted twins must actually surface: one 19-char block with 3
    # docs -> 3 pairs, exactly 1 within the edit budget; the 45-doc
    # block must be excluded as heavy.
    got = {
        r["lang"]: r
        for r in QUERIES[name](spark, d).collect()
    }
    lang = template["lang"]
    assert got[lang]["n_pairs"] == 3 and got[lang]["n_neardup"] == 1
    assert got[lang]["n_heavy_blocks"] == 1


@pytest.mark.parametrize(
    "name", ["dq_total_variation_drift"]
)
def test_r11_batch3_event_stats_degenerate_and_empty(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    for rows in (_degenerate_event_rows(), []):
        d = _events_with(tmp_path / f"c{len(rows)}", spark, rows)
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, report


def test_simpson_and_kish_survive_degenerate_corpus(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["solo", "", None, "alpha alpha alpha", "beta  gamma beta"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    for name in ("text_simpson_diversity", "sample_kish_effective_size"):
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (name, report)


def test_flac_zero_crossings_drops_empty_and_null_docs(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["a real payload with some bytes", "", None, "x"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    name = "multimodal_flac_zero_crossings"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name",
    [
        "events_kendall_volume_value",
        "streaming_tv_drift_replay",
    ],
)
def test_r11_batch5_event_stats_degenerate_and_empty(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    for tag, rows in (("deg", _degenerate_event_rows()), ("empty", [])):
        d = _events_with(tmp_path / tag, spark, rows)
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (tag, report)


def test_entropy_bits_and_log2_hist_survive_degenerate_corpus(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["solo", "", None, "alpha alpha alpha", "beta  gamma beta"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    for name in ("text_unigram_entropy_bits", "corpus_length_log2_histogram",
                 "corpus_shard_assignment_uniformity"):
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (name, report)


def test_prefix_energy_survives_zero_vectors(spark, tmp_path):
    import math

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    for i in range(40):
        emb = [0.0] * 64 if i < 5 else [
            math.sin(0.1 * i + 0.01 * j) for j in range(64)
        ]
        rows.append((i, emb, i % 3))
    d = _embeddings_with(tmp_path, spark, rows)
    name = "embedding_prefix_energy_profile"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["events_fano_factor_hourly", "events_cohort_retention_triangle"]
)
def test_r11_batch7_event_stats_degenerate_and_empty(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    for tag, rows in (("deg", _degenerate_event_rows()), ("empty", [])):
        d = _events_with(tmp_path / tag, spark, rows)
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (tag, report)


def test_png_roundtrip_drops_short_and_null_docs(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["x" * 200, "short", "", None, "y" * 64, "z" * 63]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    name = "multimodal_png_roundtrip_stats"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


def test_cross_shard_leakage_counts_known_clusters(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["dup one", "dup one", "dup one", "dup two", "dup two", "solo"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    name = "dedup_cross_shard_leakage"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    row = QUERIES[name](spark, d).collect()[0]
    assert row["n_dup_clusters"] == 2
    assert row["n_docs_in_dup_clusters"] == 5


def test_chebyshev_outliers_degenerate_and_empty(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    name = "events_chebyshev_outlier_hours"
    for tag, rows in (("deg", _degenerate_event_rows()), ("empty", [])):
        d = _events_with(tmp_path / tag, spark, rows)
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (tag, report)


def test_langid_confusion_and_ht_estimate_degenerate_corpus(spark, tmp_path):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = ["the and of", "der und die", "", None, "le la et", "solo"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    for name in (
        "text_langid_confusion_matrix",
        "sample_bottomk_ht_estimate",
        "dq_hash_collision_audit",
    ):
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (name, report)


def test_language_id_null_doc_parity(spark, tmp_path):
    # The round-11 degenerate-corpus find, pinned on the ORIGINAL
    # classifier too: a NULL text classifies like an empty doc on both
    # engines (Spark's size(NULL) = -1 used to make every comparison
    # true while the oracle's NULL CASE chain fell through).
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = [None, "", "the and of", "der und die"]
    d = _corpus_with(tmp_path, _doc_rows(spark, texts), spark)
    name = "text_language_id"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report


@pytest.mark.parametrize(
    "name", ["events_ordered_funnel", "streaming_hll_sketch_replay"]
)
def test_r11_batch10_degenerate_and_empty_events(spark, tmp_path, name):
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    for tag, rows in (("deg", _degenerate_event_rows()), ("empty", [])):
        d = _events_with(tmp_path / tag, spark, rows)
        report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
        assert report["match"] is True, (tag, report)


def test_levenshtein_banded_lengths_catches_insertion_neardups(spark, tmp_path):
    # Round-12 (verdict #6): equal-length blocking misses every
    # insertion/deletion near-dup by construction; the length-banded
    # variant must catch them. Crafted corpus: a 19-char doc and its
    # one-char-INSERTION twin (20 chars — different n_chars, same
    # length bucket), an unrelated doc far away in length, and a heavy
    # bucket above the cap.
    import os as _os

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    texts = [
        "the quick brown fox",        # 19 chars, bucket 19//8 = 2
        "the quick browns fox",       # 20 chars, same bucket — Δlen 1
        "tiny",                       # bucket 0 — never paired
    ]
    # 43 chars -> bucket 43//8 = 5, far from the twins' bucket 2.
    texts += [f"heavy bucket filler with longer padding {i:03d}" for i in range(45)]
    base = spark.read.parquet(_os.path.join(SF_DIR, "documents.parquet"))
    template = base.limit(1).collect()[0].asDict()
    rows = []
    for i, t in enumerate(texts):
        r = dict(template)
        r["doc_id"], r["text"], r["n_chars"] = i + 1, t, len(t)
        rows.append(tuple(r[f.name] for f in base.schema.fields))
    d = _corpus_with(tmp_path, rows, spark)
    name = "dedup_levenshtein_banded_lengths"
    report = compare_query(spark, name, QUERIES[name], ORACLES[name], d)
    assert report["match"] is True, report
    got = {r["lang"]: r for r in QUERIES[name](spark, d).collect()}
    lang = template["lang"]
    # The insertion twins pair up (equal-length blocking would have
    # missed them: 19 != 20); the 45-doc bucket is excluded as heavy.
    assert got[lang]["n_pairs"] == 1 and got[lang]["n_neardup"] == 1
    assert got[lang]["n_heavy_buckets"] == 1
    # Receipt that the equal-length query misses the same pair.
    eq = {
        r["lang"]: r
        for r in QUERIES["dedup_levenshtein_block_pairs"](spark, d).collect()
    }
    assert eq[lang]["n_neardup"] == 0
