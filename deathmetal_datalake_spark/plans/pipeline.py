"""Training-corpus assembly operators: the step between a cleaned
document lake and a tokenizer — deterministic sampling, mixture
weighting, sequence packing, and benchmark-contamination screening.

These extend the reference surface the same way the dedup/similarity
families do (build mandate: "the operations a large-scale training-data
pipeline would need"). Everything is expressed as Catalyst-native
DataFrame ops with exact DuckDB oracles; no data-dependent driver
logic, so each plan scales by partitioning alone.

Scale notes (100 TB):
- Sampling is a *stateless hash filter* (keep iff h(doc_id) mod 100 <
  rate): no shuffle, no global count, embarrassingly parallel, stable
  under re-runs and late-arriving partitions — the only sane sampler at
  corpus scale.
- Quota selection is row_number over (source) — Spark rewrites the
  rank-filter to WindowGroupLimit, truncating per partition before the
  final sort.
- Packing is a prefix-sum window per (lang): one shuffle on the group
  key; bin ids derive from the *exclusive* running token count, so the
  assignment is independent of physical row order.
- Contamination is an inverted-index join on 60-bit shingle hashes
  (identical shape to dedup_ngram_jaccard): cost is Σ posting-list²,
  never corpus × benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.dedup import (
    _SHINGLES_SQL,
    _SQL_MAX_DF,
    _auto_max_df,
    _hashed_shingles,
)
from deathmetal_datalake_spark.plans.registry import (
    davg,
    hash60,
    register,
    session_cache,
    spread,
    sql_davg,
    sql_hash60,
)
from deathmetal_datalake_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Deterministic stratified sampling: per-language keep rates applied as
# a pure hash filter on the document id.
# ---------------------------------------------------------------------------

_LANG_RATES = {"en": 80, "de": 50, "fr": 50, "es": 30, "zh": 20}  # percent
_DEFAULT_RATE = 10

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {rate}" for lang, rate in _LANG_RATES.items()
) + f" ELSE {_DEFAULT_RATE} END"

_SAMPLE_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_hash60("CAST(doc_id AS VARCHAR)")} % 100 < {_RATE_CASE}
"""


@register("sample_stratified_by_lang", oracle=_SAMPLE_SQL)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _LANG_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    keep = (hash60(F.col("doc_id").cast("string")) % 100) < rate
    return docs.filter(keep).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Quota sampling: the K longest documents per source (rank filter →
# WindowGroupLimit), the standard per-domain cap before mixing.
# ---------------------------------------------------------------------------

# 15 binds at every SF (sources hold ≥25 docs from sf0.001 up), so the
# rank filter is actually exercised by the driver gate, not a no-op.
_QUOTA_K = 15

_QUOTA_SQL = f"""
SELECT doc_id, source, n_chars
FROM (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
           ) AS rn
    FROM documents
)
WHERE rn <= {_QUOTA_K}
"""


@register("sample_quota_per_source", oracle=_QUOTA_SQL)
def sample_quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _QUOTA_K)
        .select("doc_id", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# Mixture weights: per (lang, source) token counts and each cell's share
# of the corpus token budget — the numbers a data-mixing config is
# written from.
# ---------------------------------------------------------------------------

_MIX_SQL = r"""
WITH per_doc AS (
    SELECT lang, source,
           LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens
    FROM documents
),
cells AS (
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM per_doc GROUP BY lang, source
)
SELECT lang, source, n_docs, total_tokens,
       ROUND(CAST(total_tokens AS DOUBLE)
             / CAST(SUM(total_tokens) OVER () AS DOUBLE), 6) AS token_share
FROM cells
"""


@register("dataset_mixture_weights", oracle=_MIX_SQL)
def dataset_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    # Cached: consumed by both the grand-total branch and the final
    # projection — without it the corpus scan runs twice.
    cells = session_cache(
        per_doc.groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    # The corpus total is a 1-row aggregate joined back via broadcast —
    # the repo's standard idiom for scalar denominators. A global window
    # (Window.partitionBy()) computes the same value but funnels every
    # cell through one task and warns `WindowExec: No Partition Defined`.
    total = cells.agg(F.sum("total_tokens").alias("_grand_total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double")
                / F.col("_grand_total").cast("double"),
                6,
            ).alias("token_share"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy sequence packing: documents stream into fixed token-budget
# packs per language in doc_id order. The pack id derives from the
# EXCLUSIVE prefix sum of token counts (integer window arithmetic —
# exact in both engines), so assignment depends only on the logical
# order, never on physical partitioning.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048

_PACK_SQL = rf"""
WITH per_doc AS (
    SELECT doc_id, lang,
           LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens
    FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) // {_PACK_BUDGET} AS BIGINT) AS pack_id
FROM per_doc
"""


@register("pack_sequences_by_lang", oracle=_PACK_SQL)
def pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (parallel) prefix sum.

    A single ``PARTITION BY lang ORDER BY doc_id`` window puts an entire
    language's documents in one task — with ~10 languages at 100 TB
    that's a handful of tasks scanning everything. Instead: slice each
    language into deterministic, order-preserving ``doc_id``-range
    buckets, compute the exclusive prefix sum *locally* per
    (lang, bucket), and add the bucket's starting offset — itself an
    exclusive prefix sum over the tiny per-bucket totals table, joined
    back via broadcast. Integer arithmetic throughout, so
    local + offset ≡ the global prefix sum exactly (same oracle).

    Buckets come from the ``doc_id`` *value range* (min/max collected at
    plan time — one tiny 2-value action), not ``spark_partition_id()``:
    physical partition ids are not stable across the two consuming
    subplans, value ranges are.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    bounds = per_doc.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return per_doc.withColumn("pack_id", F.lit(0).cast("long"))
    n_buckets = spark.sparkContext.defaultParallelism * 4
    width = max(1, -(-(int(bounds["hi"]) - int(bounds["lo"]) + 1) // n_buckets))
    bucketed = per_doc.withColumn(
        "_bucket", F.floor((F.col("doc_id") - int(bounds["lo"])) / width)
    )
    # Cached: consumed by the per-bucket totals branch and the final
    # projection — one corpus scan, not two.
    bucketed = session_cache(bucketed)
    local_w = (
        Window.partitionBy("lang", "_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prefix = F.coalesce(F.sum("n_tokens").over(local_w), F.lit(0))
    totals = bucketed.groupBy("lang", "_bucket").agg(
        F.sum("n_tokens").alias("_bucket_tokens")
    )
    # langs × buckets rows — the offset window runs over a bounded table.
    off_w = (
        Window.partitionBy("lang")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang",
        "_bucket",
        F.coalesce(F.sum("_bucket_tokens").over(off_w), F.lit(0)).alias("_offset"),
    )
    return (
        bucketed.join(F.broadcast(offsets), ["lang", "_bucket"])
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor((local_prefix + F.col("_offset")) / _PACK_BUDGET)
            .cast("long")
            .alias("pack_id"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark contamination: count 3-gram shingle overlaps between each
# training document and a held-out benchmark set (here: every 50th
# document), flagging docs over the overlap threshold. Same
# inverted-index join shape as dedup — never corpus × benchmark.
# ---------------------------------------------------------------------------

_CONTAM_THRESHOLD = 5

_CONTAM_SQL = (
    _SHINGLES_SQL
    + f""",
hashed AS (
    SELECT doc_id, {sql_hash60('shingle')} AS sh FROM shingled
),
df_ok AS (
    SELECT sh FROM hashed GROUP BY sh HAVING COUNT(*) <= {_SQL_MAX_DF}
),
capped AS (
    SELECT h.doc_id, h.sh FROM hashed h JOIN df_ok USING (sh)
),
bench AS (
    SELECT doc_id AS bench_id, sh FROM capped WHERE doc_id % 50 = 0
),
train AS (
    SELECT doc_id, sh FROM capped WHERE doc_id % 50 <> 0
)
SELECT t.doc_id,
       COUNT(DISTINCT t.sh) AS n_shared_shingles,
       COUNT(DISTINCT b.bench_id) AS n_bench_docs,
       COUNT(DISTINCT t.sh) >= {_CONTAM_THRESHOLD} AS contaminated
FROM train t JOIN bench b ON t.sh = b.sh
GROUP BY t.doc_id
"""
)


@register("contamination_ngram_overlap", oracle=_CONTAM_SQL)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Cached: the df-count branch and the train/bench branches are all
    # filters of the same shingle set — one explode+hash pass, not three
    # corpus scans.
    hashed = session_cache(_hashed_shingles(docs))
    # Document-frequency cap, same as the dedup path: a stop-gram shingle
    # present in ~every train doc and many bench docs would contribute
    # df_train(sh)·df_bench(sh) join rows — quadratic on hot keys at
    # 100 TB. Ubiquitous shingles carry no contamination signal anyway;
    # the oracle applies the identical HAVING COUNT(*) <= cap.
    df_ok = (
        hashed.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _auto_max_df(docs.count()))
        .select("sh")
    )
    capped = hashed.join(df_ok, "sh", "left_semi")
    bench = capped.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    train = capped.filter(F.col("doc_id") % 50 != 0)
    return (
        train.join(bench, "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
            (F.countDistinct("sh") >= _CONTAM_THRESHOLD).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: the assignment is a pure hash of
# the document id (salted so it is independent of the sampling filter's
# hash), so it is stable under re-runs, shard-parallel, and needs no
# global coordination — the only split strategy that survives 100 TB.
# Reported as the per-split × language audit table a data card is
# written from.
# ---------------------------------------------------------------------------

_SPLIT_TRAIN_PCT = 90
_SPLIT_VAL_PCT = 5  # val bucket: [90, 95); test: [95, 100)

_SPLIT_SQL = f"""
WITH assigned AS (
    SELECT lang, n_chars,
           {sql_hash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < {_SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {_SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM assigned
GROUP BY split, lang
"""


@register("corpus_split_assignment", oracle=_SPLIT_SQL)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < _SPLIT_TRAIN_PCT, "train")
        .when(bucket < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled language resampling (the multilingual-mixing rule:
# w_l ∝ p_l^α with α = 0.75): low-resource languages are boosted, high-
# resource ones damped. p^0.75 is computed as sqrt(p)·sqrt(sqrt(p)) —
# sqrt and multiply are IEEE correctly-rounded in both engines, unlike
# pow(), so the weights match bit-for-bit. The cross-language weight
# sum goes through DECIMAL(25,12) (order-free exact addition); every
# denominator is a 1-row broadcast, never a global window.
# ---------------------------------------------------------------------------

_TEMP_SQL = r"""
WITH per_doc AS (
    SELECT lang, LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens
    FROM documents
),
cells AS (
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM per_doc GROUP BY lang
),
tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS grand FROM cells),
pw AS (
    SELECT lang, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE) AS p,
           SQRT(CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE))
             * SQRT(SQRT(CAST(total_tokens AS DOUBLE) / CAST(grand AS DOUBLE))) AS p075
    FROM cells CROSS JOIN tot
),
s AS (SELECT CAST(SUM(CAST(p075 AS DECIMAL(25,12))) AS DOUBLE) AS s075 FROM pw)
SELECT lang, n_docs, total_tokens,
       ROUND(p, 6) AS token_share,
       ROUND(p075 / s075, 6) AS temperature_weight,
       ROUND((p075 / s075) / p, 6) AS boost
FROM pw CROSS JOIN s
"""


@register("corpus_temperature_resampling", oracle=_TEMP_SQL)
def corpus_temperature_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    cells = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
    total = cells.agg(F.sum("total_tokens").alias("_grand"))
    p = F.col("total_tokens").cast("double") / F.col("_grand").cast("double")
    pw = cells.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "total_tokens",
        p.alias("p"),
        (F.sqrt(p) * F.sqrt(F.sqrt(p))).alias("p075"),
    )
    # The language grid is bounded (~10 rows), so caching it costs
    # nothing and saves the second corpus scan the weight-sum branch
    # would otherwise trigger.
    pw = session_cache(pw)
    s = pw.agg(
        F.sum(F.col("p075").cast("decimal(25,12)")).cast("double").alias("_s075")
    )
    return pw.crossJoin(F.broadcast(s)).select(
        "lang",
        "n_docs",
        "total_tokens",
        F.round("p", 6).alias("token_share"),
        F.round(F.col("p075") / F.col("_s075"), 6).alias("temperature_weight"),
        F.round((F.col("p075") / F.col("_s075")) / F.col("p"), 6).alias("boost"),
    )


# ---------------------------------------------------------------------------
# N-gram NOVELTY: per document, the fraction of its distinct shingles
# whose FIRST corpus occurrence (min doc_id) is this document — the
# standard curation signal for "how much genuinely new text does this
# document add" (near-1 = fresh content, near-0 = recombination of
# already-seen text; boilerplate-heavy sources score low). doc_id is
# the ingestion order here, as in an append-only corpus.
#
# Scale: min() per shingle is a constant-size, map-side-combinable
# aggregation buffer (no hot-key list materialization — a stop-shingle
# costs one long, unlike collect_list), the hashed⋈first join is
# co-partitioned on sh, and the per-document rollup is a second
# combinable aggregation. Three bounded shuffles, no caps needed.
# ---------------------------------------------------------------------------

_NOVELTY_SQL = (
    _SHINGLES_SQL
    + f""",
hashed_nov AS (
    SELECT doc_id, {sql_hash60('shingle')} AS sh FROM shingled
),
first_seen AS (
    SELECT sh, MIN(doc_id) AS first_doc FROM hashed_nov GROUP BY sh
)
SELECT h.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN h.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       ROUND(CAST(SUM(CASE WHEN h.doc_id = f.first_doc THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM hashed_nov h JOIN first_seen f ON h.sh = f.sh
GROUP BY h.doc_id
"""
)


@register("text_ngram_novelty", oracle=_NOVELTY_SQL)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashed = session_cache(_hashed_shingles(docs))
    first_seen = hashed.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
    )
    return (
        hashed.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# CURATION FUNNEL: the whole-pipeline retention audit — how many
# documents survive each curation stage, applied SEQUENTIALLY the way a
# production corpus build runs them:
#
#   ingested → quality filter → exact dedup → near-dup removal
#
# Exact dedup keeps the min doc_id per content hash AMONG quality
# survivors; near-dup removal then drops the larger member of every
# MinHash-LSH pair whose BOTH endpoints are still alive (one pass, not
# transitive closure — closure's safety is what dedup_graph_triangles
# measures; CC-based removal is dedup_connected_components' job).
# One row per stage with absolute and relative retention — the first
# table any dataset report shows.
#
# Scale: each stage is a semi/anti join keyed on doc_id against a
# bounded survivor set; the only heavyweight input is the LSH pair set,
# already bucket-bounded. Stage counts are 1-row aggregates unioned.
# ---------------------------------------------------------------------------

from deathmetal_datalake_spark.plans.dedup import (  # noqa: E402
    _EST_THRESHOLD,
    _INCR_SQL,
    _LSH_SQL,
    _minhash_band_candidates,
    _minhash_columns,
    _minhash_estimates,
)
from deathmetal_datalake_spark.plans.text import (  # noqa: E402
    _FILTER_SQL as _TQ_FILTER_SQL,
)

_FUNNEL_SQL = f"""
WITH qual AS (
    SELECT doc_id FROM ({_TQ_FILTER_SQL}) WHERE keep
),
exact_kept AS (
    SELECT MIN(d.doc_id) AS doc_id
    FROM documents d JOIN qual USING (doc_id)
    GROUP BY {sql_hash60('d.text')}
),
mh AS ({_LSH_SQL}),
near_dropped AS (
    SELECT DISTINCT p.doc_b AS doc_id
    FROM mh p
    JOIN exact_kept a ON p.doc_a = a.doc_id
    JOIN exact_kept b ON p.doc_b = b.doc_id
),
near_kept AS (
    SELECT doc_id FROM exact_kept
    EXCEPT
    SELECT doc_id FROM near_dropped
),
stages AS (
    SELECT 1 AS stage_no, 'ingested' AS stage, COUNT(*) AS n_docs FROM documents
    UNION ALL
    SELECT 2, 'quality', COUNT(*) FROM qual
    UNION ALL
    SELECT 3, 'exact_dedup', COUNT(*) FROM exact_kept
    UNION ALL
    SELECT 4, 'near_dedup', COUNT(*) FROM near_kept
)
SELECT stage_no, stage, n_docs,
       ROUND(CAST(n_docs AS DOUBLE)
             / (SELECT COUNT(*) FROM documents), 6) AS retained_pct
FROM stages
"""


@register("corpus_curation_funnel", oracle=_FUNNEL_SQL)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.text import text_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    qual = session_cache(
        text_quality_filter(spark, sf_dir).filter("keep").select("doc_id")
    )
    exact_kept = session_cache(
        docs.join(qual, "doc_id", "left_semi")
        .groupBy(hash60("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    pairs = _minhash_estimates(_minhash_band_candidates(sig), sig).filter(
        F.col("est_jaccard") >= _EST_THRESHOLD
    )
    near_dropped = (
        pairs.join(
            exact_kept.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        )
        .join(exact_kept.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    near_kept = exact_kept.join(near_dropped, "doc_id", "left_anti")
    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    stages = (
        stage(1, "ingested", docs)
        .unionAll(stage(2, "quality", qual))
        .unionAll(stage(3, "exact_dedup", exact_kept))
        .unionAll(stage(4, "near_dedup", near_kept))
    )
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    return (
        stages.crossJoin(F.broadcast(total))
        .select(
            "stage_no",
            "stage",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("_total"), 6).alias(
                "retained_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SPLIT LEAKAGE AUDIT: near-duplicate pairs that CROSS train/val/test
# boundaries — the eval-integrity number (a test document with a train
# near-twin inflates benchmark scores exactly like verbatim
# contamination). Counts LSH near-dup pairs per ordered split pair
# (train→test etc., alphabetical within the pair for a canonical key);
# the off-diagonal rows are the leaks, and the fix is always the same:
# dedup BEFORE splitting. Composes two existing bounded pipelines
# (salted-hash split, LSH pair set) with one broadcast-sized join per
# side — no new scale surface.
# ---------------------------------------------------------------------------

_LEAK_SQL = f"""
WITH assigned AS (
    SELECT doc_id,
           CASE WHEN {sql_hash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < {_SPLIT_TRAIN_PCT} THEN 'train'
                WHEN {sql_hash60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < {_SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
),
mh AS ({_LSH_SQL}),
labeled AS (
    SELECT LEAST(sa.split, sb.split) AS split_a,
           GREATEST(sa.split, sb.split) AS split_b
    FROM mh p
    JOIN assigned sa ON p.doc_a = sa.doc_id
    JOIN assigned sb ON p.doc_b = sb.doc_id
)
SELECT split_a, split_b,
       COUNT(*) AS n_pairs,
       (split_a <> split_b) AS leaking
FROM labeled
GROUP BY split_a, split_b
"""


@register("corpus_split_leakage", oracle=_LEAK_SQL)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < _SPLIT_TRAIN_PCT, "train")
        .when(bucket < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    assigned = docs.select("doc_id", split.alias("split"))
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    pairs = _minhash_estimates(_minhash_band_candidates(sig), sig).filter(
        F.col("est_jaccard") >= _EST_THRESHOLD
    )
    sa = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaking", F.col("split_a") != F.col("split_b"))
    )


# ---------------------------------------------------------------------------
# CAPSTONE COMPOSITION — the daily corpus increment, end-to-end in one
# driver-checked query: a delta batch (doc_id % 10 == 0, the same delta
# convention as dedup_minhash_incremental) arrives against the base
# corpus; it is near-dup-checked THROUGH THE BAND INDEX against the
# whole corpus (cost ∝ delta, not corpus), quality-gated, and the
# survivors are APPENDED to a real versioned snapshot table whose head
# count is read back. One row out: delta size, dup drops, quality
# drops, appended count, and the resulting table size — the nightly
# report line of a production corpus build. Dup rule within the delta
# is keep-first (smaller doc_id wins), matching the dedup family.
# ---------------------------------------------------------------------------

_DAILY_SQL = f"""
WITH inc AS ({_INCR_SQL}),
qual AS (
    SELECT doc_id FROM ({_TQ_FILTER_SQL}) WHERE keep
),
delta AS (
    SELECT doc_id FROM documents WHERE doc_id % 10 = 0
),
dup AS (
    SELECT DISTINCT new_doc AS doc_id FROM inc
    WHERE other_doc % 10 <> 0 OR other_doc < new_doc
),
surv AS (
    SELECT doc_id FROM delta EXCEPT SELECT doc_id FROM dup
),
appended AS (
    SELECT s.doc_id FROM surv s JOIN qual q USING (doc_id)
)
SELECT (SELECT COUNT(*) FROM delta) AS n_delta,
       (SELECT COUNT(*) FROM dup) AS n_dup_dropped,
       (SELECT COUNT(*) FROM surv) - (SELECT COUNT(*) FROM appended)
           AS n_quality_dropped,
       (SELECT COUNT(*) FROM appended) AS n_appended,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 10 <> 0)
           + (SELECT COUNT(*) FROM appended) AS n_total
"""


@register("pipeline_daily_increment", oracle=_DAILY_SQL)
def pipeline_daily_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile as _tempfile

    from deathmetal_datalake_spark.plans.dedup import dedup_minhash_incremental
    from deathmetal_datalake_spark.plans.text import text_quality_filter
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    docs = load_table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    inc = dedup_minhash_incremental(spark, sf_dir)
    # dup is always a subset of delta: dedup_minhash_incremental only
    # emits new_doc with doc_id % 10 == 0. That lets all four scalar
    # counts fold into ONE aggregate over a per-delta-doc flags frame,
    # so the expensive minhash-incremental lineage and the quality
    # lineage each execute exactly once (they used to re-derive per
    # count — the r3→r5 regression).
    dup = (
        inc.filter(
            (F.col("other_doc") % 10 != 0)
            | (F.col("other_doc") < F.col("new_doc"))
        )
        .select(F.col("new_doc").alias("doc_id"))
        .distinct()
    )
    qual = text_quality_filter(spark, sf_dir).filter("keep").select("doc_id")
    flags = session_cache(
        delta.join(dup.withColumn("is_dup", F.lit(1)), "doc_id", "left")
        .join(qual.withColumn("is_qual", F.lit(1)), "doc_id", "left")
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("n_delta"),
        F.count("is_dup").alias("n_dup"),
        F.count(
            F.when(F.col("is_dup").isNull() & F.col("is_qual").isNull(), 1)
        ).alias("n_qdrop"),
        F.count(
            F.when(F.col("is_dup").isNull() & F.col("is_qual").isNotNull(), 1)
        ).alias("n_app"),
    ).first()
    appended = flags.filter(
        F.col("is_dup").isNull() & F.col("is_qual").isNotNull()
    ).select("doc_id")
    with _tempfile.TemporaryDirectory(prefix="dml-daily-") as d:
        tbl = SnapshotTable(spark, _os.path.join(d, "curated"))
        tbl.write(docs.filter(F.col("doc_id") % 10 != 0), "append")
        tbl.write(docs.join(appended, "doc_id", "left_semi"), "append")
        n_total = tbl.read().count()
    return spark.createDataFrame(
        [
            (
                counts["n_delta"],
                counts["n_dup"],
                counts["n_qdrop"],
                counts["n_app"],
                n_total,
            )
        ],
        "n_delta long, n_dup_dropped long, n_quality_dropped long, "
        "n_appended long, n_total long",
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection with importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling"): score
# every raw document by how target-domain-like its hashed-unigram
# feature distribution is, then keep the top slice. The published
# method trains bag-of-hashed-ngram models on target vs raw and ranks
# by the importance log-ratio Σ_f count_f · log(p_target(f)/p_raw(f));
# this catalog ranks by the monotone likelihood-ratio form
# Σ_f count_f · (p̂_target(f)/p̂_raw(f)) with add-½ smoothing over the
# 256 hash buckets, because ln() is not correctly rounded across
# engines (docs/DETERMINISM.md) while +,×,÷ are — every per-bucket
# weight is a chain of exact-integer-valued doubles and one division,
# bit-identical in Spark and DuckDB, then rounded and decimal-summed.
# Target domain here: source 'src0'; raw: the whole corpus.
#
# Scale notes (100 TB): the bucket model is a ≤256-row frame — one
# map-side-combinable aggregate over the token explode, broadcast back
# onto the same explode. Two shuffles total (bucket agg is tiny;
# per-doc agg shuffles on doc_id) and a global top-50, which Spark
# executes as TakeOrderedAndProject. Nothing grows with corpus size
# except the linear scans; the model stays 256 rows at any scale.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET = "src0"
_DSIR_TOP = 50

_DSIR_SQL = rf"""
WITH toks AS (
    SELECT doc_id, source,
           unnest(string_split_regex(TRIM(text), '\s+')) AS token
    FROM documents
),
b AS (
    SELECT doc_id, source,
           {sql_hash60('token')} % {_DSIR_BUCKETS} AS bucket
    FROM toks
),
bc AS (
    SELECT bucket,
           COUNT(*) AS rc,
           SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS tc
    FROM b GROUP BY bucket
),
tot AS (SELECT SUM(rc) AS rt, SUM(tc) AS tt FROM bc),
w AS (
    SELECT bucket,
           ROUND(((2.0 * tc + 1.0) * (2.0 * rt + {_DSIR_BUCKETS}.0))
                 / ((2.0 * tt + {_DSIR_BUCKETS}.0) * (2.0 * rc + 1.0)), 6) AS wt
    FROM bc CROSS JOIN tot
),
scored AS (
    SELECT b.doc_id, b.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(wt AS DECIMAL(18,6))) AS DOUBLE) AS importance
    FROM b JOIN w USING (bucket)
    GROUP BY b.doc_id, b.source
)
SELECT doc_id, source, n_tokens, importance
FROM scored
ORDER BY importance DESC, doc_id ASC
LIMIT {_DSIR_TOP}
"""


@register("corpus_dsir_importance", oracle=_DSIR_SQL)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    # Reduce token rows to (doc, source, bucket) COUNTS before anything
    # is cached or shuffled (guide §2.3 "aggregate before you shuffle"):
    # the explode feeds a map-side partial aggregate in its own stage,
    # so the exchange and the cached frame carry <=256 rows per document
    # instead of one row per token. Both downstream aggregates are
    # exact-identical on counts: the bucket model sums cnt instead of
    # counting rows, and the per-doc importance sums cnt x wt in decimal
    # arithmetic, which equals adding wt cnt times (decimal + and x are
    # exact at these magnitudes, so the per-token sum and the counted
    # sum are the same decimal value).
    percnt = session_cache(
        toks.select(
            "doc_id", "source", (hash60("token") % _DSIR_BUCKETS).alias("bucket")
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bc = percnt.groupBy("bucket").agg(
        F.sum("cnt").alias("rc"),
        F.sum(
            F.when(F.col("source") == _DSIR_TARGET, F.col("cnt")).otherwise(0)
        ).alias("tc"),
    )
    tot = bc.agg(F.sum("rc").alias("rt"), F.sum("tc").alias("tt"))
    nb = float(_DSIR_BUCKETS)
    w = bc.crossJoin(broadcast(tot)).select(
        "bucket",
        F.round(
            ((2.0 * F.col("tc") + 1.0) * (2.0 * F.col("rt") + nb))
            / ((2.0 * F.col("tt") + nb) * (2.0 * F.col("rc") + 1.0)),
            6,
        ).alias("wt"),
    )
    scored = (
        percnt.join(broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("wt").cast("decimal(18,6)") * F.col("cnt"))
            .cast("double")
            .alias("importance"),
        )
    )
    return scored.orderBy(F.desc("importance"), F.asc("doc_id")).limit(_DSIR_TOP)


# ---------------------------------------------------------------------------
# Epoch-repeat scheduling — the "how many passes over each source"
# question every pretraining mix answers after weights are chosen
# (cf. the repeated-epoch schedules in Gopher/LLaMA data tables and
# the diminishing-returns analysis of Muennighoff et al. 2023): given
# a per-source token budget (equal share here), each source is
# scheduled for floor(budget/available) full copies plus a fractional
# epoch realized as a deterministic hash gate over doc_ids — the same
# stateless hash-filter sampler used everywhere in this catalog, so
# the fractional epoch is reproducible and shuffle-free.
#
# Determinism: every quantity is exact BIGINT arithmetic — integer
# division for the per-mille repeat factor, md5-derived doc gates —
# no floating point anywhere.
#
# Scale notes (100 TB): one token-count aggregate over the corpus
# (map-side combinable), a ≤|sources| model frame broadcast back, and
# one more bounded aggregate. The realized schedule (doc_id × copy)
# is never materialized here — the audit emits the per-source plan,
# which is what a training-data loader consumes.
# ---------------------------------------------------------------------------

_EPOCH_SQL = rf"""
WITH d AS (
    SELECT doc_id, source,
           LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_toks,
           {sql_hash60('CAST(doc_id AS VARCHAR)')} % 1000 AS gate
    FROM documents
),
s AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS source_tokens
    FROM d GROUP BY source
),
tot AS (
    SELECT CAST(SUM(source_tokens) AS BIGINT) // COUNT(*) AS target_tokens FROM s
),
plan AS (
    SELECT s.source, s.n_docs, s.source_tokens, t.target_tokens,
           (t.target_tokens * 1000) // s.source_tokens AS r_permille
    FROM s CROSS JOIN tot t
),
extra AS (
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_extra_docs,
           CAST(COALESCE(SUM(d.n_toks), 0) AS BIGINT) AS extra_tokens
    FROM d JOIN plan p USING (source)
    WHERE d.gate < p.r_permille % 1000
    GROUP BY d.source
)
SELECT p.source,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       p.source_tokens,
       p.target_tokens,
       CAST(p.r_permille // 1000 AS BIGINT) AS full_copies,
       CAST(p.r_permille % 1000 AS BIGINT) AS extra_permille,
       CAST(COALESCE(e.n_extra_docs, 0) AS BIGINT) AS n_extra_docs,
       CAST(COALESCE(e.extra_tokens, 0) AS BIGINT) AS extra_tokens,
       CAST((p.r_permille // 1000) * p.source_tokens
            + COALESCE(e.extra_tokens, 0) AS BIGINT) AS scheduled_tokens
FROM plan p LEFT JOIN extra e USING (source)
"""


@register("corpus_epoch_repeats", oracle=_EPOCH_SQL)
def corpus_epoch_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    d = session_cache(
        docs.select(
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_toks"),
            (hash60(F.col("doc_id").cast("string")) % 1000).alias("gate"),
        )
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("source_tokens"),
    )
    tot = s.agg(
        F.expr("sum(source_tokens) div count(*)").cast("long").alias("target_tokens")
    )
    plan = s.crossJoin(broadcast(tot)).withColumn(
        "r_permille", F.expr("(target_tokens * 1000) div source_tokens")
    )
    extra = (
        d.join(
            broadcast(plan.select("source", "r_permille")),
            "source",
        )
        .filter(F.col("gate") < F.col("r_permille") % 1000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_extra_docs"),
            F.sum("n_toks").cast("long").alias("extra_tokens"),
        )
    )
    return (
        plan.join(broadcast(extra), "source", "left")
        .select(
            "source",
            "n_docs",
            "source_tokens",
            "target_tokens",
            F.expr("r_permille div 1000").cast("long").alias("full_copies"),
            (F.col("r_permille") % 1000).cast("long").alias("extra_permille"),
            F.coalesce("n_extra_docs", F.lit(0)).cast("long").alias("n_extra_docs"),
            F.coalesce("extra_tokens", F.lit(0)).cast("long").alias("extra_tokens"),
            (
                F.expr("r_permille div 1000") * F.col("source_tokens")
                + F.coalesce("extra_tokens", F.lit(0))
            ).cast("long").alias("scheduled_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling — keep a document with probability equal
# to its quality signal (the FineWeb-Edu-style "sample by classifier
# score" selection, here with the catalog's stopword-ratio signal):
# keep iff h(doc_id) mod 1e6 < round(score·1e6). Same stateless hash
# gate as every sampler in this catalog — reproducible, shuffle-free,
# and the realized keep rate converges to the mean score per stratum,
# which the audit verifies side by side (mean score of ALL docs vs
# realized rate vs mean score of the KEPT docs — the kept mean runs
# higher, since keeping ∝ score reweights the distribution; that
# visible upweighting is the point of score-proportional sampling).
# Determinism: the score is a rounded-6 double, so score·1e6 is
# integer-valued up to one ulp — ROUND(...,0) recovers the exact
# integer in both engines before the comparison.
# ---------------------------------------------------------------------------

_QWS_SQL = rf"""
WITH scored AS (
    SELECT doc_id, source,
           ROUND(CAST(LENGTH(list_filter(string_split_regex(TRIM(text), '\s+'),
                    t -> list_contains({{stop}}, t))) AS DOUBLE)
                 / LENGTH(string_split_regex(TRIM(text), '\s+')), 6) AS score,
           {sql_hash60('CAST(doc_id AS VARCHAR)')} % 1000000 AS gate
    FROM documents
),
flagged AS (
    SELECT *, CASE WHEN gate < CAST(ROUND(score * 1000000, 0) AS BIGINT)
                   THEN 1 ELSE 0 END AS kept
    FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       ROUND(SUM(kept) / CAST(COUNT(*) AS DOUBLE), 6) AS kept_rate,
       ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
           AS mean_score_all,
       ROUND(CAST(SUM(CASE WHEN kept = 1 THEN CAST(score AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / NULLIF(SUM(kept), 0), 6) AS mean_score_kept
FROM flagged
GROUP BY source
""".replace("{stop}", "['the', 'a', 'and', 'of', 'to', 'in']")


@register("corpus_quality_weighted_sample", oracle=_QWS_SQL)
def corpus_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    stopwords = ["the", "a", "and", "of", "to", "in"]
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(s) for s in stopwords])
    score = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
        / F.size(toks),
        6,
    )
    scored = docs.select(
        "source",
        score.alias("score"),
        (hash60(F.col("doc_id").cast("string")) % 1000000).alias("gate"),
    )
    kept = F.when(
        F.col("gate") < F.round(F.col("score") * 1000000, 0).cast("long"), 1
    ).otherwise(0)
    flagged = scored.withColumn("kept", kept)
    dec = F.col("score").cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.round(F.sum("kept") / F.count(F.lit(1)).cast("double"), 6).alias("kept_rate"),
        F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_score_all"
        ),
        F.round(
            F.sum(F.when(F.col("kept") == 1, dec).otherwise(zero)).cast("double")
            / F.nullif(F.sum("kept"), F.lit(0)),
            6,
        ).alias("mean_score_kept"),
    )


# ---------------------------------------------------------------------------
# Token-budget fill — the deterministic "take the best documents until
# the budget is spent" selection every pretraining data build runs
# (the greedy counterpart of corpus_quality_weighted_sample's
# probabilistic draw): docs ranked by a quality key (stopword ratio
# ascending — cleaner docs first — with doc_id tie-break), cumulative
# token prefix-sum, keep while the RUNNING total fits the budget
# (whole docs; first overflowing doc is excluded, scan continues — the
# standard best-fit-greedy simplification). Budget = 50% of corpus
# tokens, so the query is scale-free. The cumulative prefix sum is a
# two-phase distributed ordering (operators/ordering.two_phase_order:
# range shuffle on the quality key + per-range prefix sums + broadcast
# range offsets) — no single task ever holds the per-doc frame.
# ---------------------------------------------------------------------------

from deathmetal_datalake_spark.plans.text import (  # noqa: E402
    _STOP_SQL as _STOP_LIST_SQL,
    _STOPWORDS as _STOP_LIST,
)

_BUDGET_PCT_NUM, _BUDGET_PCT_DEN = 1, 2  # keep 50% of corpus tokens

_BUDGET_SQL = rf"""
WITH stats AS (
    SELECT doc_id,
           LENGTH(string_split_regex(LOWER(TRIM(text)), '\s+')) AS n_tokens,
           LENGTH(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                              t -> list_contains({_STOP_LIST_SQL}, t))) AS n_stop
    FROM documents
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM stats),
ranked AS (
    SELECT s.*, t.corpus_tokens,
           t.corpus_tokens * {_BUDGET_PCT_NUM} // {_BUDGET_PCT_DEN} AS budget,
           SUM(s.n_tokens) OVER (
               ORDER BY CAST(s.n_stop AS DOUBLE) / s.n_tokens ASC, s.doc_id ASC
               ROWS UNBOUNDED PRECEDING
           ) AS cum_tokens
    FROM stats s CROSS JOIN tot t
),
kept AS (SELECT * FROM ranked WHERE cum_tokens <= budget)
SELECT CAST(MAX(budget) AS BIGINT) AS budget_tokens,
       CAST(MAX(corpus_tokens) AS BIGINT) AS corpus_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept,
       CAST(MAX(cum_tokens) AS BIGINT) AS last_cum,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / MAX(budget), 6) AS budget_utilization
FROM kept
"""


@register("corpus_token_budget_fill", oracle=_BUDGET_SQL)
def corpus_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stats = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*_STOP_LIST))).alias("n_stop"),
    )
    tot = stats.agg(F.sum("n_tokens").cast("long").alias("corpus_tokens"))
    # Two-phase distributed running sum (round-9: replaces a global
    # window that single-task-sorted the whole per-doc frame): bucket
    # by literal quality-score quantiles, per-bucket prefix sums,
    # broadcast cumulative bucket offsets. Integer token counts, so
    # the sum is exactly the sequential one. Cached: the helper
    # evaluates its input for boundaries/totals/prefix sums, and the
    # per-doc split/filter is the expensive part.
    from deathmetal_datalake_spark.operators.ordering import two_phase_order
    from deathmetal_datalake_spark.plans.registry import session_cache

    stats = session_cache(stats)
    quality = F.col("n_stop").cast("double") / F.col("n_tokens")
    # sub_key: the stopword ratio piles up on a few exact values (0.0
    # for stopword-free docs), so heavy ties sub-bucket by doc_id.
    summed = two_phase_order(
        stats,
        [quality.asc(), F.col("doc_id").asc()],
        quality,
        cumsum=("n_tokens", "cum_tokens"),
        sub_key=F.col("doc_id"),
    )
    ranked = summed.crossJoin(broadcast(tot)).withColumn(
        "budget",
        (F.col("corpus_tokens") * _BUDGET_PCT_NUM / _BUDGET_PCT_DEN).cast("long"),
    )
    kept = ranked.filter(F.col("cum_tokens") <= F.col("budget"))
    return kept.agg(
        F.max("budget").cast("long").alias("budget_tokens"),
        F.max("corpus_tokens").cast("long").alias("corpus_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
        F.max("cum_tokens").cast("long").alias("last_cum"),
        F.round(
            F.sum("n_tokens").cast("double") / F.max("budget"), 6
        ).alias("budget_utilization"),
    )


# ---------------------------------------------------------------------------
# Dedup token savings — the number a training-data owner actually asks
# for when approving a dedup pass: per source, how many TOKENS does
# keep-one-per-exact-cluster save against the training budget?
# Clusters are content-hash groups within a source; the kept token
# mass counts each cluster's canonical doc once (min doc_id — the
# deterministic keep rule). One hash aggregate per (source, cluster),
# one bounded per-source rollup; token counts are whitespace splits,
# exact integers end-to-end.
# ---------------------------------------------------------------------------

_TOKEN_SAVINGS_SQL = rf"""
WITH toks AS (
    SELECT source, doc_id,
           {sql_hash60('text')} AS content_hash,
           CAST(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tok
    FROM documents
),
clusters AS (
    SELECT source, content_hash,
           COUNT(*) AS sz,
           SUM(n_tok) AS tok_all,
           MIN(doc_id) AS canonical_doc_id
    FROM toks GROUP BY source, content_hash
),
kept AS (
    SELECT c.source, c.content_hash, c.sz, c.tok_all, t.n_tok AS tok_kept
    FROM clusters c
    JOIN toks t ON t.source = c.source AND t.doc_id = c.canonical_doc_id
)
SELECT source,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
       CAST(SUM(tok_all) AS BIGINT) AS tokens_total,
       CAST(SUM(tok_kept) AS BIGINT) AS tokens_kept,
       ROUND(CAST(SUM(tok_all) - SUM(tok_kept) AS DOUBLE)
             / NULLIF(SUM(tok_all), 0), 6) AS savings_share
FROM kept
GROUP BY source
ORDER BY source
"""


@register("corpus_dedup_token_savings", oracle=_TOKEN_SAVINGS_SQL)
def corpus_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        hash60("text").alias("content_hash"),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: x != "",
            )
        )
        .cast("long")
        .alias("n_tok"),
    )
    clusters = toks.groupBy("source", "content_hash").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n_tok").alias("tok_all"),
        F.min(F.struct("doc_id", "n_tok")).alias("canon"),
    )
    return (
        clusters.groupBy("source")
        .agg(
            F.sum("sz").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_unique_docs"),
            F.sum("tok_all").cast("long").alias("tokens_total"),
            F.sum("canon.n_tok").cast("long").alias("tokens_kept"),
            F.round(
                (F.sum("tok_all") - F.sum("canon.n_tok")).cast("double")
                / F.nullif(F.sum("tok_all"), F.lit(0)),
                6,
            ).alias("savings_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Annealing-phase apportionment (largest remainder) — the two-phase
# training-mix allocator: the MAIN phase spreads its token budget over
# sources in proportion to their full token mass, the ANNEAL phase
# re-weights toward each source's high-quality half (docs at or above
# the global median length — the Llama-style end-of-training upsample).
# Budgets are apportioned with the largest-remainder method, so every
# phase's integer allocations sum EXACTLY to its budget — floor quotas
# plus one extra token-block to the sources with the largest
# remainders (rank window with a total-order tie-break). All integer
# arithmetic (quota numerators stay ≤ budget × corpus tokens ≪ 2^63);
# the only corpus-proportional work is one token-count aggregate.
# ---------------------------------------------------------------------------

_ANNEAL_BUDGETS = {"main": 1_000_000, "anneal": 100_000}

_ANNEAL_SQL = rf"""
WITH toks AS (
    SELECT source, n_chars,
           CAST(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                                x -> x <> '')) AS BIGINT) AS n_tok
    FROM documents
),
med AS (SELECT median(n_chars) AS med_chars FROM toks),
weights AS (
    -- zero-token sources are excluded (they can receive no allocation,
    -- and dropping them keeps the per-phase total strictly positive so
    -- the quota division is defined on any non-empty corpus)
    SELECT 'main' AS phase, source, SUM(n_tok) AS w FROM toks
    GROUP BY source HAVING SUM(n_tok) > 0
    UNION ALL
    SELECT 'anneal', t.source, SUM(t.n_tok)
    FROM toks t, med m WHERE t.n_chars >= m.med_chars
    GROUP BY t.source HAVING SUM(t.n_tok) > 0
),
budgeted AS (
    SELECT phase, source, w,
           CASE phase WHEN 'main' THEN {_ANNEAL_BUDGETS["main"]}
                      ELSE {_ANNEAL_BUDGETS["anneal"]} END AS budget,
           SUM(w) OVER (PARTITION BY phase) AS tot
    FROM weights
),
quotas AS (
    SELECT phase, source, w, budget,
           (budget * w) // tot AS base_alloc,
           (budget * w) % tot AS remainder,
           budget - SUM((budget * w) // tot) OVER (PARTITION BY phase)
               AS leftover,
           ROW_NUMBER() OVER (PARTITION BY phase
                              ORDER BY (budget * w) % tot DESC, source ASC)
               AS rem_rank
    FROM budgeted
)
SELECT phase, source,
       CAST(w AS BIGINT) AS weight_tokens,
       CAST(base_alloc AS BIGINT) AS base_alloc,
       CAST(base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_tokens,
       ROUND(CAST(base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
                  AS DOUBLE) / budget, 6) AS alloc_share
FROM quotas
ORDER BY phase, source
"""


@register("corpus_anneal_apportionment", oracle=_ANNEAL_SQL)
def corpus_anneal_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = load_table(spark, sf_dir, "documents")
    toks = session_cache(
        docs.select(
            "source",
            "n_chars",
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda x: x != "",
                )
            )
            .cast("long")
            .alias("n_tok"),
        )
    )
    # Distributed exact median (round 9): percentile() buffers every
    # n_chars in one aggregation buffer; the two-phase selection is
    # bit-identical and scale-safe (toks is already session_cached).
    from deathmetal_datalake_spark.operators.ordering import exact_global_quantiles

    med = exact_global_quantiles(toks, F.col("n_chars"), [0.5]).select(
        F.col("q").alias("med_chars")
    )
    main_w = (
        toks.groupBy("source")
        .agg(F.sum("n_tok").alias("w"))
        .filter(F.col("w") > 0)
        .select(F.lit("main").alias("phase"), "source", "w")
    )
    anneal_w = (
        toks.crossJoin(broadcast(med))
        .filter(F.col("n_chars") >= F.col("med_chars"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("w"))
        .filter(F.col("w") > 0)
        .select(F.lit("anneal").alias("phase"), "source", "w")
    )
    budget = (
        F.when(F.col("phase") == "main", F.lit(_ANNEAL_BUDGETS["main"]))
        .otherwise(F.lit(_ANNEAL_BUDGETS["anneal"]))
        .cast("long")
    )
    w_phase = Window.partitionBy("phase")
    budgeted = main_w.unionByName(anneal_w).select(
        "phase",
        "source",
        "w",
        budget.alias("budget"),
        F.sum("w").over(w_phase).alias("tot"),
    )
    # Integer `div`, not floor(double /): budget*w can exceed 2^53, where a
    # double floor diverges from the exact quotient the oracle's // computes.
    base = F.expr("(budget * w) div tot").cast("long")
    quotas = budgeted.select(
        "phase",
        "source",
        "w",
        "budget",
        base.alias("base_alloc"),
        ((F.col("budget") * F.col("w")) % F.col("tot")).alias("remainder"),
    ).select(
        "*",
        (F.col("budget") - F.sum("base_alloc").over(w_phase)).alias("leftover"),
        F.row_number()
        .over(w_phase.orderBy(F.desc("remainder"), F.asc("source")))
        .alias("rem_rank"),
    )
    alloc = F.col("base_alloc") + F.when(
        F.col("rem_rank") <= F.col("leftover"), 1
    ).otherwise(0)
    return quotas.select(
        "phase",
        "source",
        F.col("w").cast("long").alias("weight_tokens"),
        F.col("base_alloc").cast("long").alias("base_alloc"),
        alloc.cast("long").alias("alloc_tokens"),
        F.round(alloc.cast("double") / F.col("budget"), 6).alias("alloc_share"),
    ).orderBy("phase", "source")


# ---------------------------------------------------------------------------
# Sentence-level exact dedup (round 9) — the finer-grained boilerplate
# pass document-level dedup misses: legal footers and cookie banners
# repeat across otherwise-distinct documents. Explode sentences (the
# readability scorer's [.!?]+ segmentation, trimmed, non-empty), hash,
# and report per source the duplicated-sentence mass — occurrences
# beyond each sentence's first — as the de-boilerplate savings. Hash
# aggregates only; the explode is corpus-linear in sentence count.
# ---------------------------------------------------------------------------

_SENT_DEDUP_SQL = rf"""
WITH sents AS (
    SELECT source,
           {sql_hash60("TRIM(s)")} AS sh
    FROM documents,
         UNNEST(string_split_regex(text, '[.!?]+')) AS t(s)
    WHERE LENGTH(TRIM(s)) > 0
),
per_hash AS (
    SELECT source, sh, COUNT(*) AS cnt FROM sents GROUP BY source, sh
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_sentences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_sentences,
       CAST(SUM(cnt - 1) AS BIGINT) AS n_duplicate_occurrences,
       ROUND(SUM(cnt - 1) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_rate
FROM per_hash
GROUP BY source
ORDER BY source
"""


@register("corpus_sentence_dedup", oracle=_SENT_DEDUP_SQL)
def corpus_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import hash60, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    sents = docs.select(
        "source",
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s"),
    ).filter(F.length(F.trim("s")) > 0)
    per_hash = (
        sents.select("source", hash60(F.trim(F.col("s"))).alias("sh"))
        .groupBy("source", "sh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_hash.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_sentences"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_sentences"),
            F.sum(F.col("cnt") - 1).cast("long").alias("n_duplicate_occurrences"),
            F.round(
                F.sum(F.col("cnt") - 1) / F.sum("cnt").cast("double"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Perplexity-quartile mix (round-9 continuation) — the CCNet-style
# corpus split: score every document with the add-one bigram LM
# (text_bigram_surprisal_score's integer floor-log2 surprisal — no
# libm), rank documents by mean surprisal, and report the
# head/middle/tail mix as NTILE(4) quartiles with each bucket's doc
# and token mass. Pretraining pipelines keep the head, mine the
# middle, and drop the tail. Bucketing is BY RANK, not by a float
# threshold against an interpolated quantile value — rank + closed-
# form NTILE (two_phase_order + ntile_from_rank, sub_key on the doc
# tie-break) is integer-exact on both engines, so there is no
# boundary-ulp class to defend.
# ---------------------------------------------------------------------------

_PPLMIX_SQL = rf"""
WITH tok AS (
    SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
    FROM documents
),
uni AS (SELECT UNNEST(toks) AS w1 FROM tok),
c1 AS (SELECT w1, COUNT(*) AS cw FROM uni GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w1) AS vsz FROM uni),
bg AS (
    SELECT t.doc_id, t.toks[g.i] AS w1, t.toks[g.i + 1] AS w2
    FROM tok t, UNNEST(range(1, len(t.toks))) AS g(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
bits AS (
    SELECT b.doc_id,
           LENGTH(printf('%b', (c1.cw + v.vsz) // (cb.c12 + 1))) - 1 AS s
    FROM bg b JOIN cb USING (w1, w2) JOIN c1 USING (w1), v
),
perdoc AS (
    SELECT b.doc_id, COUNT(*) AS n_bigrams, {sql_davg("s", "mean_bits")},
           MAX(len(t.toks)) AS n_tokens
    FROM bits b JOIN tok t USING (doc_id)
    GROUP BY b.doc_id
),
scored AS (
    SELECT NTILE(4) OVER (ORDER BY mean_bits ASC, doc_id ASC) AS quartile,
           n_tokens, mean_bits
    FROM perdoc
)
SELECT CAST(quartile AS BIGINT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       {sql_davg("mean_bits", "mean_surprisal_bits")}
FROM scored
GROUP BY quartile
ORDER BY quartile
"""


@register("corpus_perplexity_quartile_mix", oracle=_PPLMIX_SQL)
def corpus_perplexity_quartile_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.operators.ordering import (
        ntile_from_rank,
        two_phase_order,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache
    from deathmetal_datalake_spark.sources.tables import load_table

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    uni = docs.select(F.explode("toks").alias("w1"))
    c1 = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    vocab = uni.agg(F.countDistinct("w1").alias("vsz"))
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bits = (
        bg.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (F.col("c12") + F.lit(1)).cast("long").alias("num"),
            (F.col("cw") + F.col("vsz")).cast("long").alias("den"),
        )
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("den div num"))) - 1)
            .cast("long")
            .alias("s"),
        )
    )
    ntok = docs.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    perdoc = session_cache(
        bits.groupBy("doc_id")
        .agg(davg("s", "mean_bits"))
        .join(ntok, "doc_id")
    )
    ranked = two_phase_order(
        perdoc,
        [F.asc("mean_bits"), F.asc("doc_id")],
        F.col("mean_bits"),
        rank_col="rnk",
        n_total_col="n_docs_total",
        sub_key=F.col("doc_id"),
    )
    scored = ranked.select(
        ntile_from_rank(F.col("rnk"), F.col("n_docs_total"), 4).alias(
            "quartile"
        ),
        "n_tokens",
        "mean_bits",
    )
    return (
        scored.groupBy(F.col("quartile").cast("long").alias("quartile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            davg("mean_bits", "mean_surprisal_bits"),
        )
        .orderBy("quartile")
    )


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sample (round 10) — the
# variance-optimal upgrade of the proportional stratified sampler: a
# stratum's share of the budget is proportional to N_h * S_h (big AND
# internally varied strata get more), the allocation every survey- and
# eval-set-builder reaches for once quality scores have spread. Chain:
# exact per-stratum moments (decimal sums -> the VARCHAR double
# crossing, so S_h = sqrt(var) is the same IEEE value on both
# engines), weights summed by an ORDERED bounded fold (relational SUM
# guarantees no order for doubles), largest-remainder integer
# apportionment of the budget (exact; frac ties broken by source), and
# a deterministic hash-priority draw within each stratum. 100 TB: one
# scan for moments, one rank-per-stratum draw — no all-pairs, strata
# bounded by the source enum.
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 600

_NEYMAN_SQL = f"""
WITH m AS (
    SELECT source,
           COUNT(*) AS n_pop,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               AS s1,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))
                         * CAST(n_chars AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               AS s2
    FROM documents GROUP BY source
),
sh AS (
    SELECT source, n_pop,
           SQRT((s2 - s1 * s1 / n_pop) / n_pop) AS s_h
    FROM m
),
wtot AS (
    SELECT list_sum(list(n_pop * s_h ORDER BY source)) AS wsum FROM sh
),
quota AS (
    SELECT source, n_pop, s_h,
           {_NEYMAN_BUDGET} * (n_pop * s_h) / wsum AS q
    FROM sh, wtot
),
alloc AS (
    SELECT source, n_pop, s_h, q, FLOOR(q) AS fl,
           ROW_NUMBER() OVER (ORDER BY q - FLOOR(q) DESC, source ASC) AS rk
    FROM quota
),
rem AS (
    SELECT {_NEYMAN_BUDGET} - SUM(CAST(fl AS BIGINT)) AS r FROM alloc
),
final AS (
    SELECT source, n_pop, s_h,
           CAST(fl AS BIGINT) + CASE WHEN rk <= rem.r THEN 1 ELSE 0 END
               AS alloc_n
    FROM alloc, rem
),
ranked AS (
    SELECT d.source, d.n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY {sql_hash60("CAST(d.doc_id AS VARCHAR)")}, d.doc_id
           ) AS rn
    FROM documents d
),
drawn AS (
    SELECT r.source, COUNT(*) AS n_drawn,
           {sql_davg("r.n_chars", "mean_chars")}
    FROM ranked r JOIN final f USING (source)
    WHERE r.rn <= f.alloc_n
    GROUP BY r.source
)
SELECT f.source,
       CAST(f.n_pop AS BIGINT) AS n_pop,
       ROUND(f.s_h, 6) AS stddev_chars,
       f.alloc_n,
       CAST(COALESCE(d.n_drawn, 0) AS BIGINT) AS n_drawn,
       d.mean_chars AS mean_chars_drawn
FROM final f LEFT JOIN drawn d USING (source)
ORDER BY f.source
"""


@register("sample_neyman_allocation", oracle=_NEYMAN_SQL)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    dec = F.col("n_chars").cast("decimal(18,6)")
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pop"),
        dd(F.sum(dec)).alias("s1"),
        dd(F.sum(dec * dec)).alias("s2"),
    )
    sh = session_cache(
        m.select(
            "source",
            "n_pop",
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_pop"))
                / F.col("n_pop")
            ).alias("s_h"),
        )
    )
    # Ordered bounded fold for the weight total (sources sorted) — the
    # markov/holt convention for summing doubles deterministically.
    wtot = sh.agg(
        F.sort_array(
            F.collect_list(F.struct("source", (F.col("n_pop") * F.col("s_h")).alias("w")))
        ).alias("a")
    ).select(
        F.expr(
            "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.w)"
        ).alias("wsum")
    )
    quota = sh.crossJoin(broadcast(wtot)).select(
        "source",
        "n_pop",
        "s_h",
        (
            F.lit(_NEYMAN_BUDGET) * (F.col("n_pop") * F.col("s_h")) / F.col("wsum")
        ).alias("q"),
    )
    w_rk = Window.orderBy(
        F.desc(F.col("q") - F.floor(F.col("q"))), F.asc("source")
    )  # bounded source-enum frame
    alloc = quota.select(
        "source",
        "n_pop",
        "s_h",
        "q",
        F.floor("q").alias("fl"),
        F.row_number().over(w_rk).alias("rk"),
    )
    rem = alloc.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum(F.col("fl").cast("long"))).alias("r")
    )
    final = session_cache(
        alloc.crossJoin(broadcast(rem)).select(
            "source",
            "n_pop",
            "s_h",
            (
                F.col("fl").cast("long")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            ).alias("alloc_n"),
        )
    )
    w_draw = Window.partitionBy("source").orderBy(
        hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w_draw).alias("rn")
    )
    drawn = (
        ranked.join(broadcast(final.select("source", "alloc_n")), "source")
        .filter(F.col("rn") <= F.col("alloc_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_drawn"),
            davg("n_chars", "mean_chars"),
        )
    )
    return (
        final.join(drawn, "source", "left")
        .select(
            "source",
            F.col("n_pop").cast("long").alias("n_pop"),
            F.round("s_h", 6).alias("stddev_chars"),
            "alloc_n",
            F.coalesce(F.col("n_drawn"), F.lit(0)).cast("long").alias("n_drawn"),
            F.col("mean_chars").alias("mean_chars_drawn"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic bottom-k uniform sample (round 11) — hash-ordered
# sampling, the distributed replacement for reservoir sampling: the k
# documents with the smallest 60-bit md5(doc_id) hashes ARE a uniform
# random sample of the corpus (the hash induces a random permutation),
# and because the order is a pure function of the data, every engine,
# every retry, and every incremental re-run draws the SAME sample — no
# seed plumbing, no driver-side state. 100 TB: Spark executes the
# ORDER BY hash LIMIT k as TakeOrderedAndProject — each partition keeps
# a local k-heap, the driver merges P*k candidates, nothing resembling
# a global sort happens. The companion receipt columns (doc length)
# make the drawn sample auditable downstream.
# ---------------------------------------------------------------------------

_BOTTOMK_K = 200

_BOTTOMK_SQL = f"""
SELECT doc_id,
       {sql_hash60("CAST(doc_id AS VARCHAR)")} AS hash_key,
       n_chars
FROM documents
ORDER BY hash_key, doc_id
LIMIT {_BOTTOMK_K}
"""


@register("sample_bottomk_uniform", oracle=_BOTTOMK_SQL)
def sample_bottomk_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        docs.select(
            "doc_id",
            hash60(F.col("doc_id").cast("string")).alias("hash_key"),
            "n_chars",
        )
        .orderBy("hash_key", "doc_id")
        .limit(_BOTTOMK_K)
    )


# ---------------------------------------------------------------------------
# Duplicate-rate rollup by source (round 11) — the corpus-quality gauge
# curation dashboards lead with: what fraction of each source's
# documents are exact-content duplicates? Content identity is the
# engine-portable 60-bit md5 hash of the (NULL-coalesced) text, so both
# engines count the same distinct set; the rate is a rounded ratio of
# exact counts. 100 TB: one hash aggregate per source — COUNT(DISTINCT)
# over the hash is a partial-aggregated two-stage plan, no window, no
# broadcast.
# ---------------------------------------------------------------------------

_DUPRATE_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT {sql_hash60("COALESCE(text, '')")}) AS BIGINT)
           AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT {sql_hash60("COALESCE(text, '')")})
                        AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


@register("corpus_dedup_rate_by_source", oracle=_DUPRATE_SQL)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", hash60(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Kish effective sample size under language balancing (round 11) — the
# survey-statistics receipt every reweighted training mix needs: if
# documents are weighted inverse to language prevalence (w = N/n_lang,
# the standard balancing weight), the weighted corpus behaves like only
# n_eff = (sum w)^2 / sum w^2 = L^2 / sum_l (1/n_l) i.i.d. documents
# (L x the harmonic mean of stratum sizes). The design effect N/n_eff
# quantifies the variance cost of balancing. Exactness: stratum counts
# are exact; the <= |langs|-term reciprocal sum is folded in lang order
# on both engines (the Neyman list_sum ORDER BY parity). 100 TB: one
# enum-bounded aggregate.
# ---------------------------------------------------------------------------

_KISH_SQL = """
WITH c AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang),
t AS (SELECT COUNT(*) AS l, SUM(nl) AS n FROM c),
h AS (SELECT list_sum(list(1.0 / nl ORDER BY lang)) AS inv FROM c)
SELECT CAST(t.n AS BIGINT) AS n_docs,
       CAST(t.l AS BIGINT) AS n_strata,
       CASE WHEN t.l = 0 THEN NULL
            ELSE ROUND(CAST(t.l AS DOUBLE) * t.l / h.inv, 6) END AS kish_neff,
       CASE WHEN t.l = 0 THEN NULL
            ELSE ROUND(CAST(t.n AS DOUBLE) * h.inv
                       / (CAST(t.l AS DOUBLE) * t.l), 6) END AS design_effect
FROM t, h
"""


@register("sample_kish_effective_size", oracle=_KISH_SQL)
def sample_kish_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    t = c.agg(F.count(F.lit(1)).alias("l"), F.sum("nl").alias("n"))
    # Reciprocal sum folded in lang order — deterministic double
    # addition on both engines (list_sum <-> aggregate parity).
    h = c.agg(
        F.aggregate(
            F.expr(
                "transform(array_sort(collect_list(struct(lang, nl))),"
                " p -> 1.0 / p.nl)"
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("inv")
    )
    ld = F.col("l").cast("double")
    nd = F.col("n").cast("double")
    return t.crossJoin(broadcast(h)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("l").cast("long").alias("n_strata"),
        F.when(F.col("l") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(ld * ld / F.col("inv"), 6))
        .alias("kish_neff"),
        F.when(F.col("l") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(nd * F.col("inv") / (ld * ld), 6))
        .alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# Shard-assignment uniformity (round 11) — the global-shuffle receipt a
# training pipeline reads before writing shards: documents land in
# shard = hash60(doc_id) % K, and the query reports how uniform the
# assignment actually is (min/max/expected shard size plus the exact
# scaled chi-square sum((K*c_i - N)^2), whose integer form avoids any
# per-shard division). A skewed hash here means one trainer reads 3x
# the data of another — this is the audit that catches it. 100 TB: one
# hash aggregate to the K-bounded shard frame, one 1-row reduce.
# ---------------------------------------------------------------------------

_SHARD_K = 1024

_SHARD_SQL = f"""
WITH a AS (
    SELECT {sql_hash60("CAST(doc_id AS VARCHAR)")} % {_SHARD_K} AS shard
    FROM documents
),
c AS (SELECT shard, COUNT(*) AS cnt FROM a GROUP BY shard),
t AS (
    SELECT COUNT(*) AS n_used,
           SUM(CAST(cnt AS HUGEINT)) AS n,
           MIN(cnt) AS cmin,
           MAX(cnt) AS cmax,
           SUM(({_SHARD_K} * CAST(cnt AS HUGEINT) - (SELECT SUM(CAST(cnt AS HUGEINT)) FROM c))
               * ({_SHARD_K} * CAST(cnt AS HUGEINT) - (SELECT SUM(CAST(cnt AS HUGEINT)) FROM c))) AS chi2s
    FROM c
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n_used AS BIGINT) AS n_shards_used,
       CAST(cmin AS BIGINT) AS min_shard,
       CAST(cmax AS BIGINT) AS max_shard,
       CASE WHEN COALESCE(n, 0) = 0 THEN NULL
            ELSE ROUND(CAST(CAST(chi2s AS VARCHAR) AS DOUBLE)
                       / ({_SHARD_K}.0 * {_SHARD_K}.0
                          * CAST(CAST(n AS VARCHAR) AS DOUBLE)), 6)
       END AS chi2_over_k2n
FROM t
"""


@register("corpus_shard_assignment_uniformity", oracle=_SHARD_SQL)
def corpus_shard_assignment_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    a = load_table(spark, sf_dir, "documents").select(
        (hash60(F.col("doc_id").cast("string")) % _SHARD_K).alias("shard")
    )
    c = session_cache(
        a.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = c.agg(F.sum(F.col("cnt").cast("decimal(19,0)")).alias("ntot"))
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    t = (
        c.crossJoin(broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_used"),
            F.max(F.col("ntot")).alias("n"),
            F.min("cnt").alias("cmin"),
            F.max("cnt").alias("cmax"),
            F.sum(
                (F.lit(_SHARD_K).cast("decimal(19,0)") * d19("cnt") - F.col("ntot"))
                * (F.lit(_SHARD_K).cast("decimal(19,0)") * d19("cnt") - F.col("ntot"))
            ).alias("chi2s"),
        )
    )
    dd = lambda col: col.cast("string").cast("double")  # noqa: E731
    n = F.col("n")
    return t.select(
        n.cast("long").alias("n_docs"),
        F.col("n_used").cast("long").alias("n_shards_used"),
        F.col("cmin").cast("long").alias("min_shard"),
        F.col("cmax").cast("long").alias("max_shard"),
        F.when(
            F.coalesce(n, F.lit(0).cast("decimal(19,0)")) == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                dd(F.col("chi2s"))
                / (
                    F.lit(float(_SHARD_K))
                    * F.lit(float(_SHARD_K))
                    * dd(n)
                ),
                6,
            )
        )
        .alias("chi2_over_k2n"),
    )


# ---------------------------------------------------------------------------
# Length histogram in log2 buckets (round 11) — the packing-design
# input: sequence packing efficiency is a function of the LENGTH
# DISTRIBUTION's shape, and log2 buckets (bucket = bitlength(n_chars))
# are the standard exact-integer rendering of it. Per bucket: count,
# bounds, exact mean length, share of corpus bytes. 100 TB: one hash
# aggregate to a <= 64-row frame.
# ---------------------------------------------------------------------------

_LOG2_HIST_SQL = f"""
WITH b AS (
    SELECT CASE WHEN n_chars <= 0 THEN 0
                ELSE LENGTH(bin(CAST(n_chars AS BIGINT))) END AS bucket,
           n_chars
    FROM documents
),
t AS (SELECT SUM(CAST(n_chars AS HUGEINT)) AS total_chars FROM documents)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       {sql_davg("n_chars", "mean_chars")},
       ROUND(CAST(CAST(SUM(CAST(n_chars AS HUGEINT)) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.total_chars AS VARCHAR) AS DOUBLE), 6)
           AS char_share
FROM b, t
GROUP BY bucket, t.total_chars
ORDER BY bucket
"""


@register("corpus_length_log2_histogram", oracle=_LOG2_HIST_SQL)
def corpus_length_log2_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents").select("n_chars")
    b = docs.select(
        F.when(F.col("n_chars") <= 0, F.lit(0).cast("long"))
        .otherwise(F.length(F.bin(F.col("n_chars").cast("bigint"))).cast("long"))
        .alias("bucket"),
        "n_chars",
    )
    t = docs.agg(
        F.sum(F.col("n_chars").cast("decimal(19,0)")).alias("total_chars")
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        b.crossJoin(broadcast(t))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            davg("n_chars", "mean_chars"),
            F.round(
                dd(F.sum(F.col("n_chars").cast("decimal(19,0)")))
                / dd(F.max("total_chars")),
                6,
            ).alias("char_share"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "min_chars",
            "max_chars",
            "mean_chars",
            "char_share",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Horvitz-Thompson estimate from the bottom-k sample (round 11) — the
# audit that closes the sampling loop: the deterministic hash bottom-k
# draw (sample_bottomk_uniform) is a simple random sample of size
# k' = min(k, N), so the HT estimator (N/k') * sum_sample(n_chars)
# should land near the true corpus total — and because the sample is a
# pure function of the data, the estimate (and its signed relative
# error, computed IN-QUERY against the true total) is reproducible
# bit-for-bit. 100 TB: TakeOrderedAndProject for the draw, one scan
# for the truth, two 1-row reduces.
# ---------------------------------------------------------------------------

_HT_SQL = f"""
WITH s AS (
    SELECT n_chars
    FROM documents
    ORDER BY {sql_hash60("CAST(doc_id AS VARCHAR)")}, doc_id
    LIMIT {_BOTTOMK_K}
),
samp AS (SELECT COUNT(*) AS kd, SUM(CAST(n_chars AS HUGEINT)) AS sy FROM s),
t AS (SELECT COUNT(*) AS n, SUM(CAST(n_chars AS HUGEINT)) AS ty
      FROM documents)
SELECT CAST(t.n AS BIGINT) AS n_docs,
       CAST(samp.kd AS BIGINT) AS k_drawn,
       CAST(t.ty AS BIGINT) AS true_total_chars,
       CASE WHEN COALESCE(samp.kd, 0) = 0 THEN NULL
            ELSE ROUND(CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(samp.kd AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(samp.sy AS VARCHAR) AS DOUBLE), 6)
       END AS ht_estimate,
       CASE WHEN COALESCE(samp.kd, 0) = 0 OR COALESCE(t.ty, 0) = 0 THEN NULL
            ELSE ROUND((CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                        / CAST(CAST(samp.kd AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(samp.sy AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(t.ty AS VARCHAR) AS DOUBLE))
                       / CAST(CAST(t.ty AS VARCHAR) AS DOUBLE), 6)
       END AS rel_error
FROM t, samp
"""


@register("sample_bottomk_ht_estimate", oracle=_HT_SQL)
def sample_bottomk_ht_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = (
        docs.select(
            "n_chars",
            hash60(F.col("doc_id").cast("string")).alias("hk"),
            "doc_id",
        )
        .orderBy("hk", "doc_id")
        .limit(_BOTTOMK_K)
    )
    samp = s.agg(
        F.count(F.lit(1)).alias("kd"),
        F.sum(F.col("n_chars").cast("decimal(19,0)")).alias("sy"),
    )
    t = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("decimal(19,0)")).alias("ty"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    ht = dd(F.col("n").cast("decimal(19,0)")) / dd(
        F.col("kd").cast("decimal(19,0)")
    ) * dd(F.col("sy"))
    zero19 = F.lit(0).cast("decimal(19,0)")
    return t.crossJoin(broadcast(samp)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("kd").cast("long").alias("k_drawn"),
        F.col("ty").cast("long").alias("true_total_chars"),
        F.when(F.coalesce(F.col("kd"), F.lit(0)) == 0, F.lit(None).cast("double"))
        .otherwise(F.round(ht, 6))
        .alias("ht_estimate"),
        F.when(
            (F.coalesce(F.col("kd"), F.lit(0)) == 0)
            | (F.coalesce(F.col("ty"), zero19) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round((ht - dd(F.col("ty"))) / dd(F.col("ty")), 6))
        .alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Length-prune retention simulation (round 12) — the "what do we lose"
# receipt for the simplest curation filter: dropping the globally
# shortest 10% / 25% / 50% of documents, how many docs and tokens does
# each source keep? Sources skewed toward short docs surface
# immediately (their retention collapses first). Exactness: the global
# ascending (n_chars, doc_id) rank comes from the distributed
# two-phase cumsum, and the keep rule is the INTEGER cross-multiplied
# comparison 100*rank > cutoff*n — no floor, no float thresholds.
# 100 TB: one two-phase rank, a 3-row cutoff dim, one hash aggregate.
# ---------------------------------------------------------------------------

_PRUNE_CUTS = (10, 25, 50)

_PRUNE_SQL = f"""
WITH d AS (
    SELECT doc_id, source,
           LENGTH(string_split_regex(TRIM(text), '\\s+')) AS n_tok,
           n_chars
    FROM documents WHERE text IS NOT NULL
),
n AS (SELECT COUNT(*) AS n FROM d),
r AS (
    SELECT source, n_tok,
           ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r
    FROM d
),
tot AS (
    SELECT source, COUNT(*) AS src_docs,
           SUM(CAST(n_tok AS HUGEINT)) AS src_tokens
    FROM d GROUP BY source
),
cuts AS (SELECT UNNEST([{", ".join(str(c) for c in _PRUNE_CUTS)}]) AS cut),
kept AS (
    SELECT c.cut, r.source,
           COUNT(*) AS n_docs_kept,
           SUM(CAST(r.n_tok AS HUGEINT)) AS n_tokens_kept
    FROM r CROSS JOIN cuts c
    WHERE 100 * r.r > c.cut * (SELECT n FROM n)
    GROUP BY 1, 2
)
SELECT t.source,
       CAST(c.cut AS BIGINT) AS cutoff_pct,
       CAST(COALESCE(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       CASE WHEN t.src_tokens = 0 THEN NULL
            ELSE ROUND(CAST(COALESCE(k.n_tokens_kept, 0) AS DOUBLE)
                       / CAST(t.src_tokens AS DOUBLE), 6)
       END AS token_retention
FROM tot t CROSS JOIN cuts c
LEFT JOIN kept k ON k.cut = c.cut AND k.source = t.source
ORDER BY cutoff_pct, t.source
"""


@register("corpus_length_prune_retention", oracle=_PRUNE_SQL)
def corpus_length_prune_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    d = session_cache(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
            "n_chars",
        )
    )
    r = two_phase_order(
        d,
        [F.asc("n_chars"), F.asc("doc_id")],
        F.col("n_chars"),
        rank_col="r",
        sub_key=F.col("doc_id"),
        n_total_col="n",
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _PRUNE_CUTS], "cut int"
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    kept = (
        r.crossJoin(broadcast(cuts))  # [dim] 3-row cutoff dim
        .filter(
            F.lit(100) * F.col("r") > F.col("cut").cast("long") * F.col("n")
        )
        .groupBy("cut", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum(d19("n_tok")).alias("n_tokens_kept"),
        )
    )
    tot = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_docs"),
        F.sum(d19("n_tok")).alias("src_tokens"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        tot.crossJoin(broadcast(cuts))
        .join(kept, ["cut", "source"], "left")
        .select(
            "source",
            F.col("cut").cast("long").alias("cutoff_pct"),
            F.coalesce(F.col("n_docs_kept"), F.lit(0))
            .cast("long")
            .alias("n_docs_kept"),
            F.coalesce(F.col("n_tokens_kept"), zero)
            .cast("long")
            .alias("n_tokens_kept"),
            F.when(
                F.coalesce(F.col("src_tokens"), zero) == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.coalesce(F.col("n_tokens_kept"), zero).cast("double")
                    / F.col("src_tokens").cast("double"),
                    6,
                )
            )
            .alias("token_retention"),
        )
        .orderBy("cutoff_pct", "source")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled language mix, alpha = 0.5 (round 12) — the
# multilingual rebalancing rule (mC4 / XLM-R convention): sampling
# weights proportional to n_tokens^alpha flatten the language
# distribution so high-resource languages stop drowning the tail.
# alpha = 0.5 keeps every arithmetic step engine-exact: sqrt is
# IEEE-correctly-rounded in BOTH engines (no libm drift, unlike
# pow/log), each weight is then pinned to DECIMAL(18,6) (the same
# double->decimal contract dsum relies on; sqrt of a 100 TB language's
# token count is ~3e6, far inside 18,6), the weight total is an exact
# decimal sum, and the shares/boosts are identical IEEE divides of
# VARCHAR-parsed doubles. Output per language: natural share,
# temperature share, and the boost factor the sampler applies. 100 TB:
# one map-only token count, one map-combinable per-language aggregate,
# a 1-row total frame — no data-proportional state.
# ---------------------------------------------------------------------------

_TEMP_MIX_SQL = r"""
WITH per_doc AS (
    SELECT lang, LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens
    FROM documents
    WHERE text IS NOT NULL AND TRIM(text) <> ''
),
langs AS (
    SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM per_doc GROUP BY lang
),
w AS (
    SELECT lang, n_tokens,
           CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS wgt
    FROM langs
),
tot AS (
    SELECT SUM(CAST(n_tokens AS HUGEINT)) AS nt, SUM(wgt) AS wt FROM w
)
SELECT w.lang,
       w.n_tokens,
       ROUND(CAST(CAST(w.n_tokens AS VARCHAR) AS DOUBLE)
             / CAST(CAST(tot.nt AS VARCHAR) AS DOUBLE), 6) AS natural_share,
       ROUND(CAST(CAST(w.wgt AS VARCHAR) AS DOUBLE)
             / CAST(CAST(tot.wt AS VARCHAR) AS DOUBLE), 6) AS temp_share,
       ROUND((CAST(CAST(w.wgt AS VARCHAR) AS DOUBLE)
              / CAST(CAST(tot.wt AS VARCHAR) AS DOUBLE))
             / (CAST(CAST(w.n_tokens AS VARCHAR) AS DOUBLE)
                / CAST(CAST(tot.nt AS VARCHAR) AS DOUBLE)), 6) AS boost
FROM w, tot
ORDER BY w.lang
"""


@register("corpus_temperature_sampling_mix", oracle=_TEMP_MIX_SQL)
def corpus_temperature_sampling_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        )
    )
    langs = docs.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    ).groupBy("lang").agg(
        F.sum(F.col("n_tokens").cast("bigint")).alias("n_tokens")
    )
    w = langs.select(
        "lang",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double"))
        .cast("decimal(18,6)")
        .alias("wgt"),
    )
    tot = w.agg(
        F.sum(F.col("n_tokens").cast("decimal(38,0)")).alias("nt"),
        F.sum("wgt").alias("wt"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        w.crossJoin(broadcast(tot))  # [1row] corpus totals
        .select(
            "lang",
            "n_tokens",
            F.round(dd(F.col("n_tokens")) / dd(F.col("nt")), 6).alias(
                "natural_share"
            ),
            F.round(dd(F.col("wgt")) / dd(F.col("wt")), 6).alias("temp_share"),
            F.round(
                (dd(F.col("wgt")) / dd(F.col("wt")))
                / (dd(F.col("n_tokens")) / dd(F.col("nt"))),
                6,
            ).alias("boost"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Systematic interval sampling (round 13) — the classic 1-in-m design
# (every m-th unit of an ordered frame) with its expansion estimate,
# completing the sampling-theory battery (bottom-k/SRS, Neyman,
# Horvitz-Thompson, Kish): rank documents by doc_id with the two-phase
# distributed ordering (no single-task sort), take ranks ≡ 1 (mod m),
# and expand the sampled char mass by m. The audit reports the exact
# frame total next to the estimate — the design's error on THIS frame,
# not an approximation claim. 100 TB: one two-phase rank + two hash
# aggregates.
# ---------------------------------------------------------------------------

_SYS_M = 23

_SYS_SQL = f"""
WITH r AS (
    SELECT n_chars, ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
    FROM documents
),
s AS (
    SELECT COUNT(*) AS n_sampled, SUM(n_chars) AS chars_sampled
    FROM r WHERE rk % {_SYS_M} = 1
),
t AS (SELECT COUNT(*) AS n_total, SUM(n_chars) AS chars_total FROM documents)
SELECT CAST(t.n_total AS BIGINT) AS n_total,
       CAST(s.n_sampled AS BIGINT) AS n_sampled,
       CAST(t.chars_total AS BIGINT) AS chars_total,
       CAST({_SYS_M} * s.chars_sampled AS BIGINT) AS chars_estimate,
       ROUND(CAST({_SYS_M} * s.chars_sampled AS DOUBLE) / t.chars_total, 6)
           AS expansion_ratio
FROM s, t
"""


@register("sample_systematic_interval", oracle=_SYS_SQL)
def sample_systematic_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = two_phase_order(
        docs,
        [F.asc("doc_id")],
        F.col("doc_id"),
        rank_col="rk",
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    s = ranked.filter(F.col("rk") % _SYS_M == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("chars_sampled"),
    )
    t = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    return s.crossJoin(broadcast(t)).select(  # [1row] frame totals
        "n_total",
        "n_sampled",
        "chars_total",
        (F.lit(_SYS_M) * F.col("chars_sampled")).cast("long").alias(
            "chars_estimate"
        ),
        F.round(
            (F.lit(_SYS_M) * F.col("chars_sampled")).cast("double")
            / F.col("chars_total"),
            6,
        ).alias("expansion_ratio"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (round 13) — the distributed
# bootstrap done the only way a 1000-executor cluster can: each
# replicate b draws a per-row Poisson(1) weight from a HASH-seeded
# uniform (inverse CDF over exact threshold literals), so resampling
# is a pure row-local expression — no shared RNG state, reproducible
# across retries/partitionings, mergeable. Replicate uniforms come
# from TWO md5 digests per row via double hashing (u_b from
# h1 + (b+1)*h2, the bloom-filter trick — 16 md5s per row would
# dominate the scan; the affine cross-replicate dependence is the
# standard double-hashing trade and is irrelevant to per-replicate
# weight marginals). All 16 replicates ride ONE aggregate (32
# columns, no row explosion); each replicate's weighted sum is exact
# decimal (weights are small ints, values 2-decimal), so the only
# float per replicate is the final mean divide. The spread of the 16
# replicate means IS the sampling distribution of the mean.
# ---------------------------------------------------------------------------

_BOOT_B = 16
_BOOT_W = 1152921504606846976.0  # 2^60, the u-range, as exact double
_BOOT_M = 1152921504606846976  # 2^60 (integer form for the modulus)
# Poisson(1) CDF thresholds (exact double literals, shared verbatim
# with the oracle): P(X <= n) for n = 0..4; weights cap at 5.
_BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)


def _boot_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c!r} THEN {n}" for n, c in enumerate(_BOOT_CDF)
    )
    return f"(CASE {cases} ELSE 5 END)"


def _boot_sql() -> str:
    # h1: 60-bit, h2: 56-bit (so h1 + 16*h2 < 2^62 — no signed-64
    # overflow in either engine).
    h1 = sql_hash60("CAST(o_orderkey AS VARCHAR) || ':a'")
    h2 = (
        "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':b'), 1, 14)"
        " AS BIGINT)"
    )
    aggs, rows = [], []
    for b in range(_BOOT_B):
        u = f"(CAST(({h1} + {b + 1} * {h2}) % {_BOOT_M} AS DOUBLE) / {_BOOT_W!r})"
        w = _boot_w_sql(u)
        aggs.append(
            f"SUM({w}) AS n_{b}, "
            f"SUM(CAST({w} * o_totalprice AS DECIMAL(18,6))) AS s_{b}"
        )
        rows.append(
            f"({b}, (SELECT CAST(n_{b} AS BIGINT) FROM s),"
            f" (SELECT ROUND(CAST(CAST(s_{b} AS VARCHAR) AS DOUBLE)"
            f" / n_{b}, 6) FROM s))"
        )
    return f"""
WITH s AS (SELECT {", ".join(aggs)} FROM orders)
SELECT * FROM (VALUES
    {", ".join(rows)}
) v(b, n_eff, mean_b)
ORDER BY b
"""


@register("sample_poisson_bootstrap_means", oracle=_boot_sql())
def sample_poisson_bootstrap_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("x")
    )
    from deathmetal_datalake_spark.plans.registry import hash60

    h1 = hash60(F.concat(F.col("k").cast("string"), F.lit(":a")))
    h2 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("k").cast("string"), F.lit(":b"))), 1, 14
        ),
        16,
        10,
    ).cast("long")
    hashed = orders.select("x", h1.alias("h1"), h2.alias("h2"))
    aggs = []
    for b in range(_BOOT_B):
        u = (
            (F.col("h1") + F.lit(b + 1) * F.col("h2")) % F.lit(_BOOT_M)
        ).cast("double") / F.lit(_BOOT_W)
        w = F.lit(5)
        for n, c in reversed(list(enumerate(_BOOT_CDF))):
            w = F.when(u < F.lit(c), F.lit(n)).otherwise(w)
        aggs.append(F.sum(w).cast("long").alias(f"n_{b}"))
        aggs.append(
            F.sum((w * F.col("x")).cast("decimal(18,6)")).alias(f"s_{b}")
        )
    s = hashed.agg(*aggs)
    stack_args = ", ".join(
        f"{b}, n_{b}, ROUND(CAST(CAST(s_{b} AS STRING) AS DOUBLE)"
        f" / n_{b}, 6)"
        for b in range(_BOOT_B)
    )
    return s.selectExpr(
        f"stack({_BOOT_B}, {stack_args}) AS (b, n_eff, mean_b)"
    ).orderBy("b")
