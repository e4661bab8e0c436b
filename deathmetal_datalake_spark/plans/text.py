"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline surface: token counting, quality
scoring, n-gram-heuristic language ID, and content fingerprinting. All
built-in Catalyst expressions (split / higher-order array functions /
regex) — no Python UDFs — so they run inside whole-stage codegen and
scale linearly; at 100 TB this layer is a single map-only stage with no
shuffle until the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.registry import (
    davg,
    hash60,
    register,
    spread,
    sql_davg,
    sql_hash60,
)
from deathmetal_datalake_spark.sources.tables import load_table

_STOPWORDS = ["the", "a", "and", "of", "to", "in"]
_STOP_SQL = "['the', 'a', 'and', 'of', 'to', 'in']"

# BPE-ish token regex: letter runs, single digits, or single
# non-alphanumeric marks — a cheap stand-in for GPT-style pretokenizers.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


# ---------------------------------------------------------------------------
# Token / length statistics per document + per-language aggregate.
# ---------------------------------------------------------------------------

_TOKEN_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           lang,
           string_split_regex(TRIM(text), '\s+') AS toks,
           LENGTH(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           LENGTH(text) AS n_chars_exact
    FROM documents
)
SELECT doc_id,
       lang,
       LENGTH(toks) AS n_tokens,
       n_bpe_tokens,
       n_chars_exact,
       CAST(list_aggregate(list_transform(toks, t -> LENGTH(t)), 'sum') AS BIGINT) AS n_token_chars
FROM tok
"""


@register("text_token_stats", oracle=_TOKEN_SQL)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_exact"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).alias(
            "n_token_chars"
        ),
    )


_LANG_AGG_SQL = r"""
WITH tok AS (
    SELECT lang, LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM tok GROUP BY lang
"""


@register("text_tokens_per_lang", oracle=_LANG_AGG_SQL)
def text_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select("lang", F.size(_tokens()).cast("long").alias("n_tokens"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: stopword ratio, punctuation ratio, mean token length —
# the classic cheap pre-filters for LLM training corpora.
# ---------------------------------------------------------------------------

_QUALITY_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           string_split_regex(TRIM(text), '\s+') AS toks,
           LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
           LENGTH(text) AS n_chars
    FROM documents
)
SELECT doc_id,
       LENGTH(toks) AS n_tokens,
       ROUND(CAST(LENGTH(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
             / LENGTH(toks), 6) AS stopword_ratio,
       ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
       ROUND(CAST(list_aggregate(list_transform(toks, t -> LENGTH(t)), 'sum') AS DOUBLE)
             / LENGTH(toks), 6) AS mean_token_len
FROM tok
"""


@register("text_quality_scores", oracle=_QUALITY_SQL)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    token_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        # NULLIF: an empty doc has zero chars, and Spark's default ANSI
        # mode would abort the scan where the oracle yields NULL (x/0)
        # — round-8 degenerate-corpus find.
        F.round(
            n_punct.cast("double") / F.nullif(F.length("text"), F.lit(0)), 6
        ).alias("punct_ratio"),
        F.round(token_chars.cast("double") / n_tokens, 6).alias("mean_token_len"),
    )


# ---------------------------------------------------------------------------
# Language ID: n-gram/stopword-hit heuristic with a CJK codepoint check.
# Deterministic CASE cascade — identical tie-breaking in both engines.
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
}


def _hits(toks: Column, words: list[str]) -> Column:
    marker = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker, t)))


def _sql_hits(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"LENGTH(list_filter(toks, t -> list_contains({arr}, t)))"


_LANGID_SQL = rf"""
WITH tok AS (
    SELECT doc_id, lang,
           string_split_regex(LOWER(TRIM(COALESCE(text, ''))), '\s+') AS toks,
           regexp_matches(COALESCE(text, ''), '[\x{{4e00}}-\x{{9fff}}]') AS has_cjk
    FROM documents
),
scored AS (
    SELECT doc_id, lang, has_cjk,
           {_sql_hits(_LANG_MARKERS["en"])} AS hits_en,
           {_sql_hits(_LANG_MARKERS["de"])} AS hits_de,
           {_sql_hits(_LANG_MARKERS["fr"])} AS hits_fr,
           {_sql_hits(_LANG_MARKERS["es"])} AS hits_es
    FROM tok
)
SELECT doc_id,
       lang,
       CASE WHEN has_cjk THEN 'zh'
            WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
            WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
            WHEN hits_fr >= hits_es THEN 'fr'
            ELSE 'es' END AS predicted_lang,
       CAST(hits_en AS BIGINT) AS hits_en,
       CAST(hits_de AS BIGINT) AS hits_de,
       CAST(hits_fr AS BIGINT) AS hits_fr,
       CAST(hits_es AS BIGINT) AS hits_es
FROM scored
"""


@register("text_language_id", oracle=_LANGID_SQL)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # NULL text classifies like an empty doc: without the coalesce,
    # Spark's size(NULL) = -1 made every hit comparison true ('en')
    # while the oracle's NULL CASE chain fell through to 'es' — a
    # latent NULL-doc divergence (round-11 degenerate-corpus find).
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.lower(F.trim(txt)), r"\s+")
    has_cjk = txt.rlike("[一-鿿]")
    scored = docs.select(
        "doc_id",
        "lang",
        has_cjk.alias("has_cjk"),
        *[
            _hits(toks, words).cast("long").alias(f"hits_{lang}")
            for lang, words in _LANG_MARKERS.items()
        ],
    )
    he, hd, hf, hs = (F.col(f"hits_{x}") for x in ("en", "de", "fr", "es"))
    predicted = (
        F.when(F.col("has_cjk"), F.lit("zh"))
        .when((he >= hd) & (he >= hf) & (he >= hs), F.lit("en"))
        .when((hd >= hf) & (hd >= hs), F.lit("de"))
        .when(hf >= hs, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scored.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        "hits_en",
        "hits_de",
        "hits_fr",
        "hits_es",
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: 60-bit content hash of whitespace-normalized
# text (the exact-dedup key), shared bit-for-bit with the oracle.
# ---------------------------------------------------------------------------

_FP_NORM = r"regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')"
_FP_SQL = f"""
SELECT doc_id,
       {sql_hash60(_FP_NORM)} AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=_FP_SQL)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", hash60(normalized).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Composite quality filter: the keep/drop decision an LLM-corpus
# pipeline applies before training — thresholds over the quality
# signals, emitted with per-doc reasons for auditability.
# ---------------------------------------------------------------------------

_FILTER_SQL = rf"""
WITH tok AS (
    SELECT doc_id,
           string_split_regex(TRIM(text), '\s+') AS toks,
           LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
           LENGTH(text) AS n_chars
    FROM documents
),
scored AS (
    SELECT doc_id,
           LENGTH(toks) AS n_tokens,
           CAST(LENGTH(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
               / LENGTH(toks) AS stop_r,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_r,
           CAST(list_aggregate(list_transform(toks, t -> LENGTH(t)), 'sum') AS DOUBLE)
               / LENGTH(toks) AS mean_len
    FROM tok
)
SELECT doc_id,
       n_tokens,
       (n_tokens >= 20 AND n_tokens <= 5000
        AND punct_r <= 0.2 AND mean_len >= 2.0 AND mean_len <= 12.0) AS keep,
       CASE WHEN n_tokens < 20 THEN 'too_short'
            WHEN n_tokens > 5000 THEN 'too_long'
            WHEN punct_r > 0.2 THEN 'too_much_punct'
            WHEN mean_len < 2.0 OR mean_len > 12.0 THEN 'odd_token_len'
            ELSE 'ok' END AS reason
FROM scored
"""


@register("text_quality_filter", oracle=_FILTER_SQL)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_r = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double") / n_tokens
    # NULLIF mirrors the oracle's x/0 -> NULL on empty docs (ANSI guard).
    punct_r = F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast(
        "double"
    ) / F.nullif(F.length("text"), F.lit(0))
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens
    )
    scored = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_r.alias("stop_r"),
        punct_r.alias("punct_r"),
        mean_len.alias("mean_len"),
    )
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 5000)
        & (F.col("punct_r") <= 0.2)
        & (F.col("mean_len") >= 2.0)
        & (F.col("mean_len") <= 12.0)
    )
    reason = (
        F.when(F.col("n_tokens") < 20, F.lit("too_short"))
        .when(F.col("n_tokens") > 5000, F.lit("too_long"))
        .when(F.col("punct_r") > 0.2, F.lit("too_much_punct"))
        .when((F.col("mean_len") < 2.0) | (F.col("mean_len") > 12.0), F.lit("odd_token_len"))
        .otherwise(F.lit("ok"))
    )
    return scored.select("doc_id", "n_tokens", keep.alias("keep"), reason.alias("reason"))


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. IDF is the *rational* variant N/df
# (exact integer division in doubles), not ln(N/df): both engines agree
# bit-for-bit on the former, while ln() is not guaranteed correctly
# rounded and may differ in the last ulp. One tokenize+distinct shuffle
# for df, one (doc, token) shuffle for tf — both map-side combined.
# ---------------------------------------------------------------------------

_TFIDF_K = 3

_TFIDF_SQL = r"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
    SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           ROUND(tf.tf * (n.n / df.df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
    ) AS rank FROM scored
)
SELECT doc_id, token, tf, df, tfidf, rank FROM ranked WHERE rank <= {k}
""".replace("{k}", str(_TFIDF_K))


@register("text_tfidf_top_terms", oracle=_TFIDF_SQL)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_row = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_row))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(F.col("tf") * (F.col("n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_K)
        .select("doc_id", "token", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Repetition scores (Gopher-style quality signals): per document, the
# fraction of distinct tokens, the most-frequent token's share, and the
# most-frequent bigram's share. Highly repetitive machine-generated
# text scores low distinct_frac / high top-*-frac and gets filtered
# before training. Shape: two explode→count→max aggregations keyed by
# doc_id — map-side combinable, no corpus-wide shuffle key.
# ---------------------------------------------------------------------------

_REPETITION_SQL = r"""
WITH tok AS (
    SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS toks FROM documents
),
tok_counts AS (
    SELECT doc_id, token, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(toks) AS token FROM tok)
    GROUP BY doc_id, token
),
tok_stats AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           MAX(c) AS top_c
    FROM tok_counts GROUP BY doc_id
),
big_counts AS (
    SELECT doc_id, bigram, COUNT(*) AS c
    FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, LENGTH(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM tok
    )
    GROUP BY doc_id, bigram
),
big_stats AS (
    SELECT doc_id, MAX(c) AS top_b, CAST(SUM(c) AS BIGINT) AS n_bigrams
    FROM big_counts GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_tokens,
       t.n_distinct,
       ROUND(CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 6) AS distinct_frac,
       ROUND(CAST(t.top_c AS DOUBLE) / t.n_tokens, 6) AS top_token_frac,
       ROUND(CAST(COALESCE(b.top_b, 0) AS DOUBLE)
             / GREATEST(COALESCE(b.n_bigrams, 0), 1), 6) AS top_bigram_frac
FROM tok_stats t LEFT JOIN big_stats b USING (doc_id)
"""


@register("text_repetition_scores", oracle=_REPETITION_SQL)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", _tokens().alias("t"))
    tok_counts = (
        base.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    # sequence(1, n) descends when n < 1, so gate on size >= 2 instead
    # of relying on an empty sequence.
    bigrams = F.expr(
        """
        CASE WHEN size(t) >= 2
             THEN transform(sequence(1, size(t) - 1),
                            i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))
             ELSE array() END
        """
    )
    big_counts = (
        base.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big_stats = big_counts.groupBy("doc_id").agg(
        F.max("c").alias("top_b"), F.sum("c").alias("n_bigrams")
    )
    return (
        tok_stats.join(big_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
                "distinct_frac"
            ),
            F.round(F.col("top_c").cast("double") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
            F.round(
                F.coalesce(F.col("top_b"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Blocklist scrubbing: token-exact redaction against a term blocklist
# (the NSFW/credential-scrub step of a corpus pipeline), with a per-doc
# audit count and the content hash of the scrubbed text. Token-level
# CASE inside a higher-order transform — no regex, so the two engines
# cannot diverge on regex dialect; stays in whole-stage codegen.
# ---------------------------------------------------------------------------

_BLOCKLIST = ["key", "hash", "secret"]
_BLOCK_SQL_ARR = "[" + ", ".join(f"'{t}'" for t in _BLOCKLIST) + "]"
_REDACTED = "[X]"

_SCRUB_SQL = rf"""
WITH tok AS (
    SELECT doc_id, lang, string_split_regex(TRIM(text), '\s+') AS toks FROM documents
),
scrubbed AS (
    SELECT doc_id, lang,
           LENGTH(list_filter(toks, t -> list_contains({_BLOCK_SQL_ARR}, t))) AS n_redacted,
           array_to_string(
               list_transform(toks,
                   t -> CASE WHEN list_contains({_BLOCK_SQL_ARR}, t)
                             THEN '{_REDACTED}' ELSE t END),
               ' ') AS red_text
    FROM tok
)
SELECT doc_id, lang, CAST(n_redacted AS BIGINT) AS n_redacted,
       n_redacted = 0 AS clean,
       {sql_hash60('red_text')} AS redacted_hash
FROM scrubbed
"""


@register("text_blocklist_scrub", oracle=_SCRUB_SQL)
def text_blocklist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    block = F.array(*[F.lit(t) for t in _BLOCKLIST])
    toks = _tokens()
    n_red = F.size(F.filter(toks, lambda t: F.array_contains(block, t))).cast("long")
    red_text = F.concat_ws(
        " ",
        F.transform(
            toks,
            lambda t: F.when(F.array_contains(block, t), F.lit(_REDACTED)).otherwise(t),
        ),
    )
    return docs.select(
        "doc_id",
        "lang",
        n_red.alias("n_redacted"),
        (n_red == 0).alias("clean"),
        hash60(red_text).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# Relative quality filter: keep documents whose mean token length beats
# their language's corpus-wide mean — the per-language adaptive cutoff
# used when absolute thresholds don't transfer across languages. The
# language mean goes through the decimal-sum convention (order-free
# exact), and the cutoff table is a bounded per-lang aggregate joined
# back by broadcast — no global window, no second corpus shuffle.
# ---------------------------------------------------------------------------

_MEANFILTER_SQL = r"""
WITH scored AS (
    SELECT doc_id, lang,
           ROUND(
               CAST(list_aggregate(
                   list_transform(string_split_regex(TRIM(text), '\s+'), t -> LENGTH(t)),
                   'sum') AS DOUBLE)
               / LENGTH(string_split_regex(TRIM(text), '\s+')), 6) AS mean_token_len
    FROM documents
),
cutoffs AS (
    SELECT lang,
           ROUND(CAST(SUM(CAST(mean_token_len AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS lang_mean
    FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.mean_token_len, c.lang_mean
FROM scored s JOIN cutoffs c USING (lang)
WHERE s.mean_token_len > c.lang_mean
"""


@register("text_quality_mean_filter", oracle=_MEANFILTER_SQL)
def text_quality_mean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = _tokens()
    token_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    scored = session_cache(
        docs.select(
            "doc_id",
            "lang",
            F.round(token_chars.cast("double") / F.size(toks), 6).alias("mean_token_len"),
        )
    )
    cutoffs = scored.groupBy("lang").agg(
        F.round(
            F.sum(F.col("mean_token_len").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("lang_mean")
    )
    return (
        scored.join(F.broadcast(cutoffs), "lang")
        .filter(F.col("mean_token_len") > F.col("lang_mean"))
        .select("doc_id", "lang", "mean_token_len", "lang_mean")
    )


# ---------------------------------------------------------------------------
# Per-source language concentration (Gini impurity 1 − Σ share²): the
# diversity audit of a crawl mix. Impurity is chosen over entropy
# because it needs no log — shares are single divisions and the share²
# sum runs through DECIMAL(25,12), so the statistic is engine-exact.
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH cells AS (
    SELECT source, lang, COUNT(*) AS n
    FROM documents GROUP BY source, lang
),
tot AS (
    SELECT source, CAST(SUM(n) AS BIGINT) AS n_total
    FROM cells GROUP BY source
),
shares AS (
    SELECT c.source, t.n_total,
           (CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE))
             * (CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE)) AS share_sq
    FROM cells c JOIN tot t USING (source)
)
SELECT source,
       MAX(n_total) AS n_docs,
       COUNT(*) AS n_langs,
       ROUND(1.0 - CAST(SUM(CAST(share_sq AS DECIMAL(25,12))) AS DOUBLE), 6)
           AS lang_gini
FROM shares
GROUP BY source
"""


@register("text_source_lang_gini", oracle=_GINI_SQL)
def text_source_lang_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = load_table(spark, sf_dir, "documents")
    # Cached: the bounded source×lang grid feeds both the per-source
    # total and the share projection — one corpus scan, not two.
    cells = session_cache(
        docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("source").agg(F.sum("n").alias("n_total"))
    share = F.col("n").cast("double") / F.col("n_total").cast("double")
    shares = cells.join(tot, "source").select(
        "source", "n_total", (share * share).alias("share_sq")
    )
    return shares.groupBy("source").agg(
        F.max("n_total").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(
            F.lit(1.0) - F.sum(F.col("share_sq").cast("decimal(25,12)")).cast("double"),
            6,
        ).alias("lang_gini"),
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (the RAG / long-context prep step):
# each document split into 64-token windows with stride 32, emitting
# per-chunk token counts and content hashes. Pure array arithmetic —
# the chunk grid derives from the token count, windows are slices, no
# shuffle at all until a consumer aggregates.
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 32

_CHUNK_SQL = rf"""
WITH tok AS (
    SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS toks FROM documents
),
grid AS (
    SELECT doc_id, toks,
           UNNEST(range((LENGTH(toks) - 1) // {_CHUNK_STRIDE} + 1)) AS ci
    FROM tok
),
chunks AS (
    SELECT doc_id, ci,
           toks[1 + ci * {_CHUNK_STRIDE} : ci * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}]
               AS chunk
    FROM grid
    WHERE 1 + ci * {_CHUNK_STRIDE} <= LENGTH(toks)
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_index,
       LENGTH(chunk) AS chunk_tokens,
       {sql_hash60("array_to_string(chunk, ' ')")} AS chunk_hash
FROM chunks
"""


@register("text_chunk_sliding_windows", oracle=_CHUNK_SQL)
def text_chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", _tokens().alias("toks"))
    n_chunks = F.floor((F.size("toks") - 1) / _CHUNK_STRIDE) + 1
    grid = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
    ).filter(1 + F.col("ci") * _CHUNK_STRIDE <= F.size("toks"))
    chunk = F.slice(
        F.col("toks"), (1 + F.col("ci") * _CHUNK_STRIDE).cast("int"), _CHUNK_TOKENS
    )
    return grid.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_index"),
        F.size(chunk).alias("chunk_tokens"),
        hash60(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Rare-token ratio (the no-log stand-in for a perplexity filter): the
# fraction of each document's tokens whose corpus document-frequency is
# below 10% of the corpus — machine-generated or OCR-garbled text skews
# high. The threshold is RELATIVE (df·10 < n_docs, integer compare) so
# the statistic is scale-invariant; the df table is a bounded
# vocabulary aggregate joined back by broadcast.
# ---------------------------------------------------------------------------

_RARE_SQL = r"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\s+')) AS token
    FROM documents
),
df AS (
    SELECT token, COUNT(DISTINCT doc_id) AS dfreq FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN d.dfreq * 10 < n.n_docs THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare,
       ROUND(CAST(SUM(CASE WHEN d.dfreq * 10 < n.n_docs THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rare_frac
FROM tok t JOIN df d USING (token) CROSS JOIN n
GROUP BY t.doc_id
"""


@register("text_rare_token_ratio", oracle=_RARE_SQL)
def text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = session_cache(
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
    )
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    is_rare = F.when(F.col("dfreq") * 10 < F.col("n_docs"), 1).otherwise(0)
    # `df` is one row per DISTINCT token — vocabulary-sized, which grows
    # with the corpus (Heaps' law), so no forced broadcast hint: the
    # equi-join on token shuffles both sides by the same key and AQE
    # broadcasts only when runtime stats say the vocab side is small.
    return (
        tok.join(df, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(is_rare).alias("n_rare"),
            F.round(F.sum(is_rare).cast("double") / F.count(F.lit(1)), 6).alias(
                "rare_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrub pass every LLM training pipeline runs before
# anything else. The synthetic corpus carries no PII, so both engines
# INJECT deterministic identifiers (email/phone/IPv4 derived from
# doc_id; moduli 3/7/11 are coprime with the source grid so every
# source sees a mixed subset) into the same doc subsets, then redact with the same regexes —
# an honest cross-engine check of the full scrub plumbing: match,
# replace-all, count, and the residual-leak audit. Patterns are written
# in the Java∩RE2 common dialect (classes, bounded quantifiers, \b) so
# Spark and DuckDB agree byte-for-byte. Pure Catalyst regex — map-only,
# no shuffle until the per-source rollup.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_SQL = rf"""
WITH injected AS (
    SELECT source,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 200 + 1 AS VARCHAR)
                   ELSE '' END AS t
    FROM documents
), scrubbed AS (
    SELECT source,
           t,
           LENGTH(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           LENGTH(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           LENGTH(regexp_extract_all(t, '{_IP_RE}')) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g') AS clean
    FROM injected
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
       CAST(SUM(n_ips) AS BIGINT) AS ips_redacted,
       CAST(SUM(LENGTH(t)) AS BIGINT) AS chars_before,
       CAST(SUM(LENGTH(clean)) AS BIGINT) AS chars_after,
       CAST(SUM(CASE WHEN regexp_matches(clean, '{_EMAIL_RE}')
                       OR regexp_matches(clean, '{_PHONE_RE}')
                       OR regexp_matches(clean, '{_IP_RE}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS residual_leaks
FROM scrubbed
GROUP BY source
"""


@register("text_pii_redaction", oracle=_PII_SQL)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic PII, redact it, and audit the result per
    source: redaction counts by kind, byte deltas, and a residual-leak
    scan that must come back zero. At 100 TB this is one codegen'd map
    stage — three regex passes fused over each row — plus a tiny
    per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
                F.lit("."),
                (did % 200 + 1).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    t = F.col("t")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    leak = (
        t.rlike(_EMAIL_RE) | t.rlike(_PHONE_RE) | t.rlike(_IP_RE)
    )
    return (
        docs.select("source", injected.alias("t"))
        .select(
            "source",
            "t",
            F.regexp_count(t, F.lit(_EMAIL_RE)).alias("n_emails"),
            F.regexp_count(t, F.lit(_PHONE_RE)).alias("n_phones"),
            F.regexp_count(t, F.lit(_IP_RE)).alias("n_ips"),
            clean.alias("clean"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").cast("long").alias("emails_redacted"),
            F.sum("n_phones").cast("long").alias("phones_redacted"),
            F.sum("n_ips").cast("long").alias("ips_redacted"),
            F.sum(F.length("t")).cast("long").alias("chars_before"),
            F.sum(F.length("clean")).cast("long").alias("chars_after"),
            F.sum(
                F.when(
                    F.col("clean").rlike(_EMAIL_RE)
                    | F.col("clean").rlike(_PHONE_RE)
                    | F.col("clean").rlike(_IP_RE),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("residual_leaks"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge-step: the first iteration of byte-pair-encoding tokenizer
# training — count adjacent symbol pairs across the corpus vocabulary,
# weighted by word frequency, and emit the top merge candidates. A
# tokenizer-training pipeline runs exactly this aggregation (then
# merges the winner and repeats); at 100 TB the word-count rollup is
# the only corpus-wide shuffle — the pair explosion runs over the
# (much smaller) DISTINCT vocabulary, which is the same two-level
# split BPE trainers use (count words once, iterate on the vocab).
#
# Shape: explode→groupBy(word) [corpus shuffle on word] →
# per-word char-pair explode [narrow, vocab-sized] → groupBy(pair)
# [tiny shuffle] → global top-N with full tie-break.
# ---------------------------------------------------------------------------

_BPE_TOP_N = 50

_BPE_MERGE_SQL = r"""
WITH words AS (
    SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
    FROM documents
),
vocab AS (
    SELECT word, COUNT(*) AS n
    FROM words
    WHERE word <> '' AND LENGTH(word) >= 2
    GROUP BY word
),
pairs AS (
    SELECT substr(word, CAST(i AS INTEGER), 1) AS left_sym,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS right_sym,
           n
    FROM (SELECT word, n, UNNEST(range(1, LENGTH(word))) AS i FROM vocab)
)
SELECT left_sym, right_sym, CAST(SUM(n) AS BIGINT) AS pair_count
FROM pairs
GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 50
"""


@register("text_bpe_merge_step", oracle=_BPE_MERGE_SQL)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter((F.col("word") != "") & (F.length("word") >= 2))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    pairs = vocab.select(
        "word", "n", F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i")
    ).select(
        F.col("word").substr(F.col("i"), F.lit(1)).alias("left_sym"),
        F.col("word").substr(F.col("i") + F.lit(1), F.lit(1)).alias("right_sym"),
        "n",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP_N)
    )


# ---------------------------------------------------------------------------
# BPE merge coverage: the evaluation half of the tokenizer loop — what
# fraction of the corpus's adjacent-pair OCCURRENCES the top-N merge
# candidates cover, per language. Trainers use exactly this to decide
# when more merges stop paying (coverage saturates); per-language
# coverage also exposes scripts the merge table underserves (CJK pairs
# rarely enter a latin-dominated top-N). Shape: the same vocab-bounded
# pair explosion as the merge step, a broadcast semi-join against the
# tiny top-N table, one rollup per language.
# ---------------------------------------------------------------------------

_BPE_COVERAGE_SQL = rf"""
WITH words AS (
    SELECT lang,
           UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS word
    FROM documents
),
vocab AS (
    SELECT lang, word, COUNT(*) AS n
    FROM words
    WHERE word <> '' AND LENGTH(word) >= 2
    GROUP BY lang, word
),
pairs AS (
    SELECT lang,
           substr(word, CAST(i AS INTEGER), 1) AS left_sym,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS right_sym,
           n
    FROM (SELECT lang, word, n, UNNEST(range(1, LENGTH(word))) AS i FROM vocab)
),
top_merges AS (
    SELECT left_sym, right_sym
    FROM (
        SELECT left_sym, right_sym, SUM(n) AS pair_count
        FROM pairs GROUP BY left_sym, right_sym
        ORDER BY pair_count DESC, left_sym, right_sym
        LIMIT {_BPE_TOP_N}
    )
)
SELECT p.lang,
       CAST(SUM(p.n) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN t.left_sym IS NOT NULL THEN p.n ELSE 0 END) AS BIGINT)
           AS n_covered,
       ROUND(CAST(SUM(CASE WHEN t.left_sym IS NOT NULL THEN p.n ELSE 0 END) AS DOUBLE)
             / SUM(p.n), 6) AS coverage
FROM pairs p
LEFT JOIN top_merges t
  ON p.left_sym = t.left_sym AND p.right_sym = t.right_sym
GROUP BY p.lang
"""


@register("text_bpe_merge_coverage", oracle=_BPE_COVERAGE_SQL)
def text_bpe_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter((F.col("word") != "") & (F.length("word") >= 2))
    vocab = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        vocab.select(
            "lang", "word", "n",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        )
        .select(
            "lang",
            "n",
            F.col("word").substr(F.col("i"), F.lit(1)).alias("left_sym"),
            F.col("word").substr(F.col("i") + F.lit(1), F.lit(1)).alias("right_sym"),
        )
    )
    top = (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(_BPE_TOP_N)
        .select("left_sym", "right_sym", F.lit(1).alias("covered"))
    )
    joined = pairs.join(broadcast(top), ["left_sym", "right_sym"], "left")
    return joined.groupBy("lang").agg(
        F.sum("n").alias("n_pairs"),
        F.sum(F.when(F.col("covered").isNotNull(), F.col("n")).otherwise(0)).alias(
            "n_covered"
        ),
        F.round(
            F.sum(F.when(F.col("covered").isNotNull(), F.col("n")).otherwise(0)).cast(
                "double"
            )
            / F.sum("n"),
            6,
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval over the corpus for a fixed query-term set — the IR
# scorer behind quality-filter "looks like a search hit" features and
# eval-set retrieval. House determinism convention (same reason the
# TF-IDF entry uses N/df): ln() is not guaranteed correctly rounded
# across libms, so the IDF keeps Robertson's RATIONAL argument
# (N - df + 0.5)/(df + 0.5) without the log — every factor is exact
# integers (or halves) in doubles and both engines evaluate the
# IDENTICAL correctly-rounded IEEE expression tree, so equality is
# bit-for-bit. Saturation uses the standard k1/b length normalization.
# Shape: one tokenize pass, tf filtered to the 3 query terms (tiny),
# df/avgdl as 1-row broadcast frames — corpus-linear, no shuffle
# beyond the tf groupBy.
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "scan", "join"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_BM25_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
dl AS (
    SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM tok)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM documents
),
tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
    FROM tok
    WHERE token IN ({", ".join(repr(t) for t in _BM25_TERMS)})
    GROUP BY doc_id, token
),
df AS (
    SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
    FROM tok
    WHERE token IN ({", ".join(repr(t) for t in _BM25_TERMS)})
    GROUP BY token
),
scored AS (
    SELECT tf.doc_id,
           ((stats.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * ({_BM25_K1} + 1.0))
              / (tf.tf + {_BM25_K1}
                 * ((1.0 - {_BM25_B}) + {_BM25_B} * (dl.dl / stats.avgdl))))
               AS term_score
    FROM tf
    JOIN df USING (token)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
),
totals AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
           ROUND(SUM(CAST(term_score AS DECIMAL(25,12))), 6) AS bm25
    FROM scored GROUP BY doc_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
    FROM totals
)
SELECT doc_id, n_terms_hit, CAST(bm25 AS DOUBLE) AS bm25, rank
FROM ranked WHERE rank <= {_BM25_TOP}
"""


@register("text_bm25_retrieval", oracle=_BM25_SQL)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    n_toks = toks.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    stats = F.broadcast(
        n_docs.crossJoin(F.broadcast(n_toks)).select(
            "n", (F.col("tot") / F.col("n")).alias("avgdl")
        )
    )
    qt = toks.filter(F.col("token").isin(_BM25_TERMS))
    tf = qt.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = qt.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    term_score = (
        (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    ) * (
        (F.col("tf") * (k1 + F.lit(1.0)))
        / (
            F.col("tf")
            + k1 * ((F.lit(1.0) - b) + b * (F.col("dl") / F.col("avgdl")))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .select("doc_id", term_score.alias("term_score"))
    )
    totals = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum(F.col("term_score").cast("decimal(25,12)")), 6).alias("bm25"),
    )
    # Explicit top-k: orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge of k rows) — the scale-safe form
    # the r5 verdict asked for, replacing an unpartitioned row_number
    # window that relied on Spark's WindowGroupLimit rewrite. The rank
    # column is then a window over the already-limited k-row frame
    # (single tiny partition, trivially cheap).
    top = totals.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_BM25_TOP)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "n_terms_hit", F.col("bm25").cast("double").alias("bm25"), "rank"
    )


# ---------------------------------------------------------------------------
# Unigram log-frequency fluency score (round 6) — the CCNet-style
# perplexity-proxy quality signal: score each document by the average
# corpus log-frequency of its tokens. Fluent text is built from common
# tokens (high mean), gibberish/boilerplate-noise from rare ones (low
# mean, many hapaxes). Transcendental log() is NOT correctly rounded
# across libms (the BM25 lesson), so the "log" here is the INTEGER
# floor(log2(count)) computed as binary-digit count minus one —
# bit-exact in both engines (Spark `bin()`, DuckDB `printf('%b')`).
#
# 100 TB shape: one map-side-combinable shuffle builds the vocabulary
# frequency table; the token->frequency join shuffles on token — the
# build side has ONE row per token, so stopword-skew lands on the
# probe side only (AQE skew-split handles it; no C(s,2) blowup is
# possible on a 1:N join). No broadcast: a web-scale vocabulary does
# not fit an executor.
# ---------------------------------------------------------------------------

_LOGFREQ_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
freq AS (
    SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       {sql_davg("LENGTH(printf('%b', cnt)) - 1", "mean_logfreq")},
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM tok JOIN freq USING (token)
GROUP BY doc_id
"""


@register("text_unigram_logfreq_score", oracle=_LOGFREQ_SQL)
def text_unigram_logfreq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    bucket = F.length(F.expr("bin(cnt)")) - 1
    return (
        toks.join(freq, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            davg(bucket, "mean_logfreq"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
    )


# ---------------------------------------------------------------------------
# Robust per-source length outliers — median/MAD instead of mean/stddev,
# the filter that survives the heavy-tailed length distributions real
# corpora have (a few giant concatenated docs inflate a mean+3σ gate
# until it passes everything; the median absolute deviation does not
# move). Flag: |len − median| > 3 · 1.4826 · MAD (1.4826 scales MAD to
# σ under normality).
#
# Scale notes: median/MAD here are the exact interpolated percentile —
# correct for the bounded source dimension (sources are a curated
# registry, not data-derived); for an unbounded grouping key the
# approx twin is percentile_approx, the same trade the
# events_sampled_quantile_error audit quantifies. The doc scan is a
# skinny 2-column projection, cached once and read by the three
# passes (median → MAD → flag); the per-source stats frames are
# bounded-broadcast back onto it.
# ---------------------------------------------------------------------------

_MAD_K = "4.4478"  # 3 * 1.4826

_MAD_SQL = f"""
WITH lens AS (
    SELECT source, n_chars FROM documents
),
med AS (
    SELECT source, median(n_chars) AS med_chars FROM lens GROUP BY source
),
mad AS (
    SELECT l.source, median(ABS(l.n_chars - m.med_chars)) AS mad_chars
    FROM lens l JOIN med m USING (source) GROUP BY l.source
)
SELECT l.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(m.med_chars, 6) AS med_chars,
       ROUND(d.mad_chars, 6) AS mad_chars,
       CAST(SUM(CASE WHEN ABS(l.n_chars - m.med_chars) > {_MAD_K} * d.mad_chars
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN ABS(l.n_chars - m.med_chars) > {_MAD_K} * d.mad_chars
                      THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
           AS outlier_rate
FROM lens l JOIN med m USING (source) JOIN mad d USING (source)
GROUP BY l.source, m.med_chars, d.mad_chars
"""


@register("text_robust_length_outliers", oracle=_MAD_SQL)
def text_robust_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    lens = session_cache(
        load_table(spark, sf_dir, "documents").select("source", "n_chars")
    )
    # Distributed exact per-source medians (round 9): grouped
    # percentile() buffers each source's whole column in one task —
    # the few-huge-groups twin of the unpartitioned-window class.
    # n_chars (and the absolute deviations, integer ± x.5) are
    # domain-bounded, so the histogram form is exact AND scale-safe.
    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_lowcard,
    )

    med = grouped_quantiles_lowcard(lens, "source", F.col("n_chars"), [0.5]).select(
        "source", F.col("q").alias("med_chars")
    )
    with_med = session_cache(
        lens.join(broadcast(med), "source").withColumn(
            "absdev", F.abs(F.col("n_chars") - F.col("med_chars"))
        )
    )
    mad = grouped_quantiles_lowcard(
        with_med, "source", F.col("absdev"), [0.5]
    ).select("source", F.col("q").alias("mad_chars"))
    flagged = with_med.join(broadcast(mad), "source")
    is_out = F.col("absdev") > F.lit(float(_MAD_K)) * F.col("mad_chars")
    return flagged.groupBy("source", "med_chars", "mad_chars").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.round(
            F.sum(F.when(is_out, 1).otherwise(0)) / F.count(F.lit(1)).cast("double"), 6
        ).alias("outlier_rate"),
    ).select(
        "source",
        "n_docs",
        F.round("med_chars", 6).alias("med_chars"),
        F.round("mad_chars", 6).alias("mad_chars"),
        "n_outliers",
        "outlier_rate",
    )


# ---------------------------------------------------------------------------
# Named-rules quality battery — the Gopher-style document filters
# (Rae et al. 2021, §A1.1) as an auditable rules frame: each published
# rule is a named row with its exact failure count and rate, plus an
# `any_rule` roll-up — the form a pipeline owner reviews before
# enabling a gate corpus-wide (per-doc scores live in
# text_quality_scores; this is the corpus-level rule audit). Bounds
# are adapted to this corpus's scale and mirrored verbatim in the
# oracle. One map stage computes all flags; one aggregate; no joins.
# ---------------------------------------------------------------------------

_GOPHER_WC_LO, _GOPHER_WC_HI = 20, 10000
_GOPHER_MWL_LO, _GOPHER_MWL_HI = 3.0, 10.0
_GOPHER_SYM = "#@*"
_GOPHER_SYM_MAX = 0.1
_GOPHER_STOP_MIN = 2
_GOPHER_ALPHA_MIN = 0.8

_GOPHER_SQL = rf"""
WITH feats AS (
    SELECT doc_id,
           LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_words,
           CAST(list_aggregate(list_transform(string_split_regex(TRIM(text), '\s+'),
                t -> LENGTH(t)), 'sum') AS DOUBLE)
               / LENGTH(string_split_regex(TRIM(text), '\s+')) AS mean_wl,
           CAST(LENGTH(regexp_replace(text, '[^{_GOPHER_SYM}]', '', 'g')) AS DOUBLE)
               / LENGTH(string_split_regex(TRIM(text), '\s+')) AS sym_per_word,
           LENGTH(list_filter({_STOP_SQL},
                s -> list_contains(string_split_regex(TRIM(text), '\s+'), s)))
               AS stop_hits,
           CAST(LENGTH(list_filter(string_split_regex(TRIM(text), '\s+'),
                t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
               / LENGTH(string_split_regex(TRIM(text), '\s+')) AS alpha_ratio
    FROM documents
),
flags AS (
    SELECT doc_id,
           CASE WHEN n_words < {_GOPHER_WC_LO} OR n_words > {_GOPHER_WC_HI}
                THEN 1 ELSE 0 END AS f_word_count,
           CASE WHEN mean_wl < {_GOPHER_MWL_LO} OR mean_wl > {_GOPHER_MWL_HI}
                THEN 1 ELSE 0 END AS f_mean_word_len,
           CASE WHEN sym_per_word > {_GOPHER_SYM_MAX} THEN 1 ELSE 0 END AS f_symbol_ratio,
           CASE WHEN stop_hits < {_GOPHER_STOP_MIN} THEN 1 ELSE 0 END AS f_stopwords,
           CASE WHEN alpha_ratio < {_GOPHER_ALPHA_MIN} THEN 1 ELSE 0 END AS f_alpha_words
    FROM feats
),
agg AS (
    SELECT COUNT(*) AS n_docs,
           SUM(f_word_count) AS c1, SUM(f_mean_word_len) AS c2,
           SUM(f_symbol_ratio) AS c3, SUM(f_stopwords) AS c4,
           SUM(f_alpha_words) AS c5,
           SUM(CASE WHEN f_word_count + f_mean_word_len + f_symbol_ratio
                       + f_stopwords + f_alpha_words > 0 THEN 1 ELSE 0 END) AS c_any
    FROM flags
)
SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
       ROUND(n_fail / CAST(n_docs AS DOUBLE), 6) AS fail_rate
FROM (
    SELECT 'word_count' AS rule, c1 AS n_fail, n_docs FROM agg
    UNION ALL SELECT 'mean_word_len', c2, n_docs FROM agg
    UNION ALL SELECT 'symbol_ratio', c3, n_docs FROM agg
    UNION ALL SELECT 'stopwords', c4, n_docs FROM agg
    UNION ALL SELECT 'alpha_words', c5, n_docs FROM agg
    UNION ALL SELECT 'any_rule', c_any, n_docs FROM agg
)
"""


@register("text_gopher_rules_audit", oracle=_GOPHER_SQL)
def text_gopher_rules_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_words = F.size(toks)
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
            "double"
        )
        / n_words
    )
    sym_per_word = (
        F.length(F.regexp_replace("text", f"[^{_GOPHER_SYM}]", "")).cast("double")
        / n_words
    )
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_hits = F.size(F.filter(stop, lambda s: F.array_contains(toks, s)))
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("double") / n_words
    )
    flags = docs.select(
        F.when((n_words < _GOPHER_WC_LO) | (n_words > _GOPHER_WC_HI), 1)
        .otherwise(0)
        .alias("f1"),
        F.when((mean_wl < _GOPHER_MWL_LO) | (mean_wl > _GOPHER_MWL_HI), 1)
        .otherwise(0)
        .alias("f2"),
        F.when(sym_per_word > _GOPHER_SYM_MAX, 1).otherwise(0).alias("f3"),
        F.when(stop_hits < _GOPHER_STOP_MIN, 1).otherwise(0).alias("f4"),
        F.when(alpha_ratio < _GOPHER_ALPHA_MIN, 1).otherwise(0).alias("f5"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f1").alias("c1"),
        F.sum("f2").alias("c2"),
        F.sum("f3").alias("c3"),
        F.sum("f4").alias("c4"),
        F.sum("f5").alias("c5"),
        F.sum(
            F.when(
                F.col("f1") + F.col("f2") + F.col("f3") + F.col("f4") + F.col("f5") > 0,
                1,
            ).otherwise(0)
        ).alias("c_any"),
    )
    rows = agg.select(
        F.expr(
            "stack(6, 'word_count', c1, 'mean_word_len', c2, 'symbol_ratio', c3, "
            "'stopwords', c4, 'alpha_words', c5, 'any_rule', c_any) AS (rule, n_fail)"
        ),
        "n_docs",
    )
    return rows.select(
        "rule",
        F.col("n_fail").cast("long").alias("n_fail"),
        F.round(F.col("n_fail") / F.col("n_docs").cast("double"), 6).alias("fail_rate"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility per language — the metric that decides how many
# *model* tokens a corpus actually costs: fertility = subword tokens
# per whitespace word (≥1; higher = the tokenizer fragments this
# language more) and chars-per-subword-token (compression proxy).
# Budgeting a multilingual pretraining mix by raw bytes or by words
# misestimates languages with high fertility; this audit is the
# standard correction (cf. SentencePiece/BPE fertility reporting).
# Uses the catalog's _BPE_RE pretokenizer as the subword stand-in.
#
# Scale notes: one map stage (two regex passes per doc, no explode —
# counts come from array lengths) + one shuffle on the bounded lang
# dimension. All sums are exact integers; the two divisions are single
# correctly-rounded IEEE ops, so ROUND(...,6) is cross-engine safe.
# ---------------------------------------------------------------------------

_FERTILITY_SQL = rf"""
WITH tok AS (
    SELECT lang,
           LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_words,
           LENGTH(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe,
           LENGTH(text) AS n_chars
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6) AS chars_per_token
FROM tok GROUP BY lang
"""


@register("text_tokenizer_fertility", oracle=_FERTILITY_SQL)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(_tokens()).cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe").alias("n_bpe_tokens"),
        F.round(F.sum("n_bpe").cast("double") / F.sum("n_words"), 6).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# Collocation extraction by lift — the PMI family (pointwise mutual
# information ranks pairs by log lift; ranking by the LIFT itself is
# order-identical since log is monotone, and avoids ln(), which is not
# correctly rounded across engines): lift(a,b) = P(ab) / (P(a)·P(b))
# = c_ab·U² / (B·c_a·c_b), with a min-support gate — the standard
# phrase/collocation miner a tokenizer-training pipeline runs before
# merging multiword units. All counts are exact integers; the score is
# a fixed-parenthesization chain of correctly-rounded IEEE ops, so
# both engines agree bit-for-bit before the ROUND.
#
# Scale notes (100 TB): two explode+count aggregates (map-side
# combinable), a join of bigrams to the unigram frame on each side
# (vocab-bounded), two 1-row totals frames broadcast, and a global
# top-30 (TakeOrderedAndProject). No all-pairs path: only OBSERVED
# bigrams are scored.
# ---------------------------------------------------------------------------

_LIFT_MIN_SUPPORT = 5
_LIFT_TOP = 30

_LIFT_SQL = r"""
WITH tok AS (
    SELECT string_split_regex(LOWER(TRIM(text)), '\s+') AS toks FROM documents
),
uc AS (
    SELECT w, COUNT(*) AS cw FROM (SELECT UNNEST(toks) AS w FROM tok) GROUP BY w
),
ut AS (SELECT CAST(SUM(cw) AS BIGINT) AS u FROM uc),
bg AS (
    SELECT bigram, COUNT(*) AS cab FROM (
        SELECT UNNEST(list_transform(
            range(1, LENGTH(toks)), i -> toks[i] || ' ' || toks[i+1]
        )) AS bigram FROM tok
    ) GROUP BY bigram
),
bt AS (SELECT CAST(SUM(cab) AS BIGINT) AS btot FROM bg)
SELECT string_split(bigram, ' ')[1] AS w_a,
       string_split(bigram, ' ')[2] AS w_b,
       CAST(cab AS BIGINT) AS n_pair,
       CAST(ca.cw AS BIGINT) AS n_a,
       CAST(cb.cw AS BIGINT) AS n_b,
       ROUND(((CAST(cab AS DOUBLE) * u) * u)
             / ((CAST(btot AS DOUBLE) * ca.cw) * cb.cw), 6) AS lift
FROM bg
JOIN uc ca ON string_split(bigram, ' ')[1] = ca.w
JOIN uc cb ON string_split(bigram, ' ')[2] = cb.w
CROSS JOIN ut CROSS JOIN bt
WHERE cab >= {ms}
ORDER BY lift DESC, w_a ASC, w_b ASC
LIMIT {top}
""".replace("{ms}", str(_LIFT_MIN_SUPPORT)).replace("{top}", str(_LIFT_TOP))


@register("text_bigram_lift", oracle=_LIFT_SQL)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks_df = session_cache(docs.select(toks.alias("toks")))
    uc = toks_df.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cw")
    )
    ut = uc.agg(F.sum("cw").cast("long").alias("u"))
    # Guarded on size >= 2: for a single-token doc the unguarded
    # sequence(1, size-1) would DESCEND ([1, 0] — Spark's sequence
    # defaults to step -1 when start > stop) and element_at(toks, 0)
    # aborts the query, where the oracle's end-exclusive range(1, len)
    # is simply empty. The empty-array branch matches the oracle.
    grams = F.when(
        F.size(F.col("toks")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        toks_df.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    bt = bg.agg(F.sum("cab").cast("long").alias("btot"))
    w_a = F.split(F.col("bigram"), " ").getItem(0)
    w_b = F.split(F.col("bigram"), " ").getItem(1)
    scored = (
        bg.filter(F.col("cab") >= _LIFT_MIN_SUPPORT)
        .withColumn("w_a", w_a)
        .withColumn("w_b", w_b)
        .join(uc.select(F.col("w").alias("w_a"), F.col("cw").alias("ca")), "w_a")
        .join(uc.select(F.col("w").alias("w_b"), F.col("cw").alias("cb")), "w_b")
        .crossJoin(broadcast(ut))
        .crossJoin(broadcast(bt))
        .select(
            "w_a",
            "w_b",
            F.col("cab").cast("long").alias("n_pair"),
            F.col("ca").cast("long").alias("n_a"),
            F.col("cb").cast("long").alias("n_b"),
            F.round(
                ((F.col("cab").cast("double") * F.col("u")) * F.col("u"))
                / ((F.col("btot").cast("double") * F.col("ca")) * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("w_a"), F.asc("w_b")).limit(_LIFT_TOP)


# ---------------------------------------------------------------------------
# Language-ID confusion matrix — the classifier EVAL the corpus's true
# `lang` labels make possible: true × predicted counts with per-true-
# class share (row-normalized recall view). This is the acceptance
# artifact for any lang-ID heuristic before it gates a multilingual
# corpus — which mistakes it makes, and at what rate, per language.
# Composes the per-doc classifier (text_language_id) unchanged; one
# bounded (true, predicted) aggregate + a lang-partition window on the
# ≤|langs|² result.
# ---------------------------------------------------------------------------

_LANGID_CONF_SQL = f"""
WITH preds AS ({_LANGID_SQL})
SELECT lang AS true_lang, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE), 6)
           AS share_of_true
FROM preds
GROUP BY lang, predicted_lang
"""


@register("text_langid_confusion", oracle=_LANGID_CONF_SQL)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    preds = text_language_id(spark, sf_dir).select("lang", "predicted_lang")
    counts = preds.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        F.col("lang").alias("true_lang"),
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6).alias(
            "share_of_true"
        ),
    )


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier — the fasttext-style filtering shape
# (hashing-trick features, linear scorer, threshold gate) used for
# "classifier quality filtering" in web-corpus pipelines, with a
# deterministic weight table both engines derive inline (Knuth
# multiplicative mix of the bucket id) instead of a model file: bucket
# = hash60(token) % D, weight = ((bucket * 2654435761) % 1001) - 500,
# score = mean token weight. Integer sums are exact; the single double
# division happens once per doc. 100 TB: map-only until the per-doc
# aggregate (one shuffle on doc_id) — the classic classifier-filter
# pass is exactly this shape with learned weights broadcast instead.
# ---------------------------------------------------------------------------

_HLQ_BUCKETS = 4096
_HLQ_MIX = 2654435761  # Knuth's 2^32 golden-ratio multiplier

_HLQ_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
feat AS (
    SELECT doc_id,
           (({sql_hash60('token')} % {_HLQ_BUCKETS}) * {_HLQ_MIX}) % 1001 - 500
               AS w
    FROM tok
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS weight_sum,
       ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS score,
       CASE WHEN CAST(SUM(w) AS DOUBLE) / COUNT(*) > 0 THEN true ELSE false END
           AS keep
FROM feat
GROUP BY doc_id
"""


@register("text_hashed_linear_quality_score", oracle=_HLQ_SQL)
def text_hashed_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the token hashing runs pre-shuffle, so it would
    # otherwise be capped at documents' 1-2 scan tasks.
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    w = (hash60("token") % _HLQ_BUCKETS) * _HLQ_MIX % 1001 - 500
    scored = tok.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("w").cast("long").alias("weight_sum"),
    )
    score = F.col("weight_sum").cast("double") / F.col("n_tokens")
    return scored.select(
        "doc_id", "n_tokens", "weight_sum",
        F.round(score, 6).alias("score"),
        (score > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
# MOSS algorithm): k-gram rolling hashes, then the minimum hash of
# every w-length window is a selected fingerprint. Guarantees any
# shared substring of length >= k + w - 1 yields a shared fingerprint,
# at ~2/(w+1) selection density — the standard local document
# fingerprint for near-dup/plagiarism detection. Everything stays in
# codegen: positions via sequence(), k-gram hash via substring+md5,
# window MIN via a bounded ROWS frame, then a per-doc distinct count.
# 100 TB: map + one window partitioned by doc_id + one aggregate —
# the doc_id partitioning is shared across all three stages (one
# shuffle).
# ---------------------------------------------------------------------------

_WINNOW_K = 5  # k-gram width (chars)
_WINNOW_W = 4  # winnowing window (k-grams)

_WINNOW_SQL = f"""
WITH grams AS (
    SELECT doc_id, g.p AS pos,
           {sql_hash60("substr(text, CAST(g.p AS INTEGER), {k})")} AS h
    FROM documents, UNNEST(range(1, LENGTH(text) - {_WINNOW_K} + 2)) AS g(p)
    WHERE LENGTH(text) >= {_WINNOW_K}
),
winmin AS (
    SELECT doc_id, pos, h,
           MIN(h) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW
           ) AS wmin
    FROM grams
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT CASE WHEN pos >= {_WINNOW_W} THEN wmin END) AS BIGINT)
           AS n_fingerprints,
       ROUND(CAST(COUNT(DISTINCT CASE WHEN pos >= {_WINNOW_W} THEN wmin END)
                  AS DOUBLE)
             / COUNT(*), 6) AS density
FROM winmin
GROUP BY doc_id
""".replace("{k}", str(_WINNOW_K))


@register("text_winnowing_fingerprint", oracle=_WINNOW_SQL)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Entirely expression-level (the CDC-chunker idiom): per-doc gram
    # hashes as ONE array column, window minima via slice() inside a
    # transform, distinct count inline — no explode, no window sort.
    # The first cut exploded one row per character and put 50M rows
    # through a doc-partitioned window at the 10x twin (34 s, the
    # suite's worst — a shuffle+sort whose input is recomputable
    # per-row); this form is map-only until nothing (zero shuffles),
    # at the cost of O(w) slice work per gram, w = 4.
    # spread(): documents scans as 1-2 parquet splits — without the
    # repartition the per-gram hashing runs at scan-task parallelism
    # (measured 37 s vs 4.4 s at the 10x twin on local[32]).
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= _WINNOW_K
        )
    )
    m = F.length("text") - _WINNOW_K + 1  # gram count
    hs = F.transform(
        F.sequence(F.lit(1), m),
        lambda p: F.conv(
            F.substring(F.md5(F.col("text").substr(p, F.lit(_WINNOW_K))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    with_hashes = docs.select("doc_id", m.alias("n_grams"), hs.alias("hs"))
    wmins = F.when(
        F.col("n_grams") >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(_WINNOW_W), F.col("n_grams")),
            lambda p: F.array_min(
                F.slice(F.col("hs"), p - (_WINNOW_W - 1), _WINNOW_W)
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    out = with_hashes.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size(F.array_distinct(wmins)).cast("long").alias("n_fingerprints"),
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_fingerprints",
        F.round(
            F.col("n_fingerprints").cast("double") / F.col("n_grams"), 6
        ).alias("density"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth — the corpus-composition audit behind
# "is more data still adding vocabulary?": cumulative distinct types
# vs cumulative tokens at ten document checkpoints (docs ordered by
# doc_id). Computed without re-scanning per checkpoint: each type
# contributes from its FIRST occurrence rank, each doc's token count
# from its own rank, so both cumulatives are one aggregate joined to a
# 10-row checkpoint frame. The doc rank is a two-phase distributed
# rank (operators/ordering.two_phase_order — range shuffle +
# per-partition row_number + broadcast offsets), so no stage holds the
# whole document frame; the token-side work stays fully distributed.
# ---------------------------------------------------------------------------

_HEAPS_CHECKPOINTS = 10

_HEAPS_SQL = rf"""
WITH ranks AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
           COUNT(*) OVER () AS n_docs
    FROM documents
),
tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
tokr AS (
    SELECT t.token, k.r FROM tok t JOIN ranks k USING (doc_id)
),
first_seen AS (
    SELECT token, MIN(r) AS first_r FROM tokr GROUP BY token
),
doc_tokens AS (
    SELECT r, COUNT(*) AS n_tok FROM tokr GROUP BY r
),
cps AS (
    SELECT g.d, (SELECT MAX(n_docs) FROM ranks) * g.d // {_HEAPS_CHECKPOINTS} AS cp
    FROM (SELECT UNNEST(range(1, {_HEAPS_CHECKPOINTS} + 1)) AS d) g
)
SELECT CAST(c.d AS BIGINT) AS checkpoint,
       CAST(c.cp AS BIGINT) AS n_docs,
       CAST((SELECT SUM(n_tok) FROM doc_tokens WHERE r <= c.cp) AS BIGINT)
           AS n_tokens_cum,
       CAST((SELECT COUNT(*) FROM first_seen WHERE first_r <= c.cp) AS BIGINT)
           AS n_types_cum,
       ROUND(CAST((SELECT COUNT(*) FROM first_seen WHERE first_r <= c.cp) AS DOUBLE)
             / (SELECT SUM(n_tok) FROM doc_tokens WHERE r <= c.cp), 6)
           AS type_token_ratio
FROM cps c
ORDER BY checkpoint
"""


@register("corpus_heaps_vocab_growth", oracle=_HEAPS_SQL)
def corpus_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    docs = load_table(spark, sf_dir, "documents")
    # Two-phase distributed rank over the per-document frame (round-9:
    # replaces a single-task global row_number window); no broadcast
    # hint on the join back — the rank frame is doc-proportional, so
    # AQE picks broadcast at small scale and a shuffle join at 100 TB.
    ranks = two_phase_order(
        docs.select("doc_id"), [F.asc("doc_id")], F.col("doc_id"), rank_col="r"
    )
    n_docs = docs.count()  # one scalar action; mirrors the oracle's MAX(n_docs)
    tokr = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .join(ranks, "doc_id")
    )
    first_seen = tokr.groupBy("token").agg(F.min("r").alias("first_r"))
    doc_tokens = tokr.groupBy("r").agg(F.count(F.lit(1)).alias("n_tok"))
    cps = spark.range(1, _HEAPS_CHECKPOINTS + 1).select(
        F.col("id").alias("d"),
        (F.lit(n_docs) * F.col("id") / _HEAPS_CHECKPOINTS)
        .cast("long")
        .alias("cp"),
    )
    types_cum = (
        first_seen.crossJoin(broadcast(cps))
        .filter(F.col("first_r") <= F.col("cp"))
        .groupBy("d", "cp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types_cum"))
    )
    tokens_cum = (
        doc_tokens.crossJoin(broadcast(cps))
        .filter(F.col("r") <= F.col("cp"))
        .groupBy("d", "cp")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens_cum"))
    )
    # LEFT-join both cumulatives onto the checkpoint frame so empty-
    # prefix checkpoints (cp=0 on corpora with <10 docs) still emit a
    # row, matching the oracle's scalar-subquery semantics: COUNT over
    # an empty set is 0, SUM is NULL (round-8 ADVICE fix).
    return (
        cps.join(types_cum, ["d", "cp"], "left")
        .join(tokens_cum, ["d", "cp"], "left")
        .select(
            F.col("d").cast("long").alias("checkpoint"),
            F.col("cp").cast("long").alias("n_docs"),
            "n_tokens_cum",
            F.coalesce(F.col("n_types_cum"), F.lit(0).cast("long")).alias(
                "n_types_cum"
            ),
            F.round(
                F.coalesce(F.col("n_types_cum"), F.lit(0)).cast("double")
                / F.col("n_tokens_cum"),
                6,
            ).alias("type_token_ratio"),
        )
        .orderBy("checkpoint")
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency audit — the distributional sanity check on a
# corpus's token frequencies (a synthetic or template-heavy corpus
# shows a broken rank-frequency curve): types ranked by count, rolled
# into floor(log2 rank) buckets with exact integer stats. floor-log2
# via the bit-length trick (LENGTH(bin(r)) - 1 ≡ r.bit_length() - 1),
# the same engine-portable form as text_unigram_logfreq_score — ln()
# remains banned (not correctly rounded across engines). Vocabulary is
# corpus-sublinear, so the global rank window is over the TYPE frame,
# not the corpus.
# ---------------------------------------------------------------------------

_ZIPF_SQL = rf"""
WITH tok AS (
    SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
counts AS (
    SELECT token, COUNT(*) AS c FROM tok GROUP BY token
),
ranked AS (
    SELECT token, c,
           ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rnk
    FROM counts
)
SELECT CAST(LENGTH(bin(rnk)) - 1 AS BIGINT) AS log2_rank_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(MAX(c) AS BIGINT) AS c_max,
       CAST(MIN(c) AS BIGINT) AS c_min,
       CAST(SUM(c) AS BIGINT) AS total_count,
       ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS mean_count
FROM ranked
GROUP BY 1
ORDER BY 1
"""


@register("text_zipf_rank_frequency", oracle=_ZIPF_SQL)
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.operators.ordering import (
        string_order_key,
        two_phase_order,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Two-phase distributed rank (round-9): the round-6 unigram scorer
    # in this file refuses to broadcast the vocabulary because
    # web-scale vocabularies don't fit one executor — the same frame
    # must not be sorted in one task either. Bit-identical to the old
    # global row_number window (unique tie-break on token). Cached:
    # the helper evaluates its input for boundaries/totals/ranks.
    from deathmetal_datalake_spark.plans.registry import session_cache

    counts = session_cache(counts)
    # sub_key: token counts are EXTREMELY tie-heavy (the count=1 long
    # tail is ~half the vocabulary), so heavy tie groups sub-bucket by
    # a monotone numeric prefix of the token tie-break.
    ranked = two_phase_order(
        counts, [F.desc("c"), F.asc("token")], F.col("c"),
        key_desc=True, rank_col="rnk",
        sub_key=string_order_key(F.col("token")),
    )
    bucket = (F.length(F.bin(F.col("rnk"))) - 1).cast("long")
    return (
        ranked.groupBy(bucket.alias("log2_rank_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.max("c").cast("long").alias("c_max"),
            F.min("c").cast("long").alias("c_min"),
            F.sum("c").cast("long").alias("total_count"),
            F.round(F.sum("c").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_count"
            ),
        )
        .orderBy("log2_rank_bucket")
    )


# ---------------------------------------------------------------------------
# Readability scoring (Flesch reading ease) — the corpus-filtering
# signal next to the Gopher rules: words per sentence and vowel-group
# "syllables" per word, combined with the standard constants. Counts
# are pure split/filter expressions (sentence segments on [.!?]+,
# vowel groups via split on [aeiouy]+ — both engines keep trailing
# empty segments, so size−1 is the group count); the formula is only
# *, /, − on identical integer inputs with identical parenthesization,
# so the rounded double agrees bit-for-bit (no transcendental — the
# standard constants are literals). One scan, no shuffle before the
# per-doc projection.
# ---------------------------------------------------------------------------

_READABILITY_SQL = r"""
WITH counted AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                x -> LENGTH(TRIM(x)) > 0)) AS BIGINT) AS n_sentences,
           CAST(len(list_filter(string_split_regex(LOWER(TRIM(text)), '\s+'),
                                x -> x <> '')) AS BIGINT) AS n_words,
           CAST(len(string_split_regex(LOWER(text), '[aeiouy]+')) - 1 AS BIGINT)
               AS n_syllables
    FROM documents
)
SELECT doc_id, n_sentences, n_words, n_syllables,
       ROUND(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / NULLIF(n_sentences, 0))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / NULLIF(n_words, 0)),
             4) AS flesch_score
FROM counted
ORDER BY doc_id
"""


@register("text_readability_scores", oracle=_READABILITY_SQL)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_sentences = F.size(
        F.filter(
            F.split(F.col("text"), r"[.!?]+"),
            lambda x: F.length(F.trim(x)) > 0,
        )
    ).cast("long")
    n_words = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != ""
        )
    ).cast("long")
    n_syllables = (
        F.size(F.split(F.lower(F.col("text")), r"[aeiouy]+")) - 1
    ).cast("long")
    counted = docs.select(
        "doc_id",
        n_sentences.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syllables.alias("n_syllables"),
    )
    return counted.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (
                F.col("n_words").cast("double")
                / F.nullif(F.col("n_sentences"), F.lit(0))
            )
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0))
            ),
            4,
        ).alias("flesch_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Boilerplate-line detection — the pre-dedup pass that finds sentences
# repeated across many documents (navigation chrome, disclaimers,
# template text) so they can be stripped before near-dup scoring:
# sentence-split, normalize, count distinct docs per sentence, report
# the top shared sentences. Scale: the group key is the normalized
# sentence (hash-partitioned aggregate, map-side combinable); output
# is a bounded top-K with a total-order tie-break.
# ---------------------------------------------------------------------------

_BOILERPLATE_MIN_CHARS = 15
_BOILERPLATE_MIN_DOCS = 3
_BOILERPLATE_TOP = 20

_BOILERPLATE_SQL = f"""
WITH sent AS (
    SELECT doc_id, LOWER(TRIM(s)) AS sentence
    FROM documents, UNNEST(string_split_regex(text, '[.!?]+')) AS g(s)
    WHERE LENGTH(TRIM(s)) >= {_BOILERPLATE_MIN_CHARS}
),
counts AS (
    SELECT sentence,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM sent GROUP BY sentence
)
SELECT sentence, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM counts
WHERE n_docs >= {_BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, sentence ASC
LIMIT {_BOILERPLATE_TOP}
"""


@register("text_boilerplate_lines", oracle=_BOILERPLATE_SQL)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    sent = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s")
        )
        .filter(F.length(F.trim(F.col("s"))) >= _BOILERPLATE_MIN_CHARS)
        .select("doc_id", F.lower(F.trim(F.col("s"))).alias("sentence"))
    )
    counts = sent.groupBy("sentence").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )
    return (
        counts.filter(F.col("n_docs") >= _BOILERPLATE_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.asc("sentence"))
        .limit(_BOILERPLATE_TOP)
    )


# ---------------------------------------------------------------------------
# Vocabulary mass-coverage curve (round 9) — the tokenizer-budget
# question Zipf buckets don't answer directly: what fraction of the
# corpus's TOKEN MASS do the top-k most frequent types cover, for
# doubling k? (The curve that decides vocab size for a BPE budget and
# flags template-heavy corpora whose top-64 covers 90%.) Rank and
# running mass come from the distributed two-phase ordering — the same
# machinery as the Zipf audit, but reporting cumulative coverage at
# literal k checkpoints instead of per-bucket stats. k beyond the
# vocabulary covers everything (LEFT join + coalesce to the total).
# ---------------------------------------------------------------------------

_COVERAGE_KS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]

_VOCAB_COVERAGE_SQL = rf"""
WITH tok AS (
    SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
ranked AS (
    SELECT c,
           ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rnk,
           SUM(c) OVER (ORDER BY c DESC, token ASC ROWS UNBOUNDED PRECEDING)
               AS cum_c
    FROM counts
),
tot AS (SELECT SUM(c) AS total, COUNT(*) AS n_types FROM counts),
ks AS (SELECT UNNEST({_COVERAGE_KS}) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(LEAST(ks.k, (SELECT n_types FROM tot)) AS BIGINT) AS covered_types,
       CAST(COALESCE(r.cum_c, (SELECT total FROM tot)) AS BIGINT)
           AS covered_tokens,
       ROUND(CAST(COALESCE(r.cum_c, (SELECT total FROM tot)) AS DOUBLE)
             / (SELECT total FROM tot), 6) AS coverage_ratio
FROM ks LEFT JOIN ranked r ON r.rnk = ks.k
ORDER BY k
"""


@register("text_vocab_mass_coverage", oracle=_VOCAB_COVERAGE_SQL)
def text_vocab_mass_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import (
        string_order_key,
        two_phase_order,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = session_cache(
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # sub_key: same tie-heavy count key as text_zipf_rank_frequency.
    ranked = two_phase_order(
        counts,
        [F.desc("c"), F.asc("token")],
        F.col("c"),
        key_desc=True,
        rank_col="rnk",
        cumsum=("c", "cum_c"),
        sub_key=string_order_key(F.col("token")),
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ks = spark.createDataFrame([(k,) for k in _COVERAGE_KS], "k long")
    return (
        ks.join(ranked.select("rnk", "cum_c"), ks["k"] == F.col("rnk"), "left")
        .crossJoin(broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            F.least(F.col("k"), F.col("n_types")).cast("long").alias(
                "covered_types"
            ),
            F.coalesce(F.col("cum_c"), F.col("total"))
            .cast("long")
            .alias("covered_tokens"),
            F.round(
                F.coalesce(F.col("cum_c"), F.col("total")).cast("double")
                / F.col("total"),
                6,
            ).alias("coverage_ratio"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Code-vs-prose detection (round 9) — the filtering signal a training
# mix needs before routing documents to code vs natural-language
# pipelines: per doc, symbol density (brackets/operators per char),
# indented-line ratio, and semicolon-terminated-line ratio, folded into
# a deterministic rule. Pure char-class counts via regexp_replace
# length deltas (identical semantics in both engines — no \d/\w
# class-shorthand differences), one scan, no shuffle before the
# bounded per-source rollup.
# ---------------------------------------------------------------------------

_CODE_CHARS = r"[{}\[\]();<>=+*/&|#]"

_CODE_DETECT_SQL = rf"""
WITH feats AS (
    SELECT source,
           doc_id,
           LENGTH(text) AS n_chars,
           LENGTH(text) - LENGTH(regexp_replace(text, '{_CODE_CHARS}', '', 'g'))
               AS n_sym,
           len(list_filter(string_split(text, chr(10)),
                           x -> x LIKE '    %' OR x LIKE chr(9) || '%'))
               AS n_indented,
           len(list_filter(string_split(text, chr(10)),
                           x -> LENGTH(TRIM(x)) > 0)) AS n_lines
    FROM documents
),
scored AS (
    SELECT source, doc_id,
           ROUND(CAST(n_sym AS DOUBLE) / NULLIF(n_chars, 0), 6) AS sym_density,
           ROUND(CAST(n_indented AS DOUBLE) / NULLIF(n_lines, 0), 6)
               AS indent_ratio,
           (CAST(n_sym AS DOUBLE) / NULLIF(n_chars, 0)) > 0.03
             AND n_lines > 0 AS looks_code
    FROM feats
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN looks_code THEN 1 ELSE 0 END) AS BIGINT)
           AS n_code_docs,
       ROUND(SUM(CASE WHEN looks_code THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS code_rate,
       {sql_davg("sym_density", "avg_sym_density")},
       {sql_davg("indent_ratio", "avg_indent_ratio")}
FROM scored
GROUP BY source
ORDER BY source
"""


@register("text_code_detection", oracle=_CODE_DETECT_SQL)
def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import davg

    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_sym = n_chars - F.length(F.regexp_replace("text", _CODE_CHARS, ""))
    lines = F.split(F.col("text"), "\n")
    n_indented = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("    ") | x.startswith("\t"),
        )
    )
    n_lines = F.size(F.filter(lines, lambda x: F.length(F.trim(x)) > 0))
    sym_density = F.round(
        n_sym.cast("double") / F.nullif(n_chars, F.lit(0)), 6
    )
    indent_ratio = F.round(
        n_indented.cast("double") / F.nullif(n_lines, F.lit(0)), 6
    )
    looks_code = (
        (n_sym.cast("double") / F.nullif(n_chars, F.lit(0)) > 0.03)
        & (n_lines > 0)
    )
    scored = docs.select(
        "source",
        sym_density.alias("sym_density"),
        indent_ratio.alias("indent_ratio"),
        looks_code.alias("looks_code"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("looks_code"), 1).otherwise(0))
            .cast("long")
            .alias("n_code_docs"),
            F.round(
                F.sum(F.when(F.col("looks_code"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("code_rate"),
            davg("sym_density", "avg_sym_density"),
            davg("indent_ratio", "avg_indent_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Bigram-LM surprisal scoring (round-9 continuation) — the KenLM-style
# quality filter every pretraining pipeline runs: score each document
# by how surprising its word sequences are under a language model
# trained on the corpus itself (here an add-one-smoothed bigram model).
# Gibberish and boilerplate-free natural text separate cleanly; highly
# repetitive spam scores near zero. Per the BM25/logfreq lesson,
# NO transcendentals cross the engine boundary: the per-bigram
# surprisal is the INTEGER floor(log2(1/P)) computed bit-exactly via
# floor(log2(den/num)) = bit_length(den div num) − 1 (valid whenever
# den >= num, which add-one smoothing guarantees: num = c12+1 <=
# c1+V = den). 100 TB shape: two map-side-combinable count shuffles
# (unigrams, bigrams), one 1:N probe-side join per table — the build
# sides have one row per (bi)gram type, so stopword skew lands on the
# probe side where AQE skew-split handles it; no broadcast of the
# vocabulary (web-scale vocabularies don't fit an executor).
# ---------------------------------------------------------------------------

_BIGRAM_SURPRISAL_SQL = rf"""
WITH tok AS (
    SELECT doc_id, lang,
           string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
    FROM documents
),
uni AS (SELECT UNNEST(toks) AS w1 FROM tok),
c1 AS (SELECT w1, COUNT(*) AS cw FROM uni GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w1) AS vsz FROM uni),
bg AS (
    SELECT t.doc_id, t.lang, t.toks[g.i] AS w1, t.toks[g.i + 1] AS w2
    FROM tok t, UNNEST(range(1, len(t.toks))) AS g(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
bits AS (
    SELECT b.doc_id, b.lang,
           LENGTH(printf('%b', (c1.cw + v.vsz) // (cb.c12 + 1))) - 1 AS s
    FROM bg b JOIN cb USING (w1, w2) JOIN c1 USING (w1), v
),
perdoc AS (
    SELECT doc_id, lang, COUNT(*) AS n_bigrams,
           {sql_davg("s", "mean_bits")}
    FROM bits GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       {sql_davg("mean_bits", "mean_surprisal_bits")}
FROM perdoc
GROUP BY lang
ORDER BY lang
"""


@register("text_bigram_surprisal_score", oracle=_BIGRAM_SURPRISAL_SQL)
def text_bigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    uni = docs.select(F.explode("toks").alias("w1"))
    c1 = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    vocab = uni.agg(F.countDistinct("w1").alias("vsz"))
    # Adjacent pairs without a self-join: slice off the last token and
    # pair each remaining token with its successor by index.
    bg = session_cache(
        docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("p"),
        ).select("doc_id", "lang", "p.w1", "p.w2")
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bits = (
        bg.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            (F.col("c12") + F.lit(1)).cast("long").alias("num"),
            (F.col("cw") + F.col("vsz")).cast("long").alias("den"),
        )
        # floor(log2(den/num)) == bit_length(den div num) - 1 for
        # den >= num — integer-exact in both engines, no libm.
        .select(
            "doc_id",
            "lang",
            (F.length(F.bin(F.expr("den div num"))) - 1).cast("long").alias("s"),
        )
    )
    perdoc = bits.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"), davg("s", "mean_bits")
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_scored"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            davg("mean_bits", "mean_surprisal_bits"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# RAKE keyphrase extraction (round-9 continuation) — the classic
# unsupervised keyword extractor (Rose et al. 2010): candidate phrases
# are maximal runs between stopwords/punctuation; each word scores
# degree/frequency (degree = summed length of phrases it appears in —
# rewarding words that travel in long collocations), and a phrase
# scores the sum of its words. Corpus-level top-20 keyphrases.
# Cross-engine determinism: the stopword split uses zero-width \b
# boundaries (consecutive stopwords both match — a \s-delimited regex
# would consume the separator and miss every other one), word scores
# are exact integer ratios rounded through DECIMAL(18,6) before the
# associative phrase sum, and the top-20 tie-breaks on the phrase
# text. 100 TB shape: two map-side-combinable aggregates (word stats,
# phrase counts) + one 1:N word-stats probe join; the only global sort
# is the top-20 TakeOrdered.
# ---------------------------------------------------------------------------

_RAKE_STOP_RE = r"\b(the|a|and|of|to|in)\b"
_RAKE_SPLIT_RE = r"[|.,;:!?]+"

_RAKE_SQL = rf"""
WITH phr AS (
    SELECT TRIM(p) AS phrase_raw
    FROM documents,
         UNNEST(string_split_regex(
             regexp_replace(LOWER(TRIM(text)), '{_RAKE_STOP_RE}', '|', 'g'),
             '{_RAKE_SPLIT_RE}')) AS t(p)
    WHERE TRIM(p) <> ''
),
occ AS (
    SELECT list_filter(string_split_regex(phrase_raw, '\s+'),
                       w -> w <> '') AS words
    FROM phr
),
occ_k AS (
    SELECT array_to_string(words, ' ') AS phrase, words, len(words) AS plen
    FROM occ WHERE len(words) > 0
),
wstat AS (
    SELECT w, COUNT(*) AS freq, SUM(plen) AS deg
    FROM occ_k, UNNEST(words) AS u(w)
    GROUP BY w
),
pcount AS (
    SELECT phrase, COUNT(*) AS n_occurrences FROM occ_k GROUP BY phrase
),
pwords AS (
    SELECT DISTINCT phrase, w
    FROM (SELECT phrase, UNNEST(words) AS w FROM occ_k) z
),
pscore AS (
    SELECT p.phrase,
           CAST(CAST(SUM(CAST(s.deg * 1.0 / s.freq AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE) AS score
    FROM pwords p JOIN wstat s ON p.w = s.w
    GROUP BY p.phrase
)
SELECT c.phrase,
       CAST(c.n_occurrences AS BIGINT) AS n_occurrences,
       ROUND(s.score, 6) AS rake_score
FROM pcount c JOIN pscore s USING (phrase)
ORDER BY rake_score DESC, phrase ASC
LIMIT 20
"""


@register("text_keyphrase_rake", oracle=_RAKE_SQL)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    phr = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(
                    F.lower(F.trim(F.col("text"))), _RAKE_STOP_RE, "|"
                ),
                _RAKE_SPLIT_RE,
            )
        ).alias("p")
    ).select(F.trim(F.col("p")).alias("phrase_raw")).filter(
        F.col("phrase_raw") != ""
    )
    occ = session_cache(
        phr.select(
            F.filter(
                F.split(F.col("phrase_raw"), r"\s+"), lambda w: w != ""
            ).alias("words")
        )
        .filter(F.size("words") > 0)
        .select(
            F.array_join("words", " ").alias("phrase"),
            "words",
            F.size("words").cast("long").alias("plen"),
        )
    )
    wstat = (
        occ.select(F.explode("words").alias("w"), "plen")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg"))
    )
    pcount = occ.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pwords = (
        occ.select("phrase", F.explode("words").alias("w")).distinct()
    )
    pscore = (
        pwords.join(wstat, "w")
        .groupBy("phrase")
        .agg(
            F.sum(
                (F.col("deg") * F.lit(1.0) / F.col("freq")).cast("decimal(18,6)")
            )
            .cast("string")
            .cast("double")
            .alias("score")
        )
    )
    return (
        pcount.join(pscore, "phrase")
        .select(
            "phrase", "n_occurrences", F.round("score", 6).alias("rake_score")
        )
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# MATTR lexical diversity (round-9 continuation) — the moving-average
# type-token ratio (Covington & McFall 2010): plain TTR collapses as
# documents grow (types saturate, tokens don't), so the robust form
# averages the TTR of fixed 50-token windows stepped by 25. Low MATTR
# flags the repetitive/templated text a quality filter should
# down-weight even when plain token stats look fine. Every window's
# TTR is an exact integer ratio (one IEEE divide) averaged through
# the davg decimal; windows are generated per document with
# sequence/explode — fan-out ≈ tokens/25, linear, no shuffle until the
# per-language rollup.
# ---------------------------------------------------------------------------

_MATTR_W = 50
_MATTR_STEP = 25

_MATTR_SQL = rf"""
WITH tok AS (
    SELECT doc_id, lang,
           string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
    FROM documents
),
wins AS (
    SELECT t.doc_id, t.lang,
           list_slice(t.toks, g.s,
                      LEAST(g.s + {_MATTR_W} - 1, len(t.toks))) AS win
    FROM tok t,
         UNNEST(range(1, GREATEST(len(t.toks) - {_MATTR_W} + 1, 1) + 1,
                      {_MATTR_STEP})) AS g(s)
),
ttr AS (
    SELECT doc_id, lang,
           len(list_distinct(win)) * 1.0 / len(win) AS r
    FROM wins WHERE len(win) > 0
),
perdoc AS (
    SELECT doc_id, lang, COUNT(*) AS n_windows, {sql_davg("r", "mattr")}
    FROM ttr GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_windows) AS BIGINT) AS n_windows,
       {sql_davg("mattr", "mean_mattr")}
FROM perdoc
GROUP BY lang
ORDER BY lang
"""


@register("text_mattr_lexical_diversity", oracle=_MATTR_SQL)
def text_mattr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    wins = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("toks") - F.lit(_MATTR_W - 1), F.lit(1)),
                F.lit(_MATTR_STEP),
            )
        ).alias("s"),
        "toks",
    ).select(
        "doc_id",
        "lang",
        F.slice(F.col("toks"), F.col("s"), F.lit(_MATTR_W)).alias("win"),
    )
    ttr = wins.filter(F.size("win") > 0).select(
        "doc_id",
        "lang",
        (
            F.size(F.array_distinct("win")) * F.lit(1.0) / F.size("win")
        ).alias("r"),
    )
    perdoc = ttr.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_windows"), davg("r", "mattr")
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_windows").cast("long").alias("n_windows"),
            davg("mattr", "mean_mattr"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Interpolated-LM surprisal (round-9 continuation) — Jelinek-Mercer
# smoothing, the step up from add-one: P = λ·P_bigram + (1−λ)·P_unigram
# with λ = 1/2, so rare bigrams back off to unigram evidence instead
# of the flat 1/V floor. The whole mixture stays RATIONAL: with
# P_bi = n1/d1 and P_uni = n2/d2, P = (n1·d2 + n2·d1)/(2·d1·d2) —
# integer numerator and denominator (longs: d1 ≤ |vocab-mass|,
# d2 = corpus tokens; the product stays under 2^63 at any plausible
# corpus because bits, not the raw ratio, is the score) — and the
# integer surprisal floor(log2(den/num)) = bit_length(den div num) − 1
# crosses the engines with zero libm exposure, exactly like
# text_bigram_surprisal_score. Per-language rollup of per-doc means.
# ---------------------------------------------------------------------------

_JM_SQL = rf"""
WITH tok AS (
    SELECT doc_id, lang,
           string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
    FROM documents
),
uni AS (SELECT UNNEST(toks) AS w FROM tok),
c1 AS (SELECT w, COUNT(*) AS cw FROM uni GROUP BY 1),
tot AS (SELECT COUNT(*) AS nt FROM uni),
bg AS (
    SELECT t.doc_id, t.lang, t.toks[g.i] AS w1, t.toks[g.i + 1] AS w2
    FROM tok t, UNNEST(range(1, len(t.toks))) AS g(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
sc AS (
    SELECT b.doc_id, b.lang,
           -- P = (n1*d2 + n2*d1) / (2*d1*d2); bigram n1/d1 uses the
           -- raw counts (0 allowed: unigram floor carries it),
           -- unigram n2/d2 = c(w2)/N. 128-bit accumulation (ADVICE
           -- r9): c12*nt can exceed 2^63 at corpus scale — HUGEINT
           -- here, DECIMAL(38,0) on the Spark side, both exact; the
           -- QUOTIENT den/num is bounded by 2*cw1, so only the
           -- products need width.
           CAST(cb.c12 AS HUGEINT) * CAST(tot.nt AS HUGEINT)
               + CAST(cu.cw AS HUGEINT) * CAST(c1.cw AS HUGEINT) AS num,
           2 * CAST(c1.cw AS HUGEINT) * CAST(tot.nt AS HUGEINT) AS den
    FROM bg b
    JOIN cb USING (w1, w2)
    JOIN c1 ON c1.w = b.w1
    JOIN c1 cu ON cu.w = b.w2, tot
),
bits AS (
    SELECT doc_id, lang,
           LENGTH(printf('%b', CAST(den // num AS BIGINT))) - 1 AS s
    FROM sc WHERE num > 0
),
perdoc AS (
    SELECT doc_id, lang, COUNT(*) AS n_bigrams, {sql_davg("s", "mean_bits")}
    FROM bits GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       {sql_davg("mean_bits", "mean_jm_bits")}
FROM perdoc
GROUP BY lang
ORDER BY lang
"""


@register("text_interpolated_lm_surprisal", oracle=_JM_SQL)
def text_interpolated_lm_surprisal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    uni = docs.select(F.explode("toks").alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = uni.agg(F.count(F.lit(1)).alias("nt"))
    bg = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.w1", "p.w2")
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1a = c1.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    c1b = c1.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    sc = (
        bg.join(cb, ["w1", "w2"])
        .join(c1a, "w1")
        .join(c1b, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            # decimal(19,0) inputs -> decimal(38,0) products: exact up
            # to ~8.5e37, covering c12*nt at any corpus size whose
            # counts fit BIGINT (the raw long product wrapped silently
            # on Spark and errored on DuckDB — ADVICE r9). The div
            # below is Spark's exact decimal integral divide; the
            # quotient is bounded by 2*cw1, far inside BIGINT.
            (
                F.col("c12").cast("decimal(19,0)") * F.col("nt").cast("decimal(19,0)")
                + F.col("cw2").cast("decimal(19,0)")
                * F.col("cw1").cast("decimal(19,0)")
            ).alias("num"),
            (
                F.lit(2).cast("decimal(19,0)")
                * F.col("cw1").cast("decimal(19,0)")
                * F.col("nt").cast("decimal(19,0)")
            ).alias("den"),
        )
    )
    bits = sc.filter(F.col("num") > 0).select(
        "doc_id",
        "lang",
        (F.length(F.bin(F.expr("CAST(den div num AS BIGINT)"))) - 1)
        .cast("long")
        .alias("s"),
    )
    perdoc = bits.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"), davg("s", "mean_bits")
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_scored"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            davg("mean_bits", "mean_jm_bits"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Rocchio pseudo-relevance feedback (round 10) — the classic IR query
# expansion loop: retrieve a feedback set for the seed terms, mine the
# set's strongest NEW terms, re-issue the widened query, and report the
# recall gain. Everything is integer-exact: the feedback set is the
# top-N docs by total seed-term frequency (tie-break doc_id), the
# expansion terms are the top-M non-seed terms by frequency WITHIN the
# feedback set (tie-break term), and the before/after match counts are
# distinct-doc counts. Scale: term mining is a hash aggregate over the
# N-doc feedback set (bounded), the final match counts are semi-join
# shapes on an isin() filter — no all-pairs anywhere.
# ---------------------------------------------------------------------------

_ROCCHIO_SEEDS = ["table", "scan", "join"]
_ROCCHIO_FEEDBACK_N = 10
_ROCCHIO_EXPAND_M = 5

_ROCCHIO_IN = ", ".join(f"'{t}'" for t in _ROCCHIO_SEEDS)

_ROCCHIO_SQL = f"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS token
    FROM documents
),
fb AS (
    SELECT doc_id FROM tok WHERE token IN ({_ROCCHIO_IN})
    GROUP BY doc_id
    ORDER BY COUNT(*) DESC, doc_id ASC
    LIMIT {_ROCCHIO_FEEDBACK_N}
),
mined AS (
    SELECT token FROM tok JOIN fb USING (doc_id)
    WHERE token NOT IN ({_ROCCHIO_IN}) AND LENGTH(token) >= 3
    GROUP BY token
    ORDER BY COUNT(*) DESC, token ASC
    LIMIT {_ROCCHIO_EXPAND_M}
),
before AS (
    SELECT COUNT(DISTINCT doc_id) AS n FROM tok WHERE token IN ({_ROCCHIO_IN})
),
after AS (
    SELECT COUNT(DISTINCT doc_id) AS n FROM tok
    WHERE token IN ({_ROCCHIO_IN}) OR token IN (SELECT token FROM mined)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS n_feedback_docs,
       (SELECT string_agg(token, ',' ORDER BY token) FROM mined)
           AS expansion_terms,
       (SELECT CAST(n AS BIGINT) FROM before) AS n_docs_before,
       (SELECT CAST(n AS BIGINT) FROM after) AS n_docs_after
"""


@register("text_rocchio_expansion", oracle=_ROCCHIO_SQL)
def text_rocchio_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = session_cache(
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    seeds = tok.filter(F.col("token").isin(_ROCCHIO_SEEDS))
    fb = (
        seeds.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(_ROCCHIO_FEEDBACK_N)
        .select("doc_id")
    )
    mined = (
        tok.join(broadcast(fb), "doc_id")
        .filter(
            ~F.col("token").isin(_ROCCHIO_SEEDS)
            & (F.length("token") >= 3)
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(_ROCCHIO_EXPAND_M)
        .select("token")
    )
    mined = session_cache(mined)
    before = seeds.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_before")
    )
    after = (
        tok.join(
            broadcast(mined.withColumn("hit", F.lit(1))), "token", "left"
        )
        .filter(F.col("token").isin(_ROCCHIO_SEEDS) | F.col("hit").isNotNull())
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs_after"))
    )
    nfb = fb.agg(F.count(F.lit(1)).cast("long").alias("n_feedback_docs"))
    terms = mined.agg(
        F.array_join(F.array_sort(F.collect_list("token")), ",").alias(
            "expansion_terms"
        )
    )
    return (
        nfb.crossJoin(broadcast(terms))
        .crossJoin(broadcast(before))
        .crossJoin(broadcast(after))
        .select(
            "n_feedback_docs", "expansion_terms", "n_docs_before", "n_docs_after"
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between document signals (round 10) — the
# signal-calibration readout every quality pipeline needs: do two
# scoring signals actually order the corpus the same way? Spearman is
# Pearson on TIE-AVERAGED ranks; the doubled-rank trick (2r = 2*cum_lt
# + cnt + 1, same as the Mann-Whitney query) keeps every rank integral,
# so all five correlation moments are exact integer sums in
# DECIMAL(38,0)/HUGEINT and the final rho is one identical IEEE
# expression on both engines (exact while 8*N^3 < 10^38, i.e. N below
# ~2.3e12 docs; beyond that the moments need 256-bit — documented
# trade). 100 TB: each signal's rank map is a hash aggregate over its
# DISTINCT values plus a two-phase distributed cumsum — no single-task
# sort anywhere.
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH sig AS (
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS x,
           CAST(LENGTH(trim(text)) - LENGTH(REPLACE(trim(text), ' ', '')) + 1
                AS BIGINT) AS y
    FROM documents
),
rx AS (
    SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS r2
    FROM (SELECT x, COUNT(*) AS cnt FROM sig GROUP BY x)
),
ry AS (
    SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS r2
    FROM (SELECT y, COUNT(*) AS cnt FROM sig GROUP BY y)
),
j AS (
    SELECT CAST(rx.r2 AS HUGEINT) AS a, CAST(ry.r2 AS HUGEINT) AS b
    FROM sig JOIN rx USING (x) JOIN ry USING (y)
),
m AS (
    SELECT COUNT(*) AS n, SUM(a) AS sa, SUM(b) AS sb,
           SUM(a * a) AS saa, SUM(b * b) AS sbb, SUM(a * b) AS sab
    FROM j
)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND(
         (CAST(CAST(n AS VARCHAR) AS DOUBLE) * CAST(CAST(sab AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sa AS VARCHAR) AS DOUBLE) * CAST(CAST(sb AS VARCHAR) AS DOUBLE))
         / (SQRT(CAST(CAST(n AS VARCHAR) AS DOUBLE)
                 * CAST(CAST(saa AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(sa AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(sa AS VARCHAR) AS DOUBLE))
            * SQRT(CAST(CAST(n AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(sbb AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(sb AS VARCHAR) AS DOUBLE)
                     * CAST(CAST(sb AS VARCHAR) AS DOUBLE))),
         6) AS spearman_rho
FROM m
"""


@register("text_signal_spearman", oracle=_SPEARMAN_SQL)
def text_signal_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast  # noqa: F401

    from deathmetal_datalake_spark.operators.ordering import two_phase_order
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents"))
    sig = session_cache(
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("x"),
            (
                F.length(F.trim(F.col("text")))
                - F.length(F.regexp_replace(F.trim(F.col("text")), " ", ""))
                + 1
            )
            .cast("long")
            .alias("y"),
        )
    )

    def rank2(col: str):
        g = sig.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        o = two_phase_order(
            g, [F.asc(col)], F.col(col), cumsum=("cnt", "cum")
        )
        return o.select(
            col,
            (
                F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1
            ).alias("r2"),
        )

    j = (
        sig.join(rank2("x").withColumnRenamed("r2", "a"), "x")
        .join(rank2("y").withColumnRenamed("r2", "b"), "y")
        .select(
            F.col("a").cast("decimal(19,0)").alias("a"),
            F.col("b").cast("decimal(19,0)").alias("b"),
        )
    )
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    dd = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    n = F.col("n").cast("string").cast("double")
    rho = (n * dd("sab") - dd("sa") * dd("sb")) / (
        F.sqrt(n * dd("saa") - dd("sa") * dd("sa"))
        * F.sqrt(n * dd("sbb") - dd("sb") * dd("sb"))
    )
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(rho, 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Simpson lexical diversity by source (round 11) — the EXACT-arithmetic
# diversity index (the entropy family needs ln(), which is libm- and
# engine-dependent; Simpson's lambda = sum n_w(n_w-1) / (N(N-1)) is the
# probability two tokens drawn without replacement coincide — pure
# integer counts). 1 - lambda is the diversity: 0 for a one-word
# corpus, -> 1 for a flat vocabulary. Token identity is the catalog's
# standard whitespace split over lower(trim(text)). 100 TB: one hash
# aggregate per (source, token) then per source — no window, no
# broadcast; numerators reach N^2 and are accumulated in
# DECIMAL(38,0)/HUGEINT with one rounded double at the end.
# ---------------------------------------------------------------------------

_SIMPSON_SQL = """
WITH toks AS (
    SELECT source, UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS w
    FROM documents WHERE text IS NOT NULL AND TRIM(text) <> ''
),
cw AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
m AS (
    SELECT source,
           SUM(CAST(c AS HUGEINT)) AS n,
           COUNT(*) AS vocab,
           SUM(CAST(c AS HUGEINT) * (CAST(c AS HUGEINT) - 1)) AS num
    FROM cw GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab_size,
       CASE WHEN n < 2 THEN NULL
            ELSE ROUND(1.0 - CAST(CAST(num AS VARCHAR) AS DOUBLE)
                       / (CAST(CAST(n AS VARCHAR) AS DOUBLE)
                          * (CAST(CAST(n AS VARCHAR) AS DOUBLE) - 1.0)), 6)
       END AS simpson_diversity
FROM m ORDER BY source
"""


@register("text_simpson_diversity", oracle=_SIMPSON_SQL)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "source",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    cw = (
        docs.select("source", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = cw.groupBy("source").agg(
        F.sum(d19("c")).alias("n"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(d19("c") * (d19("c") - 1)).alias("num"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    n = F.col("n")
    return m.select(
        "source",
        n.cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(1.0) - dd(F.col("num")) / (dd(n) * (dd(n) - F.lit(1.0))),
                6,
            )
        )
        .alias("simpson_diversity"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Unigram entropy lower bound in floor-log2 bits (round 11) — the
# corpus-compressibility gauge, ENGINE-EXACT by the same trade the HLL
# and LM-surprisal queries document: true Shannon entropy needs ln(),
# whose libm rounding differs across engines, so the per-token
# information is floored to whole bits — floor(log2(N/n_w)) =
# bitlength(N div n_w) - 1 on exact integers (a deterministic lower
# bound within 1 bit/token of H). Output per lang: tokens, vocab, the
# floored total bit count, and mean bits/token. 100 TB: two hash
# aggregates ((lang, token) then lang), one 1-row-per-lang frame.
# ---------------------------------------------------------------------------

_ENTROPY_BITS_SQL = """
WITH toks AS (
    SELECT lang, UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS w
    FROM documents WHERE text IS NOT NULL AND TRIM(text) <> ''
),
cw AS (SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
nt AS (SELECT lang, SUM(CAST(c AS HUGEINT)) AS n FROM cw GROUP BY lang),
bits AS (
    SELECT cw.lang,
           SUM(CAST(cw.c AS HUGEINT)
               * (LENGTH(bin(CAST(nt.n // cw.c AS BIGINT))) - 1)) AS tb,
           COUNT(*) AS vocab
    FROM cw JOIN nt ON cw.lang = nt.lang
    GROUP BY cw.lang
)
SELECT bits.lang,
       CAST(nt.n AS BIGINT) AS n_tokens,
       CAST(bits.vocab AS BIGINT) AS vocab_size,
       CAST(bits.tb AS BIGINT) AS total_bits_floor,
       ROUND(CAST(CAST(bits.tb AS VARCHAR) AS DOUBLE)
             / CAST(CAST(nt.n AS VARCHAR) AS DOUBLE), 6) AS mean_bits_per_token
FROM bits JOIN nt ON bits.lang = nt.lang
ORDER BY bits.lang
"""


@register("text_unigram_entropy_bits", oracle=_ENTROPY_BITS_SQL)
def text_unigram_entropy_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "lang",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    cw = (
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    cw = session_cache(cw)
    nt = cw.groupBy("lang").agg(
        F.sum(F.col("c").cast("decimal(19,0)")).alias("n")
    )
    bits = (
        cw.join(nt, "lang")
        .select(
            "lang",
            "c",
            (
                F.col("c").cast("decimal(19,0)")
                * (
                    F.length(
                        F.bin(F.expr("CAST(n div c AS BIGINT)"))
                    )
                    - 1
                ).cast("decimal(19,0)")
            ).alias("b"),
        )
        .groupBy("lang")
        .agg(F.sum("b").alias("tb"), F.count(F.lit(1)).alias("vocab"))
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        bits.join(nt, "lang")
        .select(
            "lang",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab_size"),
            F.col("tb").cast("long").alias("total_bits_floor"),
            F.round(dd(F.col("tb")) / dd(F.col("n")), 6).alias(
                "mean_bits_per_token"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (round 11) — the EVALUATION view of the
# text_language_id classifier: labeled lang x predicted lang cell
# counts with per-true-lang recall, the receipt a corpus pipeline reads
# before trusting the cheap n-gram router for mixture weighting. The
# prediction cascade is the classifier's own deterministic CASE chain;
# counts are exact. 100 TB: one projection + one hash aggregate to the
# (langs x langs) bounded frame.
# ---------------------------------------------------------------------------

_LANGID_CONFUSION_SQL = rf"""
WITH tok AS (
    SELECT lang,
           string_split_regex(LOWER(TRIM(COALESCE(text, ''))), '\s+') AS toks,
           regexp_matches(COALESCE(text, ''), '[\x{{4e00}}-\x{{9fff}}]') AS has_cjk
    FROM documents
),
scored AS (
    SELECT lang, has_cjk,
           {_sql_hits(_LANG_MARKERS["en"])} AS hits_en,
           {_sql_hits(_LANG_MARKERS["de"])} AS hits_de,
           {_sql_hits(_LANG_MARKERS["fr"])} AS hits_fr,
           {_sql_hits(_LANG_MARKERS["es"])} AS hits_es
    FROM tok
),
pred AS (
    SELECT lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN hits_en >= hits_de AND hits_en >= hits_fr
                     AND hits_en >= hits_es THEN 'en'
                WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
                WHEN hits_fr >= hits_es THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM scored
),
cells AS (
    SELECT lang, predicted_lang, COUNT(*) AS n
    FROM pred GROUP BY 1, 2
),
tot AS (SELECT lang, SUM(n) AS nl FROM cells GROUP BY lang)
SELECT cells.lang,
       cells.predicted_lang,
       CAST(cells.n AS BIGINT) AS n_docs,
       ROUND(CAST(cells.n AS DOUBLE) / tot.nl, 6) AS share_of_true_lang
FROM cells JOIN tot ON cells.lang = tot.lang
ORDER BY cells.lang, cells.predicted_lang
"""


@register("text_langid_confusion_matrix", oracle=_LANGID_CONFUSION_SQL)
def text_langid_confusion_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Same NULL-as-empty convention as text_language_id (see there).
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.lower(F.trim(txt)), r"\s+")
    has_cjk = txt.rlike("[一-鿿]")
    scored = docs.select(
        "lang",
        has_cjk.alias("has_cjk"),
        *[
            _hits(toks, words).cast("long").alias(f"hits_{lang}")
            for lang, words in _LANG_MARKERS.items()
        ],
    )
    he, hd, hf, hs = (F.col(f"hits_{x}") for x in ("en", "de", "fr", "es"))
    predicted = (
        F.when(F.col("has_cjk"), F.lit("zh"))
        .when((he >= hd) & (he >= hf) & (he >= hs), F.lit("en"))
        .when((hd >= hf) & (hd >= hs), F.lit("de"))
        .when(hf >= hs, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    cells = (
        scored.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted_lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
            "share_of_true_lang"
        ),
    ).orderBy("lang", "predicted_lang")


# ---------------------------------------------------------------------------
# Gopher-style quality-rule battery (round 12) — the document-level
# pass/fail rules a pretraining curation pipeline applies before any
# model-based scoring (Rae et al.'s repetition/format class): word
# count bounds, mean word length bounds, alphabetic-token fraction,
# and stopword presence, rolled up per source. Exactness: every rule
# is an INTEGER CROSS-MULTIPLIED comparison (3*n <= chars <= 10*n;
# 5*alpha >= 4*n), so no per-doc ratio ever crosses engines; only the
# final per-source rates round to 6 dp from exact integer counts.
# 100 TB: one map-only pass per doc, one hash aggregate per source.
# ---------------------------------------------------------------------------

_GOPHER_SQL = f"""
WITH d AS (
    SELECT source,
           string_split_regex(LOWER(TRIM(text)), '\\s+') AS toks
    FROM documents WHERE text IS NOT NULL
),
m AS (
    SELECT source,
           LENGTH(toks) AS n_tok,
           CAST(list_sum(list_transform(toks, t -> LENGTH(t))) AS BIGINT)
               AS n_chars,
           LENGTH(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
               AS n_alpha,
           (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
            + CASE WHEN list_contains(toks, 'in') THEN 1 ELSE 0 END)
               AS n_stop
    FROM d
),
r AS (
    SELECT source,
           CASE WHEN n_tok BETWEEN 10 AND 10000 THEN 1 ELSE 0 END AS r_wc,
           CASE WHEN 3 * n_tok <= n_chars AND n_chars <= 10 * n_tok
                THEN 1 ELSE 0 END AS r_mwl,
           CASE WHEN 5 * n_alpha >= 4 * n_tok THEN 1 ELSE 0 END AS r_alpha,
           CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
    FROM m
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r_wc) AS BIGINT) AS pass_word_count,
       CAST(SUM(r_mwl) AS BIGINT) AS pass_mean_word_len,
       CAST(SUM(r_alpha) AS BIGINT) AS pass_alpha_fraction,
       CAST(SUM(r_stop) AS BIGINT) AS pass_stopwords,
       CAST(SUM(r_wc * r_mwl * r_alpha * r_stop) AS BIGINT) AS pass_all,
       ROUND(CAST(SUM(r_wc * r_mwl * r_alpha * r_stop) AS DOUBLE)
             / COUNT(*), 6) AS pass_all_rate
FROM r GROUP BY source ORDER BY source
"""


@register("corpus_gopher_quality_rules", oracle=_GOPHER_SQL)
def corpus_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .select(
            "source",
            F.size("toks").alias("n_tok"),
            F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))").alias(
                "n_chars"
            ),
            F.expr("size(filter(toks, t -> t rlike '[a-z]'))").alias(
                "n_alpha"
            ),
            (
                F.array_contains("toks", "the").cast("int")
                + F.array_contains("toks", "a").cast("int")
                + F.array_contains("toks", "and").cast("int")
                + F.array_contains("toks", "of").cast("int")
                + F.array_contains("toks", "to").cast("int")
                + F.array_contains("toks", "in").cast("int")
            ).alias("n_stop"),
        )
    )
    r = m.select(
        "source",
        F.col("n_tok").between(10, 10000).cast("int").alias("r_wc"),
        (
            (F.lit(3) * F.col("n_tok") <= F.col("n_chars"))
            & (F.col("n_chars") <= F.lit(10) * F.col("n_tok"))
        ).cast("int").alias("r_mwl"),
        (F.lit(5) * F.col("n_alpha") >= F.lit(4) * F.col("n_tok"))
        .cast("int")
        .alias("r_alpha"),
        (F.col("n_stop") >= 2).cast("int").alias("r_stop"),
    )
    allp = F.col("r_wc") * F.col("r_mwl") * F.col("r_alpha") * F.col("r_stop")
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("r_wc").cast("long").alias("pass_word_count"),
            F.sum("r_mwl").cast("long").alias("pass_mean_word_len"),
            F.sum("r_alpha").cast("long").alias("pass_alpha_fraction"),
            F.sum("r_stop").cast("long").alias("pass_stopwords"),
            F.sum(allp).cast("long").alias("pass_all"),
            F.round(
                F.sum(allp).cast("double") / F.count(F.lit(1)), 6
            ).alias("pass_all_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Intra-document repetition (round 12) — the within-doc companion to
# the cross-doc dedup family: a doc whose word trigrams are mostly
# repeats of themselves (boilerplate, keyword stuffing, decoding
# loops) hurts training even when globally unique. Per doc: distinct /
# total trigram ratio; per source: mean ratio and the fraction of docs
# below the 0.5 repetition threshold, decided by the exact integer
# comparison 2*distinct < total. 100 TB: trigram explode is one
# map-side pass (~n_tokens rows per doc), two hash aggregates.
# ---------------------------------------------------------------------------

_REPETITION_SQL = f"""
WITH d AS (
    SELECT doc_id, source,
           string_split_regex(LOWER(TRIM(text)), '\\s+') AS toks
    FROM documents WHERE text IS NOT NULL
),
t AS (
    SELECT doc_id, source,
           UNNEST(list_transform(range(1, LENGTH(toks) - 1),
                  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
               AS tri
    FROM d WHERE LENGTH(toks) >= 3
),
pd AS (
    SELECT doc_id, source,
           COUNT(*) AS n_tri,
           COUNT(DISTINCT tri) AS n_distinct
    FROM t GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tri) AS BIGINT) AS n_trigrams,
       CAST(SUM(n_distinct) AS BIGINT) AS n_distinct_trigrams,
       {sql_davg("CAST(n_distinct AS DOUBLE) / n_tri", "mean_distinct_ratio")},
       CAST(SUM(CASE WHEN 2 * n_distinct < n_tri THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repetitive,
       ROUND(CAST(SUM(CASE WHEN 2 * n_distinct < n_tri THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS repetitive_rate
FROM pd GROUP BY source ORDER BY source
"""


@register("corpus_intra_doc_repetition", oracle=_REPETITION_SQL)
def corpus_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .filter(F.size("toks") >= 3)
    )
    # 1-based SQL list indexing mirrors 0-based Spark element_at via
    # explicit index arithmetic inside transform.
    t = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 3), i -> "
                "concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"
            )
        ).alias("tri"),
    )
    pd = t.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tri"),
        F.countDistinct("tri").alias("n_distinct"),
    )
    rep = F.when(
        F.lit(2) * F.col("n_distinct") < F.col("n_tri"), 1
    ).otherwise(0)
    return (
        pd.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tri").cast("long").alias("n_trigrams"),
            F.sum("n_distinct").cast("long").alias("n_distinct_trigrams"),
            davg(
                F.col("n_distinct").cast("double") / F.col("n_tri"),
                "mean_distinct_ratio",
            ),
            F.sum(rep).cast("long").alias("n_repetitive"),
            F.round(F.sum(rep).cast("double") / F.count(F.lit(1)), 6).alias(
                "repetitive_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pattern-scrub audit (round 12) — the PII/artifact scan a corpus runs
# before release: per source, documents containing and total matches of
# (1) email-shaped spans, (2) long digit runs (ids/phones), and (3) a
# control pattern guaranteed to fire on this corpus (double-'a' words)
# so the extraction counting machinery is exercised end-to-end even
# where the realistic patterns are clean. RE2-safe patterns only (no
# backreferences/lookarounds — Java regex and DuckDB RE2 agree on
# these exactly); counts are non-overlapping left-to-right matches in
# both engines. 100 TB: map-only regexp_extract_all + one aggregate.
# ---------------------------------------------------------------------------

_SCRUB_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_SCRUB_DIGITS = "[0-9]{6,}"
_SCRUB_CONTROL = "[a-z]*a[a-z]*a[a-z]*"

_SCRUB_SQL = f"""
WITH m AS (
    SELECT source,
           LENGTH(regexp_extract_all(text, '{_SCRUB_EMAIL}')) AS n_email,
           LENGTH(regexp_extract_all(text, '{_SCRUB_DIGITS}')) AS n_digits,
           LENGTH(regexp_extract_all(LOWER(text), '{_SCRUB_CONTROL}'))
               AS n_control
    FROM documents WHERE text IS NOT NULL
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_email,
       CAST(SUM(n_email) AS BIGINT) AS email_matches,
       CAST(SUM(CASE WHEN n_digits > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_digit_run,
       CAST(SUM(n_digits) AS BIGINT) AS digit_run_matches,
       CAST(SUM(CASE WHEN n_control > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_control,
       CAST(SUM(n_control) AS BIGINT) AS control_matches
FROM m GROUP BY source ORDER BY source
"""


@register("corpus_pattern_scrub_rates", oracle=_SCRUB_SQL)
def corpus_pattern_scrub_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.size(
                F.regexp_extract_all("text", F.lit(_SCRUB_EMAIL), 0)
            ).alias("n_email"),
            F.size(
                F.regexp_extract_all("text", F.lit(_SCRUB_DIGITS), 0)
            ).alias("n_digits"),
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(_SCRUB_CONTROL), 0)
            ).alias("n_control"),
        )
    )
    flag = lambda c: F.sum(F.when(F.col(c) > 0, 1).otherwise(0))  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            flag("n_email").cast("long").alias("docs_with_email"),
            F.sum("n_email").cast("long").alias("email_matches"),
            flag("n_digits").cast("long").alias("docs_with_digit_run"),
            F.sum("n_digits").cast("long").alias("digit_run_matches"),
            flag("n_control").cast("long").alias("docs_with_control"),
            F.sum("n_control").cast("long").alias("control_matches"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Duplicate-cap retention (round 13) — the "keep at most K copies"
# curation policy (RefinedWeb/FineWeb keep 1; data-mixing recipes keep
# a few so common boilerplate is not over-forgotten): exact-duplicate
# clusters by md5(text), the K lowest doc_ids per cluster survive
# (deterministic winners), and the per-source audit reports how much
# survives — docs and CHARS, since duplicate clusters skew short. The
# per-cluster window is keyed by the hash (never a global sort), the
# cap is a rank filter, and everything else is one hash aggregate per
# source. 100 TB: shuffle by content-hash, bounded per-key state.
# ---------------------------------------------------------------------------

_DUPCAP_K = 2

_DUPCAP_SQL = f"""
WITH ranked AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY md5(text) ORDER BY doc_id
           ) AS rn
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {_DUPCAP_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN rn <= {_DUPCAP_K} THEN n_chars ELSE 0 END)
           AS BIGINT) AS n_chars_retained,
       ROUND(CAST(SUM(CASE WHEN rn <= {_DUPCAP_K} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS doc_retention,
       ROUND(CAST(SUM(CASE WHEN rn <= {_DUPCAP_K} THEN n_chars ELSE 0 END)
                  AS DOUBLE) / SUM(n_chars), 6) AS char_retention
FROM ranked
GROUP BY source
ORDER BY source
"""


@register("corpus_influence_dedup_cap", oracle=_DUPCAP_SQL)
def corpus_influence_dedup_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    keep = F.when(F.col("rn") <= _DUPCAP_K, 1).otherwise(0)
    kept_chars = F.when(F.col("rn") <= _DUPCAP_K, F.col("n_chars")).otherwise(
        0
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(keep).cast("long").alias("n_retained"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum(kept_chars).cast("long").alias("n_chars_retained"),
        )
        .select(
            "source",
            "n_docs",
            "n_retained",
            "n_chars",
            "n_chars_retained",
            F.round(
                F.col("n_retained").cast("double") / F.col("n_docs"), 6
            ).alias("doc_retention"),
            F.round(
                F.col("n_chars_retained").cast("double") / F.col("n_chars"),
                6,
            ).alias("char_retention"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pairwise language-divergence matrix (round 13) — Jensen-Shannon
# distance between every language pair's unigram distribution over the
# corpus' top-200 global vocabulary: the corpus-composition diagnostic
# behind multilingual mixing decisions (which languages share surface
# vocabulary, which are disjoint). One tokenize+count pass (the house
# whitespace law), a top-V global cut (TakeOrdered, deterministic
# count-then-word tie-break), then a DENSE bounded frame (<=V rows x
# |langs| columns) carries every pairwise term — per-word terms are
# micro-rounded longs (chi2 determinism pattern) and the |langs|^2/2
# sums land in ONE aggregate. 100 TB: everything after the token count
# is bounded by V * |langs|.
# ---------------------------------------------------------------------------

_DIV_LANGS = ("de", "en", "es", "fr", "zh")
_DIV_TOPV = 200


def _div_pairs():
    ls = _DIV_LANGS
    return [(ls[i], ls[j]) for i in range(len(ls)) for j in range(len(ls)) if i < j]


def _div_sql() -> str:
    dense_cols = ",\n        ".join(
        f"SUM(CASE WHEN lang = '{l}' THEN c ELSE 0 END) AS c_{l}"
        for l in _DIV_LANGS
    )
    tot_cols = ", ".join(f"SUM(c_{l}) AS t_{l}" for l in _DIV_LANGS)
    term_cols, sum_cols, rows = [], [], []
    for a, b in _div_pairs():
        p = f"(CAST(c_{a} AS DOUBLE) / t_{a})"
        q = f"(CAST(c_{b} AS DOUBLE) / t_{b})"
        term_cols.append(
            f"CAST(ROUND((CASE WHEN c_{a} > 0 THEN {p} * LOG2(2.0 * {p} / ({p} + {q})) ELSE 0.0 END"
            f" + CASE WHEN c_{b} > 0 THEN {q} * LOG2(2.0 * {q} / ({p} + {q})) ELSE 0.0 END)"
            f" * 500000) AS BIGINT) AS u_{a}_{b},"
            f" CASE WHEN c_{a} > 0 AND c_{b} > 0 THEN 1 ELSE 0 END AS b_{a}_{b}"
        )
        sum_cols.append(
            f"SUM(u_{a}_{b}) AS u_{a}_{b}, SUM(b_{a}_{b}) AS b_{a}_{b}"
        )
        rows.append(
            f"('{a}', '{b}', (SELECT ROUND(u_{a}_{b} / 1000000.0, 6) FROM s),"
            f" (SELECT CAST(b_{a}_{b} AS BIGINT) FROM s))"
        )
    return f"""
WITH toks AS (
    SELECT lang, UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS w
    FROM documents WHERE text IS NOT NULL AND TRIM(text) <> ''
),
cw AS (SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
top AS (
    SELECT w FROM (
        SELECT w, SUM(c) AS gc FROM cw GROUP BY w
        ORDER BY gc DESC, w ASC LIMIT {_DIV_TOPV}
    )
),
dense AS (
    SELECT w,
        {dense_cols}
    FROM cw WHERE w IN (SELECT w FROM top) GROUP BY w
),
t AS (SELECT {tot_cols} FROM dense),
terms AS (
    SELECT {", ".join(term_cols)}
    FROM dense, t
),
s AS (SELECT {", ".join(sum_cols)} FROM terms)
SELECT * FROM (VALUES
    {", ".join(rows)}
) v(lang_a, lang_b, jsd_bits, n_words_both)
ORDER BY lang_a, lang_b
"""


@register("text_lang_divergence_matrix", oracle=_div_sql())
def text_lang_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache, spread

    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "lang",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
    )
    cw = session_cache(
        docs.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        cw.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), F.asc("w"))
        .limit(_DIV_TOPV)
        .select("w")
    )
    dense = (
        cw.join(broadcast(top), "w", "left_semi")
        .groupBy("w")
        .agg(
            *[
                F.sum(F.when(F.col("lang") == l, F.col("c")).otherwise(0))
                .cast("long")
                .alias(f"c_{l}")
                for l in _DIV_LANGS
            ]
        )
    )
    tot = dense.agg(
        *[F.sum(f"c_{l}").cast("long").alias(f"t_{l}") for l in _DIV_LANGS]
    )
    terms = dense.crossJoin(broadcast(tot))  # [1row] per-lang totals
    aggs = []
    for a, b in _div_pairs():
        p = F.col(f"c_{a}").cast("double") / F.col(f"t_{a}")
        q = F.col(f"c_{b}").cast("double") / F.col(f"t_{b}")
        term = (
            F.when(
                F.col(f"c_{a}") > 0,
                p * F.log2(F.lit(2.0) * p / (p + q)),
            ).otherwise(0.0)
            + F.when(
                F.col(f"c_{b}") > 0,
                q * F.log2(F.lit(2.0) * q / (p + q)),
            ).otherwise(0.0)
        )
        aggs.append(
            F.sum(F.round(term * F.lit(500000.0)).cast("long")).alias(
                f"u_{a}_{b}"
            )
        )
        aggs.append(
            F.sum(
                F.when(
                    (F.col(f"c_{a}") > 0) & (F.col(f"c_{b}") > 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"b_{a}_{b}")
        )
    s = terms.agg(*aggs)
    stack_args = ", ".join(
        # 1e6 (not 1000000.0): a Spark SQL decimal-point literal parses
        # as DECIMAL and would make jsd_bits decimal-typed; the oracle
        # (and the micro convention) is double.
        f"'{a}', '{b}', ROUND(u_{a}_{b} / 1e6, 6), b_{a}_{b}"
        for a, b in _div_pairs()
    )
    return s.selectExpr(
        f"stack({len(_div_pairs())}, {stack_args}) AS "
        "(lang_a, lang_b, jsd_bits, n_words_both)"
    ).orderBy("lang_a", "lang_b")
