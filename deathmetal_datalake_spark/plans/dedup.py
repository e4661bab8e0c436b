"""Deduplication operators over ``documents``: exact, n-gram Jaccard,
MinHash-LSH, and SimHash.

Scale design (the whole point of these): never form the quadratic
all-pairs set. Candidates come from inverted-index / band-bucket joins
whose cost is Σ bucket² over buckets, not n². Every hash is the
engine-portable 60-bit md5 hash (registry.hash60) so DuckDB oracles
verify the full pipeline, not just row counts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

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
# Exact dedup: group by content hash; keep min doc_id as representative.
# At 100 TB this is one shuffle on a 60-bit key — the canonical first
# pass of any corpus dedup.
# ---------------------------------------------------------------------------

_EXACT_SQL = f"""
SELECT {sql_hash60('text')} AS content_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY content_hash
"""


@register("dedup_exact", oracle=_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(hash60("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Shared shingling: distinct 3-word shingles per document.
# ---------------------------------------------------------------------------

_SHINGLE_N = 3
# Document-frequency cap on shingles used for candidate generation: a
# shingle appearing in > cap docs would contribute O(df²) candidate
# pairs (the classic hot-key blowup); dropping ubiquitous shingles is
# the standard skew guard and is applied identically in the oracle.
#
# The cap AUTO-SCALES with the corpus (the round-3 fixed constant went
# superlinear exactly in the pre-saturation regime — a shingle at df=10
# at one scale hits df=100 at 10× and its pair mass grows ~df² until a
# fixed cap bites). Treating the cap as a CANDIDATE BUDGET instead:
# total pair mass ≈ cap · postings, so cap ∝ 1/√n keeps the mass's 10×
# slope at ~√10 ≈ 3× — suite-typical — while small corpora keep the
# permissive ceiling. Computed with the same exact-integer,
# engine-portable idiom as the SimHash _auto_band_bits knob:
# Python ``budget >> (ceil_log2(n) // 2)`` ≡ DuckDB
# ``budget // (1 << (LENGTH(bin(n-1)) // 2))`` (2^(⌈log2 n⌉/2) ≈ √n in
# power-of-two steps), clamped to [8, 100]. A shingle ubiquitous at
# scale is boilerplate with no dedup signal anyway; genuinely similar
# docs share many RARE shingles, which the cap never touches.
_DF_BUDGET = 3200
_DF_CAP_MIN = 8
_DF_CAP_MAX = 100


def _auto_max_df(n_docs: int) -> int:
    """budget / 2^(⌈log2 n⌉/2) ≈ budget/√n, clamped; exact-integer,
    engine-portable (mirrored by ``_SQL_MAX_DF``)."""
    lg = (max(n_docs, 1) - 1).bit_length()
    return min(_DF_CAP_MAX, max(_DF_CAP_MIN, _DF_BUDGET >> (lg // 2)))


# Scalar-subquery form of the same formula for the DuckDB oracles; for
# n ≥ 2, LENGTH(bin(n-1)) ≡ (n-1).bit_length() (both engines clamp to
# the ceiling in the n ≤ 1 corner, where the operand differs).
_SQL_MAX_DF = (
    f"(SELECT LEAST({_DF_CAP_MAX}, GREATEST({_DF_CAP_MIN}, "
    f"{_DF_BUDGET} // (1 << (LENGTH(bin(COUNT(*) - 1)) // 2)))) "
    f"FROM documents)"
)


def _shingles(docs: DataFrame) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    # Docs shorter than the shingle width contribute NO shingles — the
    # guard is required, not cosmetic: Spark sequence(1, n-2) DESCENDS
    # for n < 3 (step defaults to -1) and slice(toks, 0, k) aborts the
    # job. DuckDB's end-exclusive range() is already empty (round-8
    # degenerate-corpus find; same class as the bigram-lift r7 fix).
    idx = F.when(
        n >= _SHINGLE_N, F.sequence(F.lit(1), n - (_SHINGLE_N - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, _SHINGLE_N)))
    return (
        docs.select("doc_id", F.explode(shingle).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def _hashed_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) distinct, deduped on the 60-bit hash — the distinct
    shuffles 8-byte keys instead of shingle strings. Equivalent to
    hashing after a string-distinct (the hash is injective modulo
    ~2^-61 collisions; the oracle hashes the same way).

    The input is repartitioned to full parallelism first: document
    tables compress to few parquet splits, so without this the
    expensive explode+md5 map stage runs on a handful of scan tasks
    (measured 10× slowdown at 10× scale on a 32-core local run).

    The per-document distinct runs ROW-LOCALLY (``array_distinct`` on
    the hash array before the explode) instead of as a
    ``dropDuplicates`` shuffle: a document's shingle set always fits
    one row, so deduplicating it never needs the cluster — this removes
    a full shuffle of the largest intermediate in the whole dedup
    family (measured ~25% off ngram-Jaccard end-to-end at sf0.1).
    """
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    # Same short-doc guard as _shingles (descending-sequence crash).
    idx = F.when(
        n >= _SHINGLE_N, F.sequence(F.lit(1), n - (_SHINGLE_N - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, _SHINGLE_N)))
    hashes = F.array_distinct(F.transform(shingle, lambda s: hash60(s)))
    return spread.select("doc_id", F.explode(hashes).alias("sh"))


_SHINGLES_SQL = rf"""
WITH tok AS (
    SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS toks FROM documents
),
shingled AS (
    SELECT DISTINCT doc_id,
           UNNEST(list_transform(
               range(1, LENGTH(toks) - {_SHINGLE_N - 1} + 1),
               i -> array_to_string(toks[i:i+{_SHINGLE_N - 1}], ' ')
           )) AS shingle
    FROM tok
)
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup: inverted-index candidate join + true Jaccard
# on shingle-set sizes; top-3 most similar neighbors per document.
# ---------------------------------------------------------------------------

# Shared CTE block: df-capped shingle inverted index → per-doc set
# sizes + per-pair intersection counts. Consumed by both the Jaccard
# and the containment oracles (single source for the hot-key guard).
_PAIR_CTES = f"""hashed AS (
    SELECT doc_id, {sql_hash60('shingle')} AS sh FROM shingled
),
df AS (
    SELECT sh FROM hashed GROUP BY sh HAVING COUNT(*) <= {_SQL_MAX_DF}
),
filtered AS (
    SELECT h.doc_id, h.sh FROM hashed h JOIN df USING (sh)
),
sizes AS (
    SELECT doc_id, COUNT(*) AS n_shingles FROM filtered GROUP BY doc_id
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM filtered a JOIN filtered b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
)"""

_JACCARD_SQL = (
    _SHINGLES_SQL
    + ",\n"
    + _PAIR_CTES
    + """,
scored AS (
    SELECT doc_a, doc_b, n_common,
           ROUND(CAST(n_common AS DOUBLE) /
                 (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_a ORDER BY jaccard DESC, doc_b ASC
    ) AS rn FROM scored
)
SELECT doc_a, doc_b, n_common, jaccard FROM ranked WHERE rn <= 3
"""
)


def _capped_pair_counts(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(pairs, sizes) over the df-capped shingle inverted index — the
    shared engine of the Jaccard and containment queries (mirrors the
    oracle-side ``_PAIR_CTES`` exactly).

    Inverted index as per-shingle doc lists (one groupBy on the 60-bit
    shingle hash); candidate pairs are generated row-locally from each
    list instead of a self-join — one shuffle replaces two, measured
    ~15% faster at sf0.1 with identical pair sets.

    Two-phase hot-key guard: count df per shingle FIRST (count(*) is a
    constant-size aggregation buffer), keep only df ≤ cap keys via
    semi-join, and only THEN collect_list. Collecting before filtering
    would materialize a stop-shingle's full ~n_docs list in a single
    reducer buffer at 100 TB — the filter never gets to run. Mirrors
    the oracle's HAVING COUNT(*) <= cap → join shape exactly.

    Caches: ``shingled`` (consumed by the df-count branch and the
    semi-join probe) and ``kept`` (consumed by the lists and sizes
    branches) — without them the expensive explode+md5 shingle
    pipeline re-executes per consumer.
    """
    # One cheap metadata-backed count action derives the scale-aware
    # cap at plan time (the SimHash band-bits pattern).
    max_df = _auto_max_df(docs.count())
    shingled = session_cache(_hashed_shingles(docs))
    ok = (
        shingled.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("sh")
    )
    kept = session_cache(shingled.join(ok, "sh", "left_semi"))
    lists = kept.groupBy("sh").agg(F.collect_list("doc_id").alias("ds"))
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    pair_structs = F.expr(
        """
        filter(
          flatten(transform(ds, a -> transform(ds, b -> struct(a AS doc_a, b AS doc_b)))),
          p -> p.doc_a < p.doc_b)
        """
    )
    pairs = (
        lists.filter(F.size("ds") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return pairs, sizes


@register("dedup_ngram_jaccard", oracle=_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs, sizes = _capped_pair_counts(docs)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    scored = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_a").orderBy(F.desc("jaccard"), F.asc("doc_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding. k=8 permutation hashes
# h_i(x) = (a_i·x + b_i) mod p over the portable 60-bit shingle hash;
# 4 bands × 2 rows. Near-dup pairs = band-bucket collisions whose
# estimated Jaccard (signature agreement fraction) ≥ 0.5.
# ---------------------------------------------------------------------------

_MERSENNE_P = 2147483647  # 2^31 - 1
_MINHASH_AB = [
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 1),
    (214013, 2531011),
    (69069, 1234567),
    (1103515245, 12345),
    (48271, 7),
    (16807, 11),
]
_N_HASHES = len(_MINHASH_AB)
_BAND_ROWS = 2  # 4 bands × 2 rows
_EST_THRESHOLD = 0.5
# Bucket-anchor candidate cap (round-5): every candidate pair must
# include one of the bucket's _BAND_ANCHORS smallest doc_ids. A clique
# of s near-identical docs sharing a band bucket otherwise emits C(s,2)
# pairs — quadratic in clique size, the mass that melts a 100 TB job
# when boilerplate text goes viral. With the anchor rule the per-bucket
# pair mass is ~2·A·s (linear) while every member still pairs with the
# anchors, so cluster connectivity (connected components, canonical
# pick) is preserved.
#
# Invariant (round-6, corrected): a pair is EXCLUDED only when BOTH
# members rank past the anchors (rn > A), which requires bucket size
# >= A + 2. Results are therefore bit-identical to the uncapped plan
# whenever every bucket has <= _BAND_ANCHORS + 1 members — true at all
# test SFs (max observed 3 at sf0.01, 9 at sf0.1 with A = 8). The cap
# is mirrored verbatim in every oracle (the _auto_max_df convention),
# so the knob itself is correctness-checked.
#
# Execution note (round-6 reconciliation, docs/SCALING.md §minhash):
# the rank is ONE sort-window over the bands frame, shuffled on the
# same (band, bucket) keys the candidate self-join needs — the join
# reuses the window's exchange and sort order, so the cap's marginal
# cost is the in-partition sort + rank projection only. Two
# count-first alternatives (split the frame around a broadcast hot-
# bucket set; driver-probe `isEmpty` to skip the rank entirely) were
# built and measured this round and BOTH lose to the window at sf0.1
# AND at 10× (extra jobs / lost exchange reuse dominate); receipts in
# docs/SCALING.md. The cap's value is the worst-case bound on viral
# cliques, not a test-scale speedup — at 10× it already binds (buckets
# past A + 1 exist) at flat cost vs the uncapped r4 plan.
_BAND_ANCHORS = 8


def _bands_with_anchor_rank(bands: DataFrame) -> DataFrame:
    """Attach the anchor rank ``rn`` to a (doc_id, band, bucket) frame:
    row_number over (band, bucket) ordered by doc_id. The downstream
    candidate self-join keys on (band, bucket), so the window's
    exchange and sort are reused — see the _BAND_ANCHORS note above
    for why this beats count-first formulations at both scales."""
    w_rn = Window.partitionBy("band", "bucket").orderBy("doc_id")
    return bands.withColumn("rn", F.row_number().over(w_rn))


def _minhash_columns(shingled: DataFrame) -> DataFrame:
    """(doc_id, m0..m7) — columnar signatures in ONE hash aggregation.

    Computing all k permutation-minima as parallel agg expressions
    (instead of exploding k rows per shingle and re-grouping) keeps the
    shuffle at one row per document and lets later stages read signature
    components without a join — the layout that survives 100 TB.
    """
    hashed = shingled.select("doc_id", (F.col("sh") % _MERSENNE_P).alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE_P).alias(f"m{i}")
        for i, (a, b) in enumerate(_MINHASH_AB)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


_SIG_SQL = (
    _SHINGLES_SQL
    + f""",
hashed AS (
    SELECT doc_id, {sql_hash60('shingle')} % {_MERSENNE_P} AS h FROM shingled
),
perms AS (
    SELECT doc_id, g.i,
           (CASE g.i {' '.join(f'WHEN {i} THEN ({a} * h + {b}) % {_MERSENNE_P}' for i, (a, b) in enumerate(_MINHASH_AB))} END) AS hv
    FROM hashed, (SELECT UNNEST(range({_N_HASHES})) AS i) g
),
sig AS (
    SELECT doc_id, i, MIN(hv) AS minhash FROM perms GROUP BY doc_id, i
)
"""
)

_MINHASH_SIG_SQL = _SIG_SQL + "SELECT doc_id, i AS hash_no, minhash FROM sig"


@register("dedup_minhash_signatures", oracle=_MINHASH_SIG_SQL)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = _minhash_columns(_hashed_shingles(docs))
    pairs = F.array(
        *[
            F.struct(F.lit(i).cast("long").alias("hash_no"), F.col(f"m{i}").alias("minhash"))
            for i in range(_N_HASHES)
        ]
    )
    return sig.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.hash_no").alias("hash_no"), F.col("p.minhash").alias("minhash")
    )


_LSH_SQL = (
    _SIG_SQL
    + f""",
bands AS (
    SELECT doc_id,
           i // {_BAND_ROWS} AS band,
           {sql_hash60(f"array_to_string(list(minhash ORDER BY i), '_')")} AS bucket
    FROM sig
    GROUP BY doc_id, i // {_BAND_ROWS}
),
bands_rn AS (
    SELECT doc_id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_rn a JOIN bands_rn b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.rn <= {_BAND_ANCHORS} OR b.rn <= {_BAND_ANCHORS}
),
est AS (
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE)
                 / {_N_HASHES}, 6) AS est_jaccard
    FROM candidates c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {_EST_THRESHOLD}
"""
)


def _minhash_band_candidates(sig: DataFrame) -> DataFrame:
    """Distinct band-bucket collision pairs (doc_a < doc_b) from a
    columnar signature table — shared by the LSH query and the
    calibration audit.

    Band buckets come straight from the signature columns (band b
    covers components [b*_BAND_ROWS, (b+1)*_BAND_ROWS)); no
    per-component explode/regroup. Bucket string matches the oracle's
    array_to_string(list(minhash ORDER BY i), '_')."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                hash60(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(b * _BAND_ROWS, (b + 1) * _BAND_ROWS)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(_N_HASHES // _BAND_ROWS)
        ]
    )
    bands = _bands_with_anchor_rank(
        sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
            "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & ((F.col("a.rn") <= _BAND_ANCHORS) | (F.col("b.rn") <= _BAND_ANCHORS)),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates()
    )


def _minhash_estimates(candidates: DataFrame, sig: DataFrame) -> DataFrame:
    """Estimated Jaccard per candidate pair from the columnar
    signatures: two joins on doc_id, agreement computed row-local — no
    component-level join."""
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    agreement = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(_N_HASHES)
    )
    return (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(agreement.cast("double") / _N_HASHES, 6).alias("est_jaccard"),
        )
    )


@register("dedup_minhash_lsh", oracle=_LSH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    candidates = _minhash_band_candidates(sig)
    est = _minhash_estimates(candidates, sig)
    return est.filter(F.col("est_jaccard") >= _EST_THRESHOLD)


# ---------------------------------------------------------------------------
# SimHash (32-bit): per-token hash bits vote ±1; the sign vector packs
# into one integer per doc. Near-identical docs land within small
# Hamming distance.
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32

_SIMHASH_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id, {sql_hash60('token')} AS h FROM tok
),
bits AS (
    SELECT doc_id, g.j,
           SUM(CASE WHEN (h >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM hashed, (SELECT UNNEST(range({_SIMHASH_BITS})) AS j) g
    GROUP BY doc_id, g.j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
"""


@register("dedup_simhash", oracle=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    hashed = tokens.select("doc_id", hash60("token").alias("h"))
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("j"),
        "h",
    )
    votes = bits.groupBy("doc_id", "j").agg(
        F.sum(
            F.when(F.expr("shiftright(h, j) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias("vote")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )


# ---------------------------------------------------------------------------
# Connected components over the MinHash-LSH near-dup graph: the final
# step of corpus dedup (transitive closure → one canonical doc per
# cluster, labeled by the cluster's min doc_id). Spark side is iterative
# min-label propagation (the standard large-graph CC algorithm —
# converges in O(diameter) joins, lineage cut per iteration); oracle is
# a recursive CTE over the identical edge set.
# ---------------------------------------------------------------------------

_CC_SQL = (
    _SIG_SQL.replace("WITH tok AS", "WITH RECURSIVE tok AS", 1)
    + f""",
bands AS (
    SELECT doc_id,
           i // {_BAND_ROWS} AS band,
           {sql_hash60("array_to_string(list(minhash ORDER BY i), '_')")} AS bucket
    FROM sig
    GROUP BY doc_id, i // {_BAND_ROWS}
),
bands_rn AS (
    SELECT doc_id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_rn a JOIN bands_rn b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.rn <= {_BAND_ANCHORS} OR b.rn <= {_BAND_ANCHORS}
),
est AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE)
               / {_N_HASHES} AS est_jaccard
    FROM candidates c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM est WHERE est_jaccard >= {_EST_THRESHOLD}
),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
cc(node, label) AS (
    SELECT a AS node, a AS label FROM und
    UNION
    SELECT u.b AS node, cc.label FROM cc JOIN und u ON cc.node = u.a WHERE cc.label < u.b
)
SELECT d.doc_id,
       COALESCE(comp.component, d.doc_id) AS component
FROM documents d
LEFT JOIN (SELECT node, MIN(label) AS component FROM cc GROUP BY node) comp
       ON d.doc_id = comp.node
"""
)


_CC_MAX_ITERS = 50


def min_label_propagation(
    nodes: DataFrame, edges: DataFrame, max_iters: int = _CC_MAX_ITERS
) -> DataFrame:
    """Connected components by min-label propagation to a fixed point.

    ``nodes`` must have a ``node`` column, ``edges`` columns ``a``/``b``
    (one row per edge; symmetrized here). Labels start as the node id and
    only ever decrease, so the label sum is strictly decreasing until the
    fixed point — one ``collect()`` per round (carrying the previous sum)
    detects convergence. ``localCheckpoint`` truncates lineage each round,
    the standard shape for iterative graph algorithms on Spark. Raises
    ``RuntimeError`` if ``max_iters`` rounds pass without convergence
    (graph diameter exceeds the cap) rather than returning a partially
    converged labeling.
    """
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # Restrict message targets to the declared node set ONCE, before the
    # loop: without this, a b-node present only in `edges` would enter
    # via labels.union(msgs) and survive to the output — the result
    # would not be a labeling of `nodes`. (a-nodes outside `nodes` are
    # harmless: they never acquire a label, so they send no messages.)
    und = und.join(
        nodes.select(F.col("node").alias("b")), "b", "left_semi"
    ).cache()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_iters):
        msgs = und.join(labels, und.a == labels.node).select(
            F.col("b").alias("node"), F.col("label")
        )
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"min_label_propagation did not converge within {max_iters} iterations; "
            "the graph diameter exceeds the cap — raise max_iters"
        )
    return labels


@register("dedup_connected_components", oracle=_CC_SQL)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    labels = min_label_propagation(nodes, edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (two unrolled rounds, exact oracle).
# Rank sums are cross-row float additions, so contributions are cast to
# DECIMAL(25,12) before summing (associative ⇒ partition-order-free; the
# double→decimal rounding agrees across engines for real-valued data —
# same convention as the embedding centroids). Damping 0.85, uniform
# teleport over all documents; dangling docs receive teleport mass but
# contribute none (documented simplification — no dangling
# redistribution). Output is the normalized rank r·N (≈1.0 scale, so
# rounding to 6 decimals is scale-free).
# ---------------------------------------------------------------------------

_PR_DAMP = 0.85
# The teleport term is computed ONCE in Python and interpolated into both
# engines: SQL text "(1 - 0.85)" would evaluate in DuckDB's exact DECIMAL
# arithmetic (0.15 → double 0.1499999999999999944) while Python float
# 1 - 0.85 = 0.15000000000000002 — a 2-ulp divergence that ROUND(·, 6)
# only *usually* absorbs. repr() round-trips the exact double and
# CAST(... AS DOUBLE) re-parses it correctly rounded.
_PR_TELEPORT = 1 - _PR_DAMP

_PR_SQL = (
    _SIG_SQL
    + f""",
bands AS (
    SELECT doc_id,
           i // {_BAND_ROWS} AS band,
           {sql_hash60("array_to_string(list(minhash ORDER BY i), '_')")} AS bucket
    FROM sig
    GROUP BY doc_id, i // {_BAND_ROWS}
),
bands_rn AS (
    SELECT doc_id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_rn a JOIN bands_rn b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.rn <= {_BAND_ANCHORS} OR b.rn <= {_BAND_ANCHORS}
),
est AS (
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE)
               / {_N_HASHES} AS est_jaccard
    FROM candidates c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM est WHERE est_jaccard >= {_EST_THRESHOLD}
),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
deg AS (SELECT a, COUNT(*) AS deg FROM und GROUP BY a),
r1 AS (
    SELECT d.doc_id,
           CAST({_PR_TELEPORT!r} AS DOUBLE) / n.n + {_PR_DAMP} * COALESCE(m.s, 0.0) AS r
    FROM documents d CROSS JOIN n
    LEFT JOIN (
        SELECT u.b AS doc_id,
               CAST(SUM(CAST((1.0 / n.n) / deg.deg AS DECIMAL(25,12))) AS DOUBLE) AS s
        FROM und u JOIN deg ON deg.a = u.a CROSS JOIN n
        GROUP BY u.b
    ) m ON m.doc_id = d.doc_id
),
r2 AS (
    SELECT d.doc_id,
           CAST({_PR_TELEPORT!r} AS DOUBLE) / n.n + {_PR_DAMP} * COALESCE(m.s, 0.0) AS r
    FROM documents d CROSS JOIN n
    LEFT JOIN (
        SELECT u.b AS doc_id,
               CAST(SUM(CAST(r1.r / deg.deg AS DECIMAL(25,12))) AS DOUBLE) AS s
        FROM und u
        JOIN deg ON deg.a = u.a
        JOIN r1 ON r1.doc_id = u.a
        GROUP BY u.b
    ) m ON m.doc_id = d.doc_id
)
SELECT r2.doc_id, ROUND(r2.r * n.n, 6) AS norm_rank
FROM r2 CROSS JOIN n
"""
)


@register("pagerank_neardup_two_rounds", oracle=_PR_SQL)
def pagerank_neardup_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # One materialization of the (small) edge list serves degree counts
    # and both propagation rounds.
    und = session_cache(und)
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    n_row = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))

    # Rank values are only ever CONSUMED at edge-source nodes (the
    # round-2 contribution joins rank on "a", inner), so the docs-wide
    # rank frame need not exist between rounds — evaluating the rank
    # expression tp/n + damp*coalesce(s, 0.0) directly on the edge row
    # (s left-joined per source) is the same IEEE arithmetic the old
    # docs-wide left join produced, row for row. The full docs frame
    # appears exactly once, at the final output expansion. This drops
    # two docs-wide intermediates and three joins from the plan.
    w = und.join(deg, "a")  # (a, b, deg) — tiny joins off the cache
    s1 = (
        w.crossJoin(broadcast(n_row))
        .select(
            F.col("b").alias("doc_id"),
            ((F.lit(1.0) / F.col("n")) / F.col("deg"))
            .cast("decimal(25,12)")
            .alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").cast("double").alias("s"))
    )
    s2 = (
        w.join(s1.withColumnRenamed("doc_id", "a"), "a", "left")
        .crossJoin(broadcast(n_row))
        .select(
            F.col("b").alias("doc_id"),
            (
                (
                    _PR_TELEPORT / F.col("n")
                    + _PR_DAMP * F.coalesce(F.col("s"), F.lit(0.0))
                )
                / F.col("deg")
            )
            .cast("decimal(25,12)")
            .alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").cast("double").alias("s"))
    )
    r2 = (
        docs.crossJoin(broadcast(n_row))
        .join(s2, "doc_id", "left")
        .select(
            "doc_id",
            "n",
            (
                _PR_TELEPORT / F.col("n")
                + _PR_DAMP * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("r"),
        )
    )
    return r2.select(
        "doc_id", F.round(F.col("r") * F.col("n"), 6).alias("norm_rank")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup PAIRS: the second half of the simhash pipeline —
# candidates from band bucketing (two signatures within Hamming
# distance ≤ 3 must agree on at least one of 4 bands, the pigeonhole
# guarantee), verified with bit_count(xor). Never an n² self-join: cost
# is Σ bucket² over band buckets.
#
# Band width AUTO-SCALES with the corpus (round-2 knob removed): with
# band_bits ≈ ceil(log2(n)) there are ~n buckets per band, so the
# expected per-band candidate count stays ~n·(n/2^band_bits) ≈ O(n)
# instead of growing n²/buckets. Both engines derive it from the SAME
# integer formula — Python (n-1).bit_length() ≡ SQL LENGTH(bin(n-1))
# for n ≥ 2 (and both clamp to the floor at n ≤ 1) — clamped to
# [8, 15]: floor 8 keeps tiny test corpora from degenerating into a
# few giant buckets; cap 15 keeps the 4-band signature inside a BIGINT
# (4 × 15 = 60 bits). The Hamming radius (3) and band count (4) are
# fixed by the pigeonhole guarantee, not by scale.
# ---------------------------------------------------------------------------

_SIMHASH_HAMMING_MAX = 3
_SIMHASH_BANDS = _SIMHASH_HAMMING_MAX + 1
_SIMHASH_MIN_BAND_BITS = 8
_SIMHASH_MAX_BAND_BITS = 15


def _auto_band_bits(n_docs: int) -> int:
    """ceil(log2(n)) clamped to [8, 15]; exact-integer, engine-portable."""
    raw = (max(n_docs, 1) - 1).bit_length()
    return min(_SIMHASH_MAX_BAND_BITS, max(_SIMHASH_MIN_BAND_BITS, raw))

_SIMHASH_PAIRS_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id, {sql_hash60('token')} AS h FROM tok
),
params AS (
    SELECT LEAST({_SIMHASH_MAX_BAND_BITS}, GREATEST({_SIMHASH_MIN_BAND_BITS},
           LENGTH(bin(COUNT(*) - 1)))) AS band_bits
    FROM documents
),
bits AS (
    SELECT doc_id, g.j,
           SUM(CASE WHEN (h >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM hashed,
         (SELECT UNNEST(range({_SIMHASH_BANDS} * {_SIMHASH_MAX_BAND_BITS})) AS j) g,
         params p
    WHERE g.j < {_SIMHASH_BANDS} * p.band_bits
    GROUP BY doc_id, g.j
),
sig AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash, g.b AS band,
           (simhash >> (p.band_bits * g.b)) & ((CAST(1 AS BIGINT) << p.band_bits) - 1) AS bucket
    FROM sig, (SELECT UNNEST(range({_SIMHASH_BANDS})) AS b) g, params p
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS sig_a, b.simhash AS sig_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(CAST(xor(sig_a, sig_b) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(sig_a, sig_b) AS BIGINT)) <= {_SIMHASH_HAMMING_MAX}
"""


# Below this corpus size the per-bit explode signature form wins: the
# n_bits-column aggregate pays a fixed whole-stage-codegen compile cost
# (a 61-wide generated aggregate class) that dominates small corpora
# (round-8 reconciliation of the r7 base-scale regression: 5k docs
# benched 1.42 s explode vs 2.85 s agg; the 50k-doc 10× twin benched
# 8.1 s explode vs 6.4 s agg). Both forms are bit-identical — the vote
# law is vote_j > 0 ⟺ 2·set_count_j > n_tokens — so this is a pure
# plan-time physical choice, same precedent as _auto_band_bits.
_SIMHASH_AGG_FORM_MIN_DOCS = 20_000


def _simhash_signatures(
    docs: DataFrame, n_bits: int, n_docs: Optional[int] = None
) -> DataFrame:
    """Vote-packed simhash of the given width over the 60-bit token hash.

    Two bit-identical physical forms, selected by corpus size when the
    caller passes ``n_docs`` (every registered caller already counts the
    corpus for ``_auto_band_bits``):

    - **agg form** (large corpora, the 100 TB path): one aggregate with
      n_bits set-bit-count columns — keeps the token frame at its
      natural size, shuffles once on doc_id, packs the majority votes
      in a single projection. The explode form multiplied token rows by
      n_bits (measured 6.8 s of dedup_simhash_pairs' 8.1 s at the 10x
      twin just building signatures).
    - **explode form** (small corpora): (token × bit) explode with a
      two-stage vote aggregate — 60× the rows, but trivial per-row work
      and none of the wide aggregate's fixed codegen cost.
    """
    docs = spread(docs)
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    hashed = tokens.select("doc_id", hash60("token").alias("h"))
    if n_docs is not None and n_docs < _SIMHASH_AGG_FORM_MIN_DOCS:
        bits = hashed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("j"),
            "h",
        )
        votes = bits.groupBy("doc_id", "j").agg(
            F.sum(
                F.when(F.expr("shiftright(h, j) & 1") == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
            ).alias("vote")
        )
        return votes.groupBy("doc_id").agg(
            F.sum(
                F.when(
                    F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")
                ).otherwise(F.lit(0))
            ).alias("simhash")
        )
    # Two set-bit counters per aggregate, packed into one BIGINT's
    # 32-bit halves (round-14, §2.3): per row the term is
    # bit_j + bit_{j+half}·2^32, so the sum carries count_j in the low
    # word and count_{j+half} in the high word with NO cross-carry —
    # a counter is bounded by the doc's token count, and one document
    # is one Spark string (≤ 2 GiB), so n_tokens/doc < 2^31 < 2^32 and
    # the packed sum stays < 2^63. Halves the aggregate-buffer width
    # (n_bits+1 → n_bits/2+1 longs) — fewer partial-agg shuffle bytes
    # per doc — and halves the generated-aggregate codegen size, the
    # fixed cost that motivated the explode form above.
    half = n_bits // 2
    pair_terms = [
        F.expr(
            f"(shiftright(h, {j}) & 1) + shiftleft(shiftright(h, {j + half}) & 1, 32)"
        )
        for j in range(half)
    ]
    odd_terms = (
        [F.expr(f"shiftright(h, {n_bits - 1}) & 1")] if n_bits % 2 else []
    )
    counts = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(t).alias(f"_p{j}") for j, t in enumerate(pair_terms)],
        *[F.sum(t).alias("_podd") for t in odd_terms],
    )

    def _cnt(j: int) -> Column:
        if n_bits % 2 and j == n_bits - 1:
            return F.col("_podd")
        if j < half:
            return F.col(f"_p{j}").bitwiseAND(F.lit(0xFFFFFFFF))
        return F.expr(f"shiftright(_p{j - half}, 32)")

    packed = None
    for j in range(n_bits):
        bit = F.when(
            _cnt(j) * 2 > F.col("_n"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed + bit
    return counts.select("doc_id", packed.alias("simhash"))


def _simhash_band_join(
    docs: DataFrame, band_bits: int, n_docs: Optional[int] = None
) -> DataFrame:
    """Raw band-bucket collision pairs BEFORE the pair distinct:
    (doc_a, doc_b, sig_a, sig_b) with up to one row per shared band."""
    sig = _simhash_signatures(docs, _SIMHASH_BANDS * band_bits, n_docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "bucket",
        F.expr(f"shiftright(simhash, {band_bits} * band)") % (1 << band_bits),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sig_a"),
        F.col("b.simhash").alias("sig_b"),
    )


def _simhash_band_candidates(
    docs: DataFrame, band_bits: int, n_docs: Optional[int] = None
) -> DataFrame:
    """Distinct band-bucket collision pairs (the pre-verify candidate
    set) — exposed separately so scale tests can assert the candidate
    count stays bounded as the corpus grows."""
    return _simhash_band_join(docs, band_bits, n_docs).dropDuplicates(
        ["doc_a", "doc_b"]
    )


def simhash_near_dup_pairs(
    docs: DataFrame, band_bits: int, n_docs: Optional[int] = None
) -> DataFrame:
    """Banded simhash near-dup pairs at an explicit band width; the
    registered query derives ``band_bits`` from the corpus count.

    The Hamming verify runs BEFORE the pair distinct (round-13, guide
    §2.3/§2.4): signatures are functions of the document, so every
    duplicate of a (doc_a, doc_b) collision carries the same sig pair
    and filter-then-distinct equals distinct-then-filter — but the
    band join emits one row per SHARED BAND, and hot 2^band_bits
    buckets are dominated by mere bit-prefix collisions, not near-dups
    (measured at the 10x scratch: 26.7M raw collision rows, 209k
    surviving pairs — 0.8%). Filtering first shrinks the distinct's
    shuffle by that factor. The optimizer cannot do this move itself:
    it may not push a non-key-column predicate below a Deduplicate
    whose non-key values it cannot prove constant per key."""
    raw = _simhash_band_join(docs, band_bits, n_docs)
    hamming = F.bit_count(F.expr("sig_a ^ sig_b")).cast("long")
    return (
        raw.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


@register("dedup_simhash_pairs", oracle=_SIMHASH_PAIRS_SQL)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # One tiny count action at plan time sets the band width (and the
    # signature physical form); the oracle's `params` CTE computes the
    # identical band integer.
    n_docs = docs.count()
    band_bits = _auto_band_bits(n_docs)
    return simhash_near_dup_pairs(docs, band_bits, n_docs)


# ---------------------------------------------------------------------------
# Incremental near-dup: the production corpus-update pattern — a batch
# of NEW documents (here: doc_id % 10 == 0 simulates the delta) is
# checked against the WHOLE corpus through the band index, emitting
# only pairs that involve a new document. Cost is Σ (new-in-bucket ×
# bucket), not a full-corpus self-join: appending 1% of docs costs ~1%
# of the full dedup, which is what makes daily corpus refreshes viable
# at 100 TB.
# ---------------------------------------------------------------------------

_INCR_SQL = (
    _SIG_SQL
    + f""",
bands AS (
    SELECT doc_id,
           i // {_BAND_ROWS} AS band,
           {sql_hash60("array_to_string(list(minhash ORDER BY i), '_')")} AS bucket
    FROM sig
    GROUP BY doc_id, i // {_BAND_ROWS}
),
bands_rn AS (
    SELECT doc_id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands
),
candidates AS (
    SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS other_doc
    FROM bands_rn n JOIN bands_rn o
      ON n.band = o.band AND n.bucket = o.bucket AND n.doc_id <> o.doc_id
    WHERE n.doc_id % 10 = 0
      AND (n.rn <= {_BAND_ANCHORS} OR o.rn <= {_BAND_ANCHORS})
),
est AS (
    SELECT c.new_doc, c.other_doc,
           CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE)
               / {_N_HASHES} AS est_jaccard
    FROM candidates c
    JOIN sig sa ON sa.doc_id = c.new_doc
    JOIN sig sb ON sb.doc_id = c.other_doc AND sb.i = sa.i
    GROUP BY c.new_doc, c.other_doc
)
SELECT new_doc, other_doc, est_jaccard
FROM est WHERE est_jaccard >= {_EST_THRESHOLD}
"""
)


@register("dedup_minhash_incremental", oracle=_INCR_SQL)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                hash60(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(b * _BAND_ROWS, (b + 1) * _BAND_ROWS)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(_N_HASHES // _BAND_ROWS)
        ]
    )
    bands = _bands_with_anchor_rank(
        sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
            "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
    )
    new_bands = bands.filter(F.col("doc_id") % 10 == 0).alias("n")
    all_bands = bands.alias("o")
    candidates = (
        new_bands.join(
            all_bands,
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bucket") == F.col("o.bucket"))
            & (F.col("n.doc_id") != F.col("o.doc_id"))
            & ((F.col("n.rn") <= _BAND_ANCHORS) | (F.col("o.rn") <= _BAND_ANCHORS)),
        )
        .select(F.col("n.doc_id").alias("new_doc"), F.col("o.doc_id").alias("other_doc"))
        .dropDuplicates()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    agreement = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(_N_HASHES)
    )
    est = (
        candidates.join(sa, F.col("new_doc") == F.col("sa.doc_id"))
        .join(sb, F.col("other_doc") == F.col("sb.doc_id"))
        .select(
            "new_doc",
            "other_doc",
            F.round(agreement.cast("double") / _N_HASHES, 6).alias("est_jaccard"),
        )
    )
    return est.filter(F.col("est_jaccard") >= _EST_THRESHOLD)


# ---------------------------------------------------------------------------
# Corpus hygiene metric: per-source duplication rates — exact (full
# content hash) AND boilerplate (shared leading 5-token prefix, the
# crawl heuristic for template/boilerplate reuse). Two key columns from
# one scan, two count tables, two hash-keyed joins — all map-side
# combinable, no hot keys beyond genuine dup clusters. Exact-dup mass
# only exists from sf0.1 up in the testdata; the prefix rate binds at
# every SF, so the driver gate always sees live signal in this table.
# ---------------------------------------------------------------------------

_BOILER_PREFIX_TOKENS = 5
_BOILER_PREFIX_EXPR = (
    r"array_to_string(string_split_regex(TRIM(text), '\s+')"
    + f"[1:{_BOILER_PREFIX_TOKENS}], ' ')"
)

_DUP_RATE_SQL = rf"""
WITH h AS (
    SELECT doc_id, source, {sql_hash60('text')} AS ch,
           {sql_hash60(_BOILER_PREFIX_EXPR)} AS ph
    FROM documents
),
counts AS (
    SELECT ch, COUNT(*) AS n FROM h GROUP BY ch
),
pcounts AS (
    SELECT ph, COUNT(*) AS pn FROM h GROUP BY ph
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       ROUND(CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac,
       CAST(SUM(CASE WHEN p.pn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_docs,
       ROUND(CAST(SUM(CASE WHEN p.pn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS boiler_frac
FROM h JOIN counts c USING (ch) JOIN pcounts p USING (ph)
GROUP BY source
"""


@register("dedup_rate_by_source", oracle=_DUP_RATE_SQL)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, _BOILER_PREFIX_TOKENS)
    )
    h = session_cache(
        docs.select(
            "doc_id",
            "source",
            hash60("text").alias("ch"),
            hash60(prefix).alias("ph"),
        )
    )
    counts = h.groupBy("ch").agg(F.count(F.lit(1)).alias("n"))
    pcounts = h.groupBy("ph").agg(F.count(F.lit(1)).alias("pn"))
    is_dup = F.when(F.col("n") > 1, 1).otherwise(0)
    is_boiler = F.when(F.col("pn") > 1, 1).otherwise(0)
    return (
        h.join(counts, "ch")
        .join(pcounts, "ph")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(is_dup).alias("n_dup_docs"),
            F.round(F.sum(is_dup).cast("double") / F.count(F.lit(1)), 6).alias(
                "dup_frac"
            ),
            F.sum(is_boiler).alias("n_boiler_docs"),
            F.round(F.sum(is_boiler).cast("double") / F.count(F.lit(1)), 6).alias(
                "boiler_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Survivorship: dedup_exact tells you WHICH hashes collide; this emits
# the per-document verdict a pipeline actually writes back — every doc
# tagged with its cluster, the canonical survivor (longest text, doc_id
# tie-break), and whether it is kept. One window over the content-hash
# partition: same single-shuffle cost as the groupBy, but the output is
# row-aligned with the corpus so the downstream filter is a plain
# `WHERE kept`.
# ---------------------------------------------------------------------------

_CANONICAL_SQL = f"""
WITH h AS (
    SELECT doc_id, n_chars, {sql_hash60('text')} AS content_hash FROM documents
)
SELECT doc_id, content_hash,
       FIRST_VALUE(doc_id) OVER w AS canonical_doc_id,
       doc_id = FIRST_VALUE(doc_id) OVER w AS kept,
       COUNT(*) OVER (PARTITION BY content_hash) AS cluster_size
FROM h
WINDOW w AS (
    PARTITION BY content_hash ORDER BY n_chars DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register("dedup_cluster_canonical", oracle=_CANONICAL_SQL)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "n_chars", hash60("text").alias("content_hash"))
    w = (
        Window.partitionBy("content_hash")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("content_hash")
    canonical = F.first("doc_id").over(w)
    return h.select(
        "doc_id",
        "content_hash",
        canonical.alias("canonical_doc_id"),
        (F.col("doc_id") == canonical).alias("kept"),
        F.count(F.lit(1)).over(wc).alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# Multi-probe simhash (the NEXT.md §4 extension): besides each band's
# exact bucket, every 1-bit flip of the bucket is probed. Pigeonhole:
# with 4 bands, a pair within Hamming distance ≤ 2·4−1 = 7 must have
# some band with ≤ 1 differing bit — caught by a flip probe — so the
# detection radius grows from 3 to 7 without narrower bands. Cost is a
# (band_bits+1)× larger PROBE side only; the exact-bucket build side is
# unchanged, the same asymmetry LSH multi-probe exploits (probe lists
# are generated, never materialized per bucket). XOR symmetry means
# probing one side of each pair suffices.
# ---------------------------------------------------------------------------

_SIMHASH_MP_HAMMING_MAX = 2 * _SIMHASH_BANDS - 1  # detection guarantee
# Reporting threshold: pairs at Hamming <= 5 are what a near-dup pass
# acts on; since 5 < the detection radius 7, the reported set is
# provably COMPLETE (no missed pair), unlike single-probe at radius 3.
_SIMHASH_MP_REPORT_MAX = 5
# Bucket-occupancy cap on the BUILD side — the LSH hot-bucket skew
# guard (same principle as the shingle _auto_max_df cap): low-entropy corpora
# concentrate signatures, and probing multiplies every over-full
# bucket's quadratic collision mass by (band_bits+1). Buckets over the
# cap are excluded from the build side (probes into them find
# nothing); their members remain findable through their other bands
# and probes. Measured at a 10x replica corpus: 160M -> bounded
# candidates. The cap exceeds every bucket's occupancy at the oracle
# SFs (max 78), so the completeness proof at the reporting radius is
# unaffected there; the oracle applies the identical HAVING cap.
_SIMHASH_MP_MAX_BUCKET = 128

_SIMHASH_MP_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id, {sql_hash60('token')} AS h FROM tok
),
params AS (
    SELECT LEAST({_SIMHASH_MAX_BAND_BITS}, GREATEST({_SIMHASH_MIN_BAND_BITS},
           LENGTH(bin(COUNT(*) - 1)))) AS band_bits
    FROM documents
),
bits AS (
    SELECT doc_id, g.j,
           SUM(CASE WHEN (h >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM hashed,
         (SELECT UNNEST(range({_SIMHASH_BANDS} * {_SIMHASH_MAX_BAND_BITS})) AS j) g,
         params p
    WHERE g.j < {_SIMHASH_BANDS} * p.band_bits
    GROUP BY doc_id, g.j
),
sig AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
),
bands AS (
    SELECT doc_id, g.b AS band,
           (simhash >> (p.band_bits * g.b)) & ((CAST(1 AS BIGINT) << p.band_bits) - 1) AS bucket
    FROM sig, (SELECT UNNEST(range({_SIMHASH_BANDS})) AS b) g, params p
),
bands_ok AS (
    SELECT b.doc_id, b.band, b.bucket
    FROM bands b
    JOIN (
        SELECT band, bucket FROM bands
        GROUP BY band, bucket HAVING COUNT(*) <= {_SIMHASH_MP_MAX_BUCKET}
    ) ok USING (band, bucket)
),
probes AS (
    SELECT doc_id, band, bucket FROM bands
    UNION ALL
    SELECT doc_id, band, xor(bucket, CAST(1 AS BIGINT) << g.i) AS bucket
    FROM bands, (SELECT UNNEST(range({_SIMHASH_MAX_BAND_BITS})) AS i) g, params p
    WHERE g.i < p.band_bits
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM probes a JOIN bands_ok b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(CAST(xor(sa.simhash, sb.simhash) AS BIGINT)) AS BIGINT) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(CAST(xor(sa.simhash, sb.simhash) AS BIGINT)) <= {_SIMHASH_MP_REPORT_MAX}
"""


@register("dedup_simhash_multiprobe", oracle=_SIMHASH_MP_SQL)
def dedup_simhash_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    band_bits = _auto_band_bits(n_docs)
    # Signature table is consumed by band build, probe build, and the
    # two verify joins — cache once, release via the harness.
    sig = session_cache(
        _simhash_signatures(docs, _SIMHASH_BANDS * band_bits, n_docs)
    )
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BANDS - 1))).alias("band"),
        "simhash",
    ).select(
        "doc_id",
        "band",
        (
            F.expr(f"shiftright(simhash, {band_bits} * band)") % (1 << band_bits)
        ).alias("bucket"),
    )
    # band_bits is fixed at plan time, so the probe set (identity + one
    # flip per bit) is a literal array — generated per row, never stored.
    probe_set = F.array(
        F.col("bucket"), *[F.expr(f"bucket ^ {1 << i}") for i in range(band_bits)]
    )
    probes = bands.select(
        "doc_id", "band", F.explode(probe_set).alias("bucket")
    )
    # Two-phase hot-bucket guard: count-first, semi-join — the
    # over-capacity bucket's membership is never materialized.
    ok = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") <= _SIMHASH_MP_MAX_BUCKET)
        .select("band", "bucket")
    )
    bands_ok = bands.join(ok, ["band", "bucket"], "left_semi")
    a, b = probes.alias("a"), bands_ok.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.expr("sig_a ^ sig_b")).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _SIMHASH_MP_REPORT_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# MinHash calibration audit: for every LSH candidate pair, the
# signature-estimated Jaccard NEXT TO the true shingle-set Jaccard and
# the absolute error — the table you read before trusting a k=8
# signature at corpus scale (is the estimator biased? how wide is the
# band-collision noise floor?). True Jaccard is computed only for the
# banding's candidate pairs, so the exact-set intersection join costs
# Σ per-pair |shingle set|, never corpus².
# ---------------------------------------------------------------------------

_CALIB_SQL = (
    _SIG_SQL
    + f""",
bands AS (
    SELECT doc_id,
           i // {_BAND_ROWS} AS band,
           {sql_hash60("array_to_string(list(minhash ORDER BY i), '_')")} AS bucket
    FROM sig
    GROUP BY doc_id, i // {_BAND_ROWS}
),
bands_rn AS (
    SELECT doc_id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands
),
candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands_rn a JOIN bands_rn b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE a.rn <= {_BAND_ANCHORS} OR b.rn <= {_BAND_ANCHORS}
),
hset AS (
    SELECT DISTINCT doc_id, {sql_hash60('shingle')} AS sh FROM shingled
),
sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM hset GROUP BY doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
    FROM candidates c
    JOIN hset a ON a.doc_id = c.doc_a
    JOIN hset b ON b.doc_id = c.doc_b AND b.sh = a.sh
    GROUP BY c.doc_a, c.doc_b
),
est AS (
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS DOUBLE)
                 / {_N_HASHES}, 6) AS est_jaccard
    FROM candidates c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
    GROUP BY c.doc_a, c.doc_b
)
SELECT e.doc_a, e.doc_b, e.est_jaccard,
       ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (za.sz + zb.sz - COALESCE(i.n_inter, 0)), 6) AS true_jaccard,
       ROUND(ABS(e.est_jaccard
                 - ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                         / (za.sz + zb.sz - COALESCE(i.n_inter, 0)), 6)), 6) AS abs_err
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
"""
)


@register("dedup_minhash_calibration", oracle=_CALIB_SQL)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hs = session_cache(_hashed_shingles(docs))
    sig = session_cache(_minhash_columns(hs))
    candidates = session_cache(_minhash_band_candidates(sig))
    est = _minhash_estimates(candidates, sig)
    sizes = hs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        candidates.join(
            hs.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a"
        )
        .join(
            hs.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"]
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0))
    true_j = F.round(
        n_inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - n_inter), 6
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            true_j.alias("true_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - true_j), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# CROSS-METHOD AGREEMENT AUDIT: the MinHash-LSH pair set vs the banded
# SimHash pair set, full-outer joined on the (doc_a, doc_b) key and
# rolled up per method label — the acceptance check a production corpus
# runs before switching dedup methods (or to pick verify thresholds):
# 'both' is the consensus core, each '_only' bucket is one method's
# blind spot relative to the other. Jaccard-LSH sees shingle overlap;
# simhash sees token-multiset proximity — the disagreement rows are
# exactly where those notions diverge.
#
# Scale: both inputs are already bucket-bounded candidate pipelines (no
# all-pairs anywhere); the audit adds one join keyed on pairs and a
# 3-group rollup. Oracle: both full CTE chains nested as named
# subqueries (DuckDB scopes each chain's WITH privately).
# ---------------------------------------------------------------------------

_AGREEMENT_SQL = f"""
WITH mh AS ({_LSH_SQL}),
sh AS ({_SIMHASH_PAIRS_SQL})
SELECT CASE WHEN sh.doc_a IS NULL THEN 'minhash_only'
            WHEN mh.doc_a IS NULL THEN 'simhash_only'
            ELSE 'both' END AS method,
       COUNT(*) AS n_pairs
FROM mh FULL OUTER JOIN sh
  ON mh.doc_a = sh.doc_a AND mh.doc_b = sh.doc_b
GROUP BY method
"""


@register("dedup_method_agreement", oracle=_AGREEMENT_SQL)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    mh = (
        _minhash_estimates(_minhash_band_candidates(sig), sig)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select("doc_a", "doc_b", F.lit(1).alias("in_mh"))
    )
    _n = docs.count()
    sh = simhash_near_dup_pairs(docs, _auto_band_bits(_n), _n).select(
        "doc_a", "doc_b", F.lit(1).alias("in_sh")
    )
    joined = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    method = (
        F.when(F.col("in_sh").isNull(), "minhash_only")
        .when(F.col("in_mh").isNull(), "simhash_only")
        .otherwise("both")
    )
    return joined.groupBy(method.alias("method")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# Near-dup graph cohesion audit: edge count, wedge count (open
# two-paths), triangle count, and the global clustering coefficient of
# the MinHash-LSH near-dup graph. High clustering = duplicates arrive
# in tight families (transitive closure is safe); low clustering =
# chains of marginal matches (closure would over-merge) — the number a
# corpus team reads before trusting connected-components dedup.
#
# Scale: edges are the bucket-bounded LSH pair set (never all-pairs);
# triangles come from one edge-edge join on the shared endpoint then a
# semi-check join against the closing edge — both keyed on node ids.
# Degrees/wedges are constant-size aggregation buffers. Canonical
# a<b edge orientation makes each triangle counted exactly once
# (a<b<c), identical in the oracle.
# ---------------------------------------------------------------------------

_TRIANGLES_SQL = f"""
WITH mh AS ({_LSH_SQL}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM mh
),
deg AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
    GROUP BY node
),
tri AS (
    SELECT COUNT(*) AS n_tri
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       CAST((SELECT SUM((d * (d - 1)) // 2) FROM deg) AS BIGINT) AS n_wedges,
       (SELECT n_tri FROM tri) AS n_triangles,
       ROUND(3.0 * (SELECT n_tri FROM tri)
             / CAST((SELECT SUM((d * (d - 1)) // 2) FROM deg) AS DOUBLE),
             6) AS clustering_coeff
"""


@register("dedup_graph_triangles", oracle=_TRIANGLES_SQL)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    edges = session_cache(
        _minhash_estimates(_minhash_band_candidates(sig), sig)
        .filter(F.col("est_jaccard") >= _EST_THRESHOLD)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("n_wedges")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    n_tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        n_edges.crossJoin(broadcast(n_wedges))
        .crossJoin(broadcast(n_tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges").cast("double"), 6
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring (span) dedup — the "dedup at the substring level" pass
# of LLM training-data pipelines (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499). The
# published method finds all ≥50-token substrings shared between any two
# documents with a suffix array; the distributed re-expression below
# finds all K-token spans (positional n-grams) whose exact text occurs
# in ≥2 distinct documents, then reports per-document how many token
# positions are covered by at least one such shared span — the quantity
# the original uses to cut duplicated text. K=8 here (the fixture docs
# are ~25-40 tokens; production would use the paper's 50).
#
# Scale shape (100 TB): span hashing is one map-only stage (row-local
# higher-order functions, no Python); "which spans are shared" is ONE
# count-style aggregation on 8-byte hashes — never a pair join, so a
# stop-gram span shared by every document costs O(df) counter updates,
# not O(df²) join rows. Coverage is computed ROW-LOCALLY per document
# (collect_list of span starts is bounded by document length, then
# flatten/array_distinct inside the row), so the only shuffles are the
# two hash-keyed aggregations and the final doc_id join.
# Extends the family at plans/dedup.py:60-140 (shingle conventions);
# reference has no analog (its dedup surface is `unique()`,
# flows/bronze.py:80).
# ---------------------------------------------------------------------------

_SPAN_K = 8

# Shared CTE block: tokenized docs → positional K-gram hashes
# (doc_id, pos, h). Consumed by both span-family oracles; the Spark
# twin is ``_span_hashes``.
_SPAN_CTES = rf"""tok AS (
    SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS toks FROM documents
),
spans AS (
    SELECT doc_id, pos,
           {sql_hash60(f"array_to_string(toks[pos:pos+{_SPAN_K - 1}], ' ')")} AS h
    FROM (
        SELECT doc_id, toks,
               UNNEST(range(1, GREATEST(LENGTH(toks) - {_SPAN_K - 1}, 0) + 1)) AS pos
        FROM tok
    )
)"""


def _span_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): positional K-gram hashes, one row per span —
    the Spark twin of ``_SPAN_CTES``. Empty for docs shorter than K
    (the WHEN guard keeps ``sequence()`` from producing a descending
    range). Map-only: row-local higher-order functions, no shuffle."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    idx = F.when(n >= _SPAN_K, F.sequence(F.lit(1), n - (_SPAN_K - 1))).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(
        idx, lambda i: hash60(F.concat_ws(" ", F.slice(toks, i, _SPAN_K)))
    )
    return (
        spread(docs)
        .select("doc_id", F.posexplode(hashes).alias("pos0", "h"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )


_EXACT_SUBSTR_SQL = (
    "WITH "
    + _SPAN_CTES
    + f""",
base AS (
    SELECT doc_id,
           LENGTH(toks) AS n_tokens,
           GREATEST(LENGTH(toks) - {_SPAN_K - 1}, 0) AS n_spans
    FROM tok
),
shared AS (
    SELECT h FROM (SELECT DISTINCT h, doc_id FROM spans)
    GROUP BY h HAVING COUNT(*) >= 2
),
dups AS (
    SELECT s.doc_id, s.pos FROM spans s JOIN shared USING (h)
),
cov AS (
    SELECT doc_id,
           COUNT(DISTINCT pos) AS n_dup_spans,
           COUNT(DISTINCT p) AS n_dup_positions
    FROM (
        SELECT doc_id, pos, UNNEST(range(pos, pos + {_SPAN_K})) AS p FROM dups
    )
    GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_tokens,
       b.n_spans,
       COALESCE(c.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(c.n_dup_positions, 0) AS n_dup_positions,
       ROUND(COALESCE(c.n_dup_positions, 0) / CAST(b.n_tokens AS DOUBLE), 6)
           AS dup_coverage
FROM base b LEFT JOIN cov c USING (doc_id)
"""
)


@register("dedup_exact_substring", oracle=_EXACT_SUBSTR_SQL)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    base = docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.greatest(n - (_SPAN_K - 1), F.lit(0)).cast("long").alias("n_spans"),
    )
    spans = _span_hashes(docs)
    # Shared-span keys: the per-document DISTINCT runs ROW-LOCALLY
    # (``array_distinct`` on the span-hash array before the explode)
    # instead of as a ``dropDuplicates`` shuffle of the full span
    # frame — a document's span set fits one row, so deduplicating it
    # never needs the cluster (round-13 optimization; the same move
    # _hashed_shingles made for the jaccard family, guide §2.4). The
    # df aggregation is then ONE shuffle whose per-key cost for a hot
    # span stays linear in its document frequency.
    span_hash_arr = F.when(
        n >= _SPAN_K,
        F.transform(
            F.sequence(F.lit(1), n - (_SPAN_K - 1)),
            lambda i: hash60(F.concat_ws(" ", F.slice(toks, i, _SPAN_K))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    shared = (
        spread(docs)
        .select(F.explode(F.array_distinct(span_hash_arr)).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("h")
    )
    dups = spans.join(shared, "h").select("doc_id", "pos")
    # Row-local interval union: a document's dup-span start list fits one
    # row (bounded by doc length), so coverage never needs the cluster.
    cov = dups.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.collect_list("pos"),
                        lambda p: F.sequence(p, p + (_SPAN_K - 1)),
                    )
                )
            )
        )
        .cast("long")
        .alias("n_dup_positions"),
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.coalesce(F.col("n_dup_spans"), F.lit(0).cast("long")).alias("n_dup_spans"),
        F.coalesce(F.col("n_dup_positions"), F.lit(0).cast("long")).alias(
            "n_dup_positions"
        ),
        F.round(
            F.coalesce(F.col("n_dup_positions"), F.lit(0).cast("long"))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_coverage"),
    )


# ---------------------------------------------------------------------------
# Asymmetric containment pairs: |A∩B| / |A| (and / |B|) over the same
# capped shingle inverted index as ngram-Jaccard. Jaccard misses the
# "small doc quoted inside a big doc" case (the union term drowns it);
# containment is the standard fix (Broder's resemblance/containment
# pair). Same scale shape as dedup_ngram_jaccard: candidates only ever
# come from df≤cap inverted-index lists, never a pair join.
# ---------------------------------------------------------------------------

_CONTAIN_THRESHOLD = 0.5

_CONTAIN_SQL = (
    _SHINGLES_SQL
    + ",\n"
    + _PAIR_CTES
    + f"""
SELECT doc_a, doc_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / sa.n_shingles, 6) AS containment_a,
       ROUND(CAST(n_common AS DOUBLE) / sb.n_shingles, 6) AS containment_b
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / sa.n_shingles >= {_CONTAIN_THRESHOLD}
   OR CAST(n_common AS DOUBLE) / sb.n_shingles >= {_CONTAIN_THRESHOLD}
"""
)


@register("dedup_containment_pairs", oracle=_CONTAIN_SQL)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs where either direction of shingle-set containment ≥ 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    pairs, sizes = _capped_pair_counts(docs)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    ca = F.col("n_common").cast("double") / F.col("sa.n_shingles")
    cb = F.col("n_common").cast("double") / F.col("sb.n_shingles")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter((ca >= _CONTAIN_THRESHOLD) | (cb >= _CONTAIN_THRESHOLD))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# Longest common token run per near-dup pair: distributed
# longest-common-substring over positional K-grams. Two positions match
# when their K-token spans hash equal; consecutive matches lie on the
# same DIAGONAL (pos_a - pos_b), so the longest shared substring is the
# longest consecutive island per (pair, diagonal) — a gaps-and-islands
# window over many tiny groups, fully parallel. Candidates come from
# span hashes shared by 2..cap docs, with a per-(doc, hash) position cap
# so self-repetitive text ("a a a a ...") cannot go quadratic.
# ---------------------------------------------------------------------------

_MAX_POS_PER_DOC = 20

_LCS_SQL = (
    "WITH "
    + _SPAN_CTES
    + f""",
capped AS (
    SELECT doc_id, pos, h FROM spans
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, h ORDER BY pos) <= {_MAX_POS_PER_DOC}
),
okh AS (
    SELECT h FROM (SELECT DISTINCT h, doc_id FROM capped)
    GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {_SQL_MAX_DF}
),
kept AS (
    SELECT c.doc_id, c.pos, c.h FROM capped c JOIN okh USING (h)
),
matches AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
    FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
),
isl AS (
    SELECT doc_a, doc_b, pos_a - pos_b AS d, pos_a,
           pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
           ) AS grp
    FROM matches
),
runs AS (
    SELECT doc_a, doc_b, COUNT(*) AS run FROM isl GROUP BY doc_a, doc_b, d, grp
),
best AS (
    SELECT doc_a, doc_b, MAX(run) AS max_run FROM runs GROUP BY doc_a, doc_b
),
pairstats AS (
    SELECT doc_a, doc_b, COUNT(*) AS n_shared_spans FROM matches GROUP BY doc_a, doc_b
)
SELECT p.doc_a, p.doc_b,
       CAST(b.max_run + {_SPAN_K - 1} AS BIGINT) AS longest_common_tokens,
       p.n_shared_spans
FROM pairstats p JOIN best b USING (doc_a, doc_b)
"""
)


@register("dedup_longest_common_run", oracle=_LCS_SQL)
def dedup_longest_common_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    spans = _span_hashes(docs)
    # Per-(doc, hash) position cap: row-count window over tiny groups.
    wcap = Window.partitionBy("doc_id", "h").orderBy("pos")
    capped = session_cache(
        spans.withColumn("rp", F.row_number().over(wcap))
        .filter(F.col("rp") <= _MAX_POS_PER_DOC)
        .drop("rp")
    )
    max_df = _auto_max_df(docs.count())
    okh = (
        capped.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("h")
    )
    # Row-local pair generation from per-hash (doc,pos) lists — list
    # size is bounded by cap(df) × cap(positions), so one shuffle
    # replaces the self-join.
    lists = (
        capped.join(okh, "h", "left_semi")
        .groupBy("h")
        .agg(F.collect_list(F.struct("doc_id", "pos")).alias("ds"))
    )
    pair_structs = F.expr(
        """
        filter(
          flatten(transform(ds, a -> transform(ds, b ->
            struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pos_a, b.pos AS pos_b)))),
          p -> p.doc_a < p.doc_b)
        """
    )
    matches = session_cache(
        lists.select(F.explode(pair_structs).alias("p")).select(
            "p.doc_a", "p.doc_b", "p.pos_a", "p.pos_b"
        )
    )
    d = (F.col("pos_a") - F.col("pos_b")).alias("d")
    wisl = Window.partitionBy("doc_a", "doc_b", "d").orderBy("pos_a")
    runs = (
        matches.select("doc_a", "doc_b", d, "pos_a")
        .withColumn("grp", F.col("pos_a") - F.row_number().over(wisl))
        .groupBy("doc_a", "doc_b", "d", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    best = runs.groupBy("doc_a", "doc_b").agg(
        (F.max("run") + (_SPAN_K - 1)).cast("long").alias("longest_common_tokens")
    )
    pairstats = matches.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared_spans")
    )
    return pairstats.join(best, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "longest_common_tokens", "n_shared_spans"
    )


# ---------------------------------------------------------------------------
# Span-dedup as a CURATION FILTER: drop documents whose duplicated-span
# token coverage exceeds 50% (the action Lee et al. take on flagged
# spans, lifted to the document level), reporting per-language
# retention. Composes the shared _span_hashes/_SPAN_CTES machinery; the
# keep/drop ratio is a double computed identically by both engines from
# exact integer counts, so the boundary is deterministic.
# ---------------------------------------------------------------------------

_SPAN_FILTER_MAX_COV = 0.5

_SPAN_FILTER_SQL = (
    "WITH "
    + _SPAN_CTES
    + f""",
base AS (
    SELECT doc_id, lang,
           LENGTH(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS n_tokens
    FROM documents
),
shared AS (
    SELECT h FROM (SELECT DISTINCT h, doc_id FROM spans)
    GROUP BY h HAVING COUNT(*) >= 2
),
cov AS (
    SELECT doc_id, COUNT(DISTINCT p) AS n_dup_positions
    FROM (
        SELECT s.doc_id, UNNEST(range(s.pos, s.pos + {_SPAN_K})) AS p
        FROM spans s JOIN shared USING (h)
    )
    GROUP BY doc_id
),
flagged AS (
    SELECT b.lang, b.n_tokens,
           COALESCE(c.n_dup_positions, 0) / CAST(b.n_tokens AS DOUBLE)
               <= {_SPAN_FILTER_MAX_COV} AS keep
    FROM base b LEFT JOIN cov c USING (doc_id)
)
SELECT lang,
       COUNT(*) AS n_docs_total,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       ROUND(1.0 - SUM(CASE WHEN keep THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS drop_rate
FROM flagged GROUP BY lang
"""
)


@register("corpus_span_dedup_filter", oracle=_SPAN_FILTER_SQL)
def corpus_span_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select("doc_id", "lang", F.size(toks).cast("long").alias("n_tokens"))
    spans = _span_hashes(docs)
    shared = (
        spans.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("h")
    )
    cov = (
        spans.join(shared, "h")
        .groupBy("doc_id")
        .agg(
            F.size(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.collect_list("pos"),
                            lambda p: F.sequence(p, p + (_SPAN_K - 1)),
                        )
                    )
                )
            )
            .cast("long")
            .alias("n_dup_positions")
        )
    )
    keep = (
        F.coalesce(F.col("n_dup_positions"), F.lit(0)).cast("double")
        / F.col("n_tokens")
        <= _SPAN_FILTER_MAX_COV
    )
    flagged = base.join(cov, "doc_id", "left").select("lang", "n_tokens", keep.alias("keep"))
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_docs_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("tokens_kept"),
        F.round(
            1.0
            - F.sum(F.when(F.col("keep"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("drop_rate"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter: drop corpus documents whose
# normalized content may belong to a reference blocklist (held-out
# benchmark fingerprints, takedown set, already-ingested shard) WITHOUT
# joining the full corpus against the full reference — the standard
# first gate before an exact semi-join at 100 TB.
#
# The filter is modeled as its SET OF SET BITS: k=2 positions per
# reference fingerprint in an m-bit address space, m auto-scaled to
# 8-16 bits per reference entry so the false-positive rate
# (1 - e^(-kn/m))^k stays ~2-5 % at every corpus scale. Candidates
# probe via a broadcast join on position and hit only when ALL their
# positions are set. The query then audits the filter against the
# exact semi-join: per candidate source, bloom hits vs true members vs
# false positives — the accuracy contract is part of the result, so
# the oracle pins the filter's behavior bit-for-bit, not just its
# happy path.
#
# Scale shape: the reference side reduces to ≤ m distinct 8-byte
# positions (a broadcast, like any blocklist); the corpus side is one
# narrow projection + k-way position explode + broadcast probe — no
# corpus-side shuffle at all until the final tiny per-source rollup.
# On a real cluster the position set would pack into a byte-array
# broadcast variable; the position-set join used here is semantically
# identical and lets DuckDB verify every bit.
# ---------------------------------------------------------------------------

_BLOOM_K = 2
_BLOOM_SHIFT = 3  # m = 2^(ceil_log2(n_ref) + 3): 8-16 bits/entry
_BLOOM_REF_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_BLOOM_FP_NORM = r"regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')"


def _bloom_m(n_ref: int) -> int:
    """m = 2^(⌈log2 n⌉ + 3), exact-integer and engine-portable
    (mirrored by the oracle's ``params`` CTE)."""
    return 1 << ((max(n_ref, 2) - 1).bit_length() + _BLOOM_SHIFT)


_BLOOM_REF_IN = ", ".join(f"'{s}'" for s in _BLOOM_REF_SOURCES)
_BLOOM_POS = sql_hash60("CAST(fp AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
_BLOOM_SQL = f"""
WITH ref AS (
    SELECT DISTINCT {sql_hash60(_BLOOM_FP_NORM)} AS fp
    FROM documents WHERE source IN ({_BLOOM_REF_IN})
),
params AS (
    SELECT 1 << (LENGTH(bin(GREATEST(COUNT(*), 2) - 1)) + {_BLOOM_SHIFT}) AS m
    FROM ref
),
bits AS (
    SELECT DISTINCT {_BLOOM_POS} % m AS pos
    FROM ref, params, (VALUES (0), (1)) AS ks(i)
),
cand AS (
    SELECT doc_id, source, {sql_hash60(_BLOOM_FP_NORM)} AS fp
    FROM documents WHERE source NOT IN ({_BLOOM_REF_IN})
),
cpos AS (
    SELECT doc_id, source, fp, {_BLOOM_POS} % m AS pos
    FROM cand, params, (VALUES (0), (1)) AS ks(i)
),
per_doc AS (
    SELECT c.doc_id, c.source, c.fp,
           SUM(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END) = 0 AS bloom_hit
    FROM cpos c LEFT JOIN bits b USING (pos)
    GROUP BY 1, 2, 3
),
flagged AS (
    SELECT p.source, p.bloom_hit, (r.fp IS NOT NULL) AS is_member
    FROM per_doc p LEFT JOIN ref r USING (fp)
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos,
       ROUND(CAST(SUM(CASE WHEN bloom_hit AND NOT is_member THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(COUNT(*) - SUM(CASE WHEN is_member THEN 1 ELSE 0 END), 0), 6)
           AS fp_rate
FROM flagged
GROUP BY source
"""


@register("dedup_bloom_prefilter", oracle=_BLOOM_SQL)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = hash60(normalized)
    ref = (
        docs.filter(F.col("source").isin(*_BLOOM_REF_SOURCES))
        .select(fp.alias("fp"))
        .distinct()
    )
    # One tiny count action at plan time sizes the filter (the SimHash
    # band-bits / jaccard DF-cap calibration pattern); the reference
    # fingerprint set is reused by position build and the exact audit.
    ref = session_cache(ref)
    m = _bloom_m(ref.count())

    def positions(fp_col: Column) -> Column:
        return F.array(
            *[
                F.pmod(
                    hash60(F.concat(fp_col.cast("string"), F.lit(f":{i}"))),
                    F.lit(m),
                )
                for i in range(_BLOOM_K)
            ]
        )

    bits = ref.select(F.explode(positions(F.col("fp"))).alias("pos")).distinct()
    cand = docs.filter(~F.col("source").isin(*_BLOOM_REF_SOURCES)).select(
        "doc_id", "source", fp.alias("fp")
    )
    cpos = cand.select(
        "doc_id", "source", "fp", F.explode(positions(F.col("fp"))).alias("pos")
    )
    # `bits` has up to k*|ref| distinct set positions and `ref` is the
    # reference corpus itself — both grow with the data, so neither gets
    # a forced broadcast hint (round-10 extension of the round-9
    # verdict's rule: a real deployment's bloom side may be a bounded
    # benchmark set, but the PLAN must not assume it). AQE broadcasts
    # when runtime stats allow; otherwise these are equi-shuffle joins.
    probed = cpos.join(bits.withColumn("hit", F.lit(1)), "pos", "left")
    per_doc = probed.groupBy("doc_id", "source", "fp").agg(
        (F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)) == 0).alias("bloom_hit")
    )
    flagged = per_doc.join(
        ref.withColumn("is_member", F.lit(True)), "fp", "left"
    ).select(
        "source", "bloom_hit", F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member")
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long").alias("n_bloom_hits"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_bloom_hits",
        "n_members",
        "n_false_pos",
        F.round(
            F.col("n_false_pos").cast("double")
            / F.expr("nullif(n_docs - n_members, 0)"),
            6,
        ).alias("fp_rate"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (round 6) — corpus forensics: which
# SOURCES duplicate each other? Every MinHash-LSH near-dup pair is
# labeled with its endpoints' sources (canonical ordering so (a,b) and
# (b,a) are one cell) and rolled up to a source x source matrix with
# the mean estimated Jaccard per cell. Off-diagonal mass = mirror
# sites / syndication / cross-posting; diagonal mass = within-source
# boilerplate. The number a crawl team reads before deciding which
# feed to drop.
#
# Scale: O(near-dup pairs) on top of the existing bucket-bounded LSH
# pipeline, plus two joins against a (doc_id, source) projection —
# narrow build side, map-side combinable rollup. Never all-pairs.
# ---------------------------------------------------------------------------

_SOURCE_CROSSRATE_SQL = f"""
WITH mh AS ({_LSH_SQL}),
src AS (
    SELECT doc_id, source FROM documents
),
labeled AS (
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           m.est_jaccard
    FROM mh m
    JOIN src sa ON sa.doc_id = m.doc_a
    JOIN src sb ON sb.doc_id = m.doc_b
)
SELECT source_a, source_b,
       COUNT(*) AS n_pairs,
       {sql_davg("est_jaccard", "mean_est_jaccard")}
FROM labeled GROUP BY source_a, source_b
"""


@register("dedup_source_crossrate", oracle=_SOURCE_CROSSRATE_SQL)
def dedup_source_crossrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = session_cache(_minhash_columns(_hashed_shingles(docs)))
    pairs = _minhash_estimates(_minhash_band_candidates(sig), sig).filter(
        F.col("est_jaccard") >= _EST_THRESHOLD
    )
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.withColumnRenamed("source", "sa"), pairs.doc_a == src.doc_id)
        .drop("doc_id")
        .join(
            src.withColumnRenamed("source", "sb").withColumnRenamed(
                "doc_id", "doc_id_b"
            ),
            F.col("doc_b") == F.col("doc_id_b"),
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "est_jaccard",
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        davg("est_jaccard", "mean_est_jaccard"),
    )


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) self-join on the part-name dimension — the
# entity-resolution shape: block on discriminative character 3-grams,
# verify candidates with exact Levenshtein ≤ 2. The blocking trade is
# explicit and oracle-checked: a pair is found iff it shares at least
# one 3-gram whose document frequency is ≤ _FUZZY_MAX_DF distinct
# names (hot grams like a ubiquitous suffix are useless as blocking
# keys AND are what makes naive gram-joins quadratic — dropping them
# bounds pair mass at O(names · df_cap), the same principle as the
# shingle _auto_max_df cap). The length-difference ≤ k prefilter is a
# lower bound on edit distance, applied before the O(len²) verify.
#
# Scale notes: the join runs on the DEDUPLICATED name dimension
# (name vocabulary ≪ part rows — groupBy collapses the fact table
# first), grams shuffle as short strings, and the final Levenshtein
# verify touches only surviving candidates.
# ---------------------------------------------------------------------------

_FUZZY_MAX_DF = 32
_FUZZY_MAX_DIST = 2

_FUZZY_SQL = f"""
WITH names AS (
    SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part GROUP BY p_name
),
grams AS (
    SELECT DISTINCT name,
           UNNEST(list_transform(range(1, LENGTH(name) - 1),
                                 i -> substr(name, CAST(i AS INT), 3))) AS g
    FROM names
),
keep AS (
    SELECT g FROM grams GROUP BY g
    HAVING COUNT(DISTINCT name) <= {_FUZZY_MAX_DF}
),
cand AS (
    SELECT DISTINCT a.name AS name_a, b.name AS name_b
    FROM grams a
    JOIN keep USING (g)
    JOIN grams b USING (g)
    WHERE a.name < b.name
      AND ABS(LENGTH(a.name) - LENGTH(b.name)) <= {_FUZZY_MAX_DIST}
)
SELECT c.name_a, c.name_b,
       CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS edit_dist,
       na.n_parts AS n_parts_a,
       nb.n_parts AS n_parts_b
FROM cand c
JOIN names na ON na.name = c.name_a
JOIN names nb ON nb.name = c.name_b
WHERE levenshtein(c.name_a, c.name_b) <= {_FUZZY_MAX_DIST}
"""


@register("dedup_fuzzy_name_join", oracle=_FUZZY_SQL)
def dedup_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    grams = names.select(
        "name",
        F.explode(
            F.expr("transform(sequence(1, length(name) - 2), i -> substring(name, i, 3))")
        ).alias("g"),
    ).dropDuplicates(["name", "g"])
    keep = grams.groupBy("g").agg(F.countDistinct("name").alias("df")).filter(
        F.col("df") <= _FUZZY_MAX_DF
    ).select("g")
    # Explicit-width pins on the Levenshtein pair stage (plan-gate rule
    # 6, the round-12 AQE hazard class): the optimizer pushes the
    # edit-distance predicate below the dropDuplicates into the pair
    # join itself (it is a function of the grouping keys), so BOTH the
    # join stage and the distinct aggregate evaluate levenshtein — and
    # AQE sizes both by input bytes (a few MB of short name pairs),
    # coalescing an O(len²)-per-pair stage onto one core. A pinned
    # ``repartition(width, ...)`` is contractually non-coalescible;
    # neither pin adds an Exchange (the g-pin replaces the join's own
    # exchange on ga's side, the pair-pin replaces the aggregate's).
    width = spark.sparkContext.defaultParallelism
    ga = (
        grams.join(keep, "g")
        .select("g", F.col("name").alias("name_a"))
        .repartition(width, "g")
    )
    gb = grams.select("g", F.col("name").alias("name_b"))
    cand = (
        ga.join(gb, "g")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= _FUZZY_MAX_DIST
            )
        )
        .select("name_a", "name_b")
        .repartition(width, "name_a", "name_b")
        .dropDuplicates()
    )
    verified = cand.withColumn(
        "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("edit_dist") <= _FUZZY_MAX_DIST)
    na = names.select(F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    nb = names.select(F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    return verified.join(na, "name_a").join(nb, "name_b").select(
        "name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b"
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup audit — the rsync/LBFS/FastCDC
# primitive: chunk boundaries are set where a rolling content hash
# hits a modulus (here: 60-bit md5 hash of each 8-char window, divisor
# 64 → ~64-char expected chunks), so an insertion shifts ONE chunk's
# boundaries instead of re-aligning every fixed-width block — the
# property that makes chunk-hash stores (CAS, backup dedup, blob
# tiering) byte-shift-robust. The audit chunks the corpus, hashes
# chunk contents, and reports the storage win exact-arithmetically:
# bytes_dedup / bytes_total if every duplicate chunk were stored once.
#
# Scale shape: boundary detection and chunk hashing are one map-only
# stage inside whole-stage codegen (per-position md5 over higher-order
# array functions — no explode until chunks exist, no Python); the
# only shuffle is the chunk-hash aggregate, keyed on 60-bit hashes.
# Production CDC uses a Gear/Rabin rolling hash for O(1) per-position
# updates; md5-per-window is the engine-portable stand-in with the
# identical boundary statistics (the oracle shares it verbatim).
# ---------------------------------------------------------------------------

_CDC_WIN = 8      # rolling window (chars)
_CDC_DIV = 64     # boundary divisor → expected chunk length

_CDC_CHUNK_SQL = f"""
WITH pos AS (
    SELECT doc_id, text,
           list_prepend(CAST(1 AS BIGINT),
             list_append(
               list_filter(range(1, GREATEST(LENGTH(text) - {_CDC_WIN - 2}, 2)),
                 i -> (CAST('0x' || substr(md5(substr(text, CAST(i AS INT), {_CDC_WIN})), 1, 15)
                            AS BIGINT) % {_CDC_DIV}) = 0),
               CAST(LENGTH(text) + 1 AS BIGINT))) AS b
    FROM documents
),
spans AS (
    SELECT doc_id, text,
           UNNEST(list_transform(range(len(b) - 1),
                  j -> {{'st': b[CAST(j AS INT) + 1],
                         'ln': b[CAST(j AS INT) + 2] - b[CAST(j AS INT) + 1]}})) AS s
    FROM pos
),
chunks AS (
    SELECT doc_id, s.ln AS ln,
           CAST('0x' || substr(md5(substr(text, CAST(s.st AS INT), CAST(s.ln AS INT))), 1, 15)
                AS BIGINT) AS ch
    FROM spans WHERE s.ln > 0
),
per_hash AS (
    SELECT ch, MIN(ln) AS ln1, COUNT(DISTINCT doc_id) AS ndocs
    FROM chunks GROUP BY ch
)
SELECT
  (SELECT COUNT(DISTINCT doc_id) FROM chunks) AS n_docs,
  (SELECT COUNT(*) FROM chunks) AS n_chunks,
  (SELECT COUNT(*) FROM per_hash) AS n_distinct_chunks,
  (SELECT COUNT(*) FROM per_hash WHERE ndocs > 1) AS n_shared_chunks,
  (SELECT CAST(SUM(ln) AS BIGINT) FROM chunks) AS bytes_total,
  (SELECT CAST(SUM(ln1) AS BIGINT) FROM per_hash) AS bytes_dedup,
  (SELECT ROUND(SUM(ln1) / (SELECT CAST(SUM(ln) AS DOUBLE) FROM chunks), 6)
     FROM per_hash) AS dedup_ratio
"""


def _cdc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, ln, ch): content-defined chunk spans
    hashed to 60 bits. Shared by the corpus audit and the incremental
    ingest audit; all expression-level (codegen), explode only after
    spans exist."""
    win, div = _CDC_WIN, _CDC_DIV
    bounds = (
        f"concat(array(1), "
        # sequence() is end-INCLUSIVE where the oracle's range() is
        # exclusive: stop one earlier so both scan full windows 1..len-7.
        f"filter(sequence(1, greatest(length(text) - {win - 1}, 1)), "
        f"i -> cast(conv(substring(md5(substring(text, i, {win})), 1, 15), 16, 10) as bigint) "
        f"% {div} = 0), array(length(text) + 1))"
    )
    spans = (
        "filter(transform(sequence(0, size(b) - 2), "
        "j -> struct(element_at(b, j + 1) as st, "
        "element_at(b, j + 2) - element_at(b, j + 1) as ln)), s -> s.ln > 0)"
    )
    return (
        docs.withColumn("b", F.expr(bounds))
        .select("doc_id", "text", F.explode(F.expr(spans)).alias("s"))
        .select(
            "doc_id",
            F.col("s.ln").cast("long").alias("ln"),
            hash60(F.expr("substring(text, s.st, s.ln)")).alias("ch"),
        )
    )


@register("dedup_content_chunks", oracle=_CDC_CHUNK_SQL)
def dedup_content_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    chunks = _cdc_chunks(docs)
    per_hash = chunks.groupBy("ch").agg(
        F.min("ln").alias("ln1"), F.countDistinct("doc_id").alias("ndocs")
    )
    tot = chunks.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("ln").alias("bytes_total"),
    )
    ded = per_hash.agg(
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).cast("long").alias(
            "n_shared_chunks"
        ),
        F.sum("ln1").alias("bytes_dedup"),
    )
    return (
        tot.crossJoin(broadcast(ded))
        .withColumn(
            "dedup_ratio",
            F.round(F.col("bytes_dedup") / F.col("bytes_total").cast("double"), 6),
        )
        .select(
            "n_docs", "n_chunks", "n_distinct_chunks", "n_shared_chunks",
            "bytes_total", "bytes_dedup", "dedup_ratio",
        )
    )


# ---------------------------------------------------------------------------
# Incremental (daily-ingest) CDC audit: yesterday's corpus is the chunk
# store; today's arrivals chunk with the SAME boundary rule, and every
# chunk whose hash already exists in the store costs zero new bytes —
# the blob-tier twin of pipeline_daily_increment's document-level pass.
# Split: doc_id % 10 ≥ 8 is today's delta (same convention family as
# the minhash incremental). The store probe is a broadcast-friendly
# semi-join on 60-bit hashes; nothing rescans yesterday's text.
# ---------------------------------------------------------------------------

_CDC_BNDS_SQL = f"""
    list_prepend(CAST(1 AS BIGINT),
      list_append(
        list_filter(range(1, GREATEST(LENGTH(text) - {_CDC_WIN - 2}, 2)),
          i -> (CAST('0x' || substr(md5(substr(text, CAST(i AS INT), {_CDC_WIN})), 1, 15)
                     AS BIGINT) % {_CDC_DIV}) = 0),
        CAST(LENGTH(text) + 1 AS BIGINT)))
"""

_CDC_INCR_SQL = f"""
WITH pos AS (
    SELECT doc_id, text, {_CDC_BNDS_SQL} AS b FROM documents
),
spans AS (
    SELECT doc_id, text,
           UNNEST(list_transform(range(len(b) - 1),
                  j -> {{'st': b[CAST(j AS INT) + 1],
                         'ln': b[CAST(j AS INT) + 2] - b[CAST(j AS INT) + 1]}})) AS s
    FROM pos
),
chunks AS (
    SELECT doc_id, s.ln AS ln,
           CAST('0x' || substr(md5(substr(text, CAST(s.st AS INT), CAST(s.ln AS INT))), 1, 15)
                AS BIGINT) AS ch
    FROM spans WHERE s.ln > 0
),
store AS (SELECT DISTINCT ch FROM chunks WHERE doc_id % 10 < 8),
delta AS (SELECT * FROM chunks WHERE doc_id % 10 >= 8),
fresh AS (
    SELECT ch, MIN(ln) AS ln1 FROM delta
    WHERE ch NOT IN (SELECT ch FROM store) GROUP BY ch
)
SELECT
  (SELECT COUNT(DISTINCT doc_id) FROM delta) AS n_delta_docs,
  (SELECT COUNT(*) FROM delta) AS n_delta_chunks,
  (SELECT COUNT(*) FROM delta WHERE ch IN (SELECT ch FROM store))
      AS n_reused_chunks,
  (SELECT COUNT(*) FROM fresh) AS n_new_unique_chunks,
  (SELECT CAST(SUM(ln) AS BIGINT) FROM delta) AS bytes_delta,
  (SELECT CAST(COALESCE(SUM(ln1), 0) AS BIGINT) FROM fresh) AS bytes_new,
  (SELECT ROUND(1.0 - COALESCE((SELECT SUM(ln1) FROM fresh), 0)
                      / (SELECT CAST(SUM(ln) AS DOUBLE) FROM delta), 6))
      AS ingest_savings
"""


@register("dedup_cdc_incremental", oracle=_CDC_INCR_SQL)
def dedup_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    chunks = session_cache(_cdc_chunks(docs))
    store = chunks.filter(F.col("doc_id") % 10 < 8).select("ch").distinct()
    delta = chunks.filter(F.col("doc_id") % 10 >= 8)
    reused = delta.join(store, "ch", "left_semi")
    fresh = (
        delta.join(store, "ch", "left_anti")
        .groupBy("ch")
        .agg(F.min("ln").alias("ln1"))
    )
    d_tot = delta.agg(
        F.countDistinct("doc_id").alias("n_delta_docs"),
        F.count(F.lit(1)).alias("n_delta_chunks"),
        F.sum("ln").alias("bytes_delta"),
    )
    r_tot = reused.agg(F.count(F.lit(1)).alias("n_reused_chunks"))
    f_tot = fresh.agg(
        F.count(F.lit(1)).alias("n_new_unique_chunks"),
        F.coalesce(F.sum("ln1"), F.lit(0)).cast("long").alias("bytes_new"),
    )
    return (
        d_tot.crossJoin(broadcast(r_tot))
        .crossJoin(broadcast(f_tot))
        .withColumn(
            "ingest_savings",
            F.round(
                F.lit(1.0) - F.col("bytes_new") / F.col("bytes_delta").cast("double"), 6
            ),
        )
        .select(
            "n_delta_docs", "n_delta_chunks", "n_reused_chunks",
            "n_new_unique_chunks", "bytes_delta", "bytes_new", "ingest_savings",
        )
    )


# ---------------------------------------------------------------------------
# Wide-band SimHash pairs — the documented escape hatch beyond the
# 15-bit band cap (NEXT.md r7 #1): a 120-bit signature from two salted
# 60-bit token hashes, packed into TWO BIGINT words, banded 4 × 30
# bits. With 2^30 buckets per band the banding stays unsaturated to
# ~10^9 docs per shuffle partition-space — band collisions are true
# near-identicals (Hamming ≤ 3 over 120 bits by the pigeonhole rule),
# so no anchor cap is needed where the 60-bit variant's 15-bit bands
# degenerate on >32k-doc near-dup neighborhoods (SCALING.md Round 7
# §3). Costs 2× the signature arithmetic of dedup_simhash_pairs and
# nothing else.
# ---------------------------------------------------------------------------

_SIMHASH2_BITS = 120
_SIMHASH2_BAND_BITS = 30
_SIMHASH2_SALT = "#w2"

_SIMHASH2_PAIRS_SQL = rf"""
WITH tok AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS token
    FROM documents
),
hashed AS (
    SELECT doc_id, {sql_hash60('token')} AS h1,
           {sql_hash60("token || '" + _SIMHASH2_SALT + "'")} AS h2
    FROM tok
),
bits AS (
    SELECT doc_id, g.j,
           SUM(CASE WHEN (CASE WHEN g.j < 60 THEN (h1 >> g.j) & 1
                          ELSE (h2 >> (g.j - 60)) & 1 END) = 1
                    THEN 1 ELSE -1 END) AS vote
    FROM hashed, (SELECT UNNEST(range({_SIMHASH2_BITS})) AS j) g
    GROUP BY doc_id, g.j
),
sig AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 AND j < 60
                         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS w0,
           CAST(SUM(CASE WHEN vote > 0 AND j >= 60
                         THEN (CAST(1 AS BIGINT) << (j - 60)) ELSE 0 END) AS BIGINT) AS w1
    FROM bits GROUP BY doc_id
),
bands AS (
    SELECT doc_id, w0, w1, g.k,
           CASE WHEN g.k < 2
                THEN (w0 >> ({_SIMHASH2_BAND_BITS} * g.k)) & {2**_SIMHASH2_BAND_BITS - 1}
                ELSE (w1 >> ({_SIMHASH2_BAND_BITS} * (g.k - 2))) & {2**_SIMHASH2_BAND_BITS - 1}
           END AS bucket
    FROM sig, (SELECT UNNEST(range(4)) AS k) g
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.w0 AS a0, a.w1 AS a1, b.w0 AS b0, b.w1 AS b1
    FROM bands a JOIN bands b
      ON a.k = b.k AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(CAST(xor(a0, b0) AS BIGINT))
            + bit_count(CAST(xor(a1, b1) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(a0, b0) AS BIGINT))
      + bit_count(CAST(xor(a1, b1) AS BIGINT)) <= {_SIMHASH_HAMMING_MAX}
"""


def _simhash_wide_band_candidates(
    docs: DataFrame, n_docs: Optional[int] = None
) -> DataFrame:
    """Distinct 30-bit-band collision pairs of the 120-bit wide-band
    path (pre-verify candidate set) — exposed separately so the scale
    test can pin the candidate count under the quadratic envelope at
    the 10x twin, the same contract as _simhash_band_candidates
    (round-8, VERDICT r7 #6).

    Signature build mirrors :func:`_simhash_signatures` (round-14):
    the same small-corpus explode form / large-corpus packed-counter
    agg form split, selected by ``n_docs`` when the caller passes it —
    both bit-identical (vote_j > 0 ⟺ 2·set_count_j > n_tokens). The
    wide variant previously always took the agg form and paid its full
    fixed codegen cost (a 121-wide generated aggregate, ~40 s of pure
    plan/compile at sf0.001) even on corpora a thousandth of its
    design point."""
    docs = spread(docs)
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    hashed = tokens.select(
        "doc_id",
        hash60("token").alias("h1"),
        hash60(F.concat(F.col("token"), F.lit(_SIMHASH2_SALT))).alias("h2"),
    )
    if n_docs is not None and n_docs < _SIMHASH_AGG_FORM_MIN_DOCS:
        # Explode form (small corpora): (token × bit) rows, two-stage
        # ±1 vote aggregate — exactly the oracle's ``bits`` CTE.
        bits = hashed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH2_BITS - 1))).alias("j"),
            "h1",
            "h2",
        )
        votes = bits.groupBy("doc_id", "j").agg(
            F.sum(
                F.when(
                    F.expr(
                        "CASE WHEN j < 60 THEN shiftright(h1, j) & 1"
                        " ELSE shiftright(h2, j - 60) & 1 END"
                    )
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias("vote")
        )
        sig = votes.groupBy("doc_id").agg(
            F.sum(
                F.when(
                    (F.col("vote") > 0) & (F.col("j") < 60),
                    F.expr("shiftleft(CAST(1 AS BIGINT), j)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("w0"),
            F.sum(
                F.when(
                    (F.col("vote") > 0) & (F.col("j") >= 60),
                    F.expr("shiftleft(CAST(1 AS BIGINT), j - 60)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("w1"),
        )
    else:
        # Agg form: packed set-bit counters, two 32-bit fields per
        # BIGINT (see _simhash_signatures for the no-carry proof) —
        # 61 aggregate buffers instead of 121, half the partial-agg
        # shuffle bytes per doc and half the generated-aggregate size.
        pair_terms = [
            F.expr(
                f"(shiftright(h1, {j}) & 1)"
                f" + shiftleft(shiftright(h1, {j + 30}) & 1, 32)"
            )
            for j in range(30)
        ] + [
            F.expr(
                f"(shiftright(h2, {j}) & 1)"
                f" + shiftleft(shiftright(h2, {j + 30}) & 1, 32)"
            )
            for j in range(30)
        ]
        counts = hashed.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(t).alias(f"_p{j}") for j, t in enumerate(pair_terms)],
        )

        # Packed layout: _p0.._p29 carry h1 bits (j, j+30); _p30.._p59
        # carry h2 bits (j-60, j-30) for j in 60..119.
        def _cnt(j: int) -> Column:
            word, b = divmod(j, 60)
            grp = word * 30
            if b < 30:
                return F.col(f"_p{grp + b}").bitwiseAND(F.lit(0xFFFFFFFF))
            return F.expr(f"shiftright(_p{grp + b - 30}, 32)")

        w0 = None
        w1 = None
        for j in range(60):
            bit = F.when(
                _cnt(j) * 2 > F.col("_n"), F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            w0 = bit if w0 is None else w0 + bit
        for j in range(60, 120):
            bit = F.when(
                _cnt(j) * 2 > F.col("_n"), F.lit(1 << (j - 60)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            w1 = bit if w1 is None else w1 + bit
        sig = counts.select("doc_id", w0.alias("w0"), w1.alias("w1"))
    mask = 2**_SIMHASH2_BAND_BITS - 1
    bands = sig.select(
        "doc_id",
        "w0",
        "w1",
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
    ).withColumn(
        "bucket",
        F.when(
            F.col("k") < 2,
            F.expr(f"shiftright(w0, {_SIMHASH2_BAND_BITS} * k)"),
        )
        .otherwise(F.expr(f"shiftright(w1, {_SIMHASH2_BAND_BITS} * (k - 2))"))
        .bitwiseAND(F.lit(mask)),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.w0").alias("a0"),
            F.col("a.w1").alias("a1"),
            F.col("b.w0").alias("b0"),
            F.col("b.w1").alias("b1"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand


@register("dedup_simhash_wide_pairs", oracle=_SIMHASH2_PAIRS_SQL)
def dedup_simhash_wide_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # One metadata-backed count selects the physical signature form
    # (the _auto_band_bits precedent — results are form-independent).
    cand = _simhash_wide_band_candidates(docs, docs.count())
    hamming = (
        F.bit_count(F.expr("a0 ^ b0")) + F.bit_count(F.expr("a1 ^ b1"))
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Shingle document-frequency profile — the audit BEHIND the `_MAX_DF`
# hot-shingle guard: the df distribution of the shingle inverted index
# in floor-log2 buckets, with each bucket's postings mass and the exact
# postings the active cap drops. A corpus team reads this before
# trusting the cap (is the dropped mass boilerplate or signal?); the
# cap itself is the same plan-time integer every dedup oracle mirrors.
# Floor-log2 via the LENGTH(bin(df))-1 bit-length identity (ln()
# remains banned). One shingle pass, one bounded aggregate.
# ---------------------------------------------------------------------------

_DF_PROFILE_SQL = rf"""
{_SHINGLES_SQL},
hashed AS (
    SELECT doc_id, {sql_hash60('shingle')} AS sh FROM shingled
),
df AS (
    SELECT sh, COUNT(*) AS df FROM hashed GROUP BY sh
)
SELECT CAST(LENGTH(bin(df)) - 1 AS BIGINT) AS log2_df_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(df) AS BIGINT) AS n_postings,
       CAST(SUM(CASE WHEN df > {_SQL_MAX_DF} THEN df ELSE 0 END) AS BIGINT)
           AS n_postings_capped,
       CAST(MAX(df) AS BIGINT) AS df_max
FROM df
GROUP BY 1
ORDER BY 1
"""


@register("dedup_shingle_df_profile", oracle=_DF_PROFILE_SQL)
def dedup_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    max_df = _auto_max_df(docs.count())
    df = _hashed_shingles(docs).groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    bucket = (F.length(F.bin(F.col("df"))) - 1).cast("long")
    return (
        df.groupBy(bucket.alias("log2_df_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum(F.when(F.col("df") > max_df, F.col("df")).otherwise(0))
            .cast("long")
            .alias("n_postings_capped"),
            F.max("df").cast("long").alias("df_max"),
        )
        .orderBy("log2_df_bucket")
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram — the first chart of every dedup
# report: exact-duplicate cluster sizes (full-content hash groups) in
# floor-log2 buckets with the removable-excess mass (size − 1 per
# cluster: the rows a keep-one dedup deletes). Cluster-level output by
# design (the output-mass-is-plan-mass rule) — cluster count per
# bucket, never expanded pairs. One hash aggregate + one bounded
# rollup; the content hash shuffles 8-byte keys, not text.
# ---------------------------------------------------------------------------

_CLUSTER_HIST_SQL = f"""
WITH clusters AS (
    SELECT {sql_hash60('text')} AS content_hash, COUNT(*) AS sz
    FROM documents GROUP BY 1
)
SELECT CAST(LENGTH(bin(sz)) - 1 AS BIGINT) AS log2_size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz - 1) AS BIGINT) AS n_removable,
       CAST(MAX(sz) AS BIGINT) AS max_cluster_size
FROM clusters
GROUP BY 1
ORDER BY 1
"""


@register("dedup_cluster_size_histogram", oracle=_CLUSTER_HIST_SQL)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = docs.groupBy(hash60("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    bucket = (F.length(F.bin(F.col("sz"))) - 1).cast("long")
    return (
        clusters.groupBy(bucket.alias("log2_size_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("long").alias("n_removable"),
            F.max("sz").cast("long").alias("max_cluster_size"),
        )
        .orderBy("log2_size_bucket")
    )


# ---------------------------------------------------------------------------
# Cross-lingual exact-duplicate audit (round 9) — the translation-
# pipeline leak check: exact-content clusters (60-bit hash) whose
# members claim MULTIPLE language tags. A multilingual training mix
# that machine-translates or mirrors sources ends up with byte-equal
# text under different lang labels; deduplicating per-language then
# misses them, and language-balanced sampling double counts them.
# Rollup by the cluster's language spread: one hash aggregate over
# (hash, lang), one bounded fold — no pairs, no joins, linear at any
# corpus size.
# ---------------------------------------------------------------------------

_XLING_SQL = f"""
WITH h AS (
    SELECT {sql_hash60('text')} AS ch, lang FROM documents
),
cl AS (
    SELECT ch,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(lang) AS first_lang
    FROM h GROUP BY ch
)
SELECT CAST(n_langs AS BIGINT) AS n_langs,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_docs - 1) AS BIGINT) AS n_redundant_docs,
       MIN(first_lang) AS sample_lang
FROM cl
WHERE n_docs > 1
GROUP BY n_langs
ORDER BY n_langs
"""


@register("dedup_crosslingual_exact", oracle=_XLING_SQL)
def dedup_crosslingual_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = (
        docs.select(hash60("text").alias("ch"), "lang")
        .groupBy("ch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("lang").alias("first_lang"),
        )
        .filter(F.col("n_docs") > 1)
    )
    return (
        clusters.groupBy(F.col("n_langs").cast("long").alias("n_langs"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum(F.col("n_docs") - 1).cast("long").alias("n_redundant_docs"),
            F.min("first_lang").alias("sample_lang"),
        )
        .orderBy("n_langs")
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup audit under length blocking (round 11) — the
# character-level companion to the shingle/MinHash family: Levenshtein
# distance catches single-character edits (OCR noise, typo variants)
# that token-level Jaccard dilutes. Candidate pairs come from exact
# (lang, n_chars) blocks — equal-length blocking is sound for small
# edit budgets dominated by substitutions and is the standard first
# filter; distances are computed on 64-char prefixes (both engines'
# 1-based substr agrees), so each comparison is O(64^2) regardless of
# document size. Hot blocks beyond the pair cap are EXCLUDED AND
# COUNTED (never silently dropped — the no-silent-caps rule), bounding
# the per-block pair mass at cap^2/2 at any corpus size. Distances are
# exact integers on both engines; the mean goes through the decimal
# sum. 100 TB: the self-join is an equi-join on the block key (hash
# join, no broadcast hint); the cap guard is APPLIED upstream of the
# pair join — d is left-semi-joined against the usable-block frame
# FIRST, so rows from heavy blocks never enter the self-join and no
# block ever expands quadratically in any intermediate (Catalyst
# preserves written join order; a downstream prune would run after
# the quadratic expansion — the round-11 verdict caught exactly that
# shape, fixed here and gated by plan rule 5).
# ---------------------------------------------------------------------------

_LEV_PREFIX = 64
_LEV_MAX_DIST = 8
_LEV_BLOCK_CAP = 40

_LEV_SQL = f"""
WITH d AS (
    SELECT doc_id, lang, n_chars,
           substr(text, 1, {_LEV_PREFIX}) AS p
    FROM documents WHERE text IS NOT NULL
),
blocks AS (
    SELECT lang, n_chars, COUNT(*) AS bn FROM d GROUP BY 1, 2
),
usable AS (SELECT * FROM blocks WHERE bn BETWEEN 2 AND {_LEV_BLOCK_CAP}),
pairs AS (
    SELECT a.lang, levenshtein(a.p, b.p) AS dist
    FROM d a JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars
                      AND a.doc_id < b.doc_id
    JOIN usable u ON u.lang = a.lang AND u.n_chars = a.n_chars
)
SELECT l.lang,
       CAST(COALESCE(ub.n_usable, 0) AS BIGINT) AS n_blocks_used,
       CAST(COALESCE(hb.n_heavy, 0) AS BIGINT) AS n_heavy_blocks,
       CAST(COALESCE(pr.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(pr.n_neardup, 0) AS BIGINT) AS n_neardup,
       pr.mean_dist
FROM (SELECT DISTINCT lang FROM d) l
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_usable FROM usable GROUP BY lang
) ub USING (lang)
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_heavy FROM blocks
    WHERE bn > {_LEV_BLOCK_CAP} GROUP BY lang
) hb USING (lang)
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_pairs,
           SUM(CASE WHEN dist <= {_LEV_MAX_DIST} THEN 1 ELSE 0 END)
               AS n_neardup,
           {sql_davg("dist", "mean_dist")}
    FROM pairs GROUP BY lang
) pr USING (lang)
ORDER BY l.lang
"""


@register("dedup_levenshtein_block_pairs", oracle=_LEV_SQL)
def dedup_levenshtein_block_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = session_cache(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.substring("text", 1, _LEV_PREFIX).alias("p"),
        )
    )
    blocks = session_cache(
        d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("bn"))
    )
    usable = blocks.filter(
        (F.col("bn") >= 2) & (F.col("bn") <= _LEV_BLOCK_CAP)
    )
    # Prune BEFORE pairing: only rows in usable (2..cap) blocks enter
    # the self-join, so a heavy block contributes zero pairs to any
    # intermediate — the per-block pair mass is bounded by cap^2/2 at
    # any corpus size.
    d_usable = d.join(
        usable.select("lang", "n_chars"), ["lang", "n_chars"], "left_semi"
    )
    # Expansion-aware parallelism floor (round-12): the pair join
    # multiplies rows ~cap/2 x and levenshtein costs O(prefix^2) per
    # pair, so AQE's SIZE-based coalescing — which sees only the small
    # pre-join bytes — would funnel the whole distance compute into one
    # or two tasks (measured: 426k pairs on 1 task, 16 s at the 10x
    # scratch). An explicit user repartition (count = cluster default
    # parallelism, which AQE respects verbatim) keyed by the block key
    # pins the join + distance stage to full-cluster width at every
    # scale; the exchange itself moves only the pruned (tiny) frame.
    d_usable = d_usable.repartition(
        spark.sparkContext.defaultParallelism, "lang", "n_chars"
    )
    a = d_usable.select(
        "lang", "n_chars", F.col("doc_id").alias("id_a"), F.col("p").alias("pa")
    )
    b = d_usable.select(
        "lang", "n_chars", F.col("doc_id").alias("id_b"), F.col("p").alias("pb")
    )
    pairs = (
        a.join(b, ["lang", "n_chars"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("lang", F.levenshtein("pa", "pb").alias("dist"))
    )
    pr = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("dist") <= _LEV_MAX_DIST, 1).otherwise(0)
        ).alias("n_neardup"),
        davg("dist", "mean_dist"),
    )
    ub = usable.groupBy("lang").agg(F.count(F.lit(1)).alias("n_usable"))
    hb = (
        blocks.filter(F.col("bn") > _LEV_BLOCK_CAP)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_heavy"))
    )
    langs = d.select("lang").distinct()
    z = F.lit(0).cast("long")
    return (
        langs.join(ub, "lang", "left")
        .join(hb, "lang", "left")
        .join(pr, "lang", "left")
        .select(
            "lang",
            F.coalesce(F.col("n_usable"), z).cast("long").alias("n_blocks_used"),
            F.coalesce(F.col("n_heavy"), z).cast("long").alias("n_heavy_blocks"),
            F.coalesce(F.col("n_pairs"), z).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_neardup"), z).cast("long").alias("n_neardup"),
            "mean_dist",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dup under LENGTH-BANDED blocking (round 12) — the
# production companion to the equal-length query above: equal-length
# blocking misses EVERY insertion/deletion near-dup by construction
# (|len_a - len_b| >= 1 already lands the pair in different blocks),
# so this variant blocks on (lang, n_chars div W) length buckets with
# W = the edit budget. Any pair with |delta_len| <= W is then either
# in the SAME bucket or in ADJACENT buckets — two disjoint equi-join
# branches (same-bucket with id_a < id_b; lower-bucket x next-bucket)
# cover exactly the banded pair set once. The heavy-bucket cap is
# applied UPSTREAM (plan rule 5): docs are left-semi-joined against
# the usable-bucket frame BEFORE either pair join, so a hot
# (lang, bucket) cell never expands quadratically in any intermediate;
# heavy buckets are excluded AND counted. Distances on 64-char
# prefixes, exact integers on both engines. 100 TB: two equi-joins on
# the bucket key with per-bucket pair mass <= cap^2, one rollup.
# ---------------------------------------------------------------------------

_LEVB_WIDTH = _LEV_MAX_DIST  # bucket width = edit budget

_LEVB_SQL = f"""
WITH d AS (
    SELECT doc_id, lang, n_chars,
           n_chars // {_LEVB_WIDTH} AS g,
           substr(text, 1, {_LEV_PREFIX}) AS p
    FROM documents WHERE text IS NOT NULL
),
buckets AS (
    SELECT lang, g, COUNT(*) AS bn FROM d GROUP BY 1, 2
),
usable AS (SELECT * FROM buckets WHERE bn <= {_LEV_BLOCK_CAP}),
du AS (
    SELECT d.* FROM d JOIN usable u ON u.lang = d.lang AND u.g = d.g
),
pairs AS (
    SELECT a.lang, levenshtein(a.p, b.p) AS dist
    FROM du a JOIN du b ON a.lang = b.lang AND a.g = b.g
                        AND a.doc_id < b.doc_id
    WHERE abs(a.n_chars - b.n_chars) <= {_LEV_MAX_DIST}
    UNION ALL
    SELECT a.lang, levenshtein(a.p, b.p) AS dist
    FROM du a JOIN du b ON a.lang = b.lang AND b.g = a.g + 1
    WHERE b.n_chars - a.n_chars <= {_LEV_MAX_DIST}
)
SELECT l.lang,
       CAST(COALESCE(ub.n_usable, 0) AS BIGINT) AS n_buckets_used,
       CAST(COALESCE(hb.n_heavy, 0) AS BIGINT) AS n_heavy_buckets,
       CAST(COALESCE(pr.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(pr.n_neardup, 0) AS BIGINT) AS n_neardup,
       pr.mean_dist
FROM (SELECT DISTINCT lang FROM d) l
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_usable FROM usable GROUP BY lang
) ub USING (lang)
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_heavy FROM buckets
    WHERE bn > {_LEV_BLOCK_CAP} GROUP BY lang
) hb USING (lang)
LEFT JOIN (
    SELECT lang, COUNT(*) AS n_pairs,
           SUM(CASE WHEN dist <= {_LEV_MAX_DIST} THEN 1 ELSE 0 END)
               AS n_neardup,
           {sql_davg("dist", "mean_dist")}
    FROM pairs GROUP BY lang
) pr USING (lang)
ORDER BY l.lang
"""


@register("dedup_levenshtein_banded_lengths", oracle=_LEVB_SQL)
def dedup_levenshtein_banded_lengths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = session_cache(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(f"n_chars div {_LEVB_WIDTH}").alias("g"),
            F.substring("text", 1, _LEV_PREFIX).alias("p"),
        )
    )
    buckets = session_cache(
        d.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("bn"))
    )
    usable = buckets.filter(F.col("bn") <= _LEV_BLOCK_CAP)
    # Prune BEFORE pairing (plan rule 5): only docs in usable buckets
    # enter either pair join; then the expansion-aware parallelism
    # floor (see dedup_levenshtein_block_pairs) keeps the distance
    # stage at cluster width despite the small pre-join bytes.
    du = d.join(usable.select("lang", "g"), ["lang", "g"], "left_semi")
    du = du.repartition(spark.sparkContext.defaultParallelism, "lang", "g")
    a = du.select(
        "lang",
        "g",
        F.col("doc_id").alias("id_a"),
        F.col("n_chars").alias("na"),
        F.col("p").alias("pa"),
    )
    b_same = du.select(
        "lang",
        "g",
        F.col("doc_id").alias("id_b"),
        F.col("n_chars").alias("nb"),
        F.col("p").alias("pb"),
    )
    b_next = du.select(
        "lang",
        (F.col("g") - 1).alias("g"),
        F.col("n_chars").alias("nb"),
        F.col("p").alias("pb"),
    )
    same = (
        a.join(b_same, ["lang", "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("na") - F.col("nb")) <= _LEV_MAX_DIST)
        .select("lang", F.levenshtein("pa", "pb").alias("dist"))
    )
    adj = (
        a.join(b_next, ["lang", "g"])
        .filter(F.col("nb") - F.col("na") <= _LEV_MAX_DIST)
        .select("lang", F.levenshtein("pa", "pb").alias("dist"))
    )
    pairs = same.unionByName(adj)
    pr = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("dist") <= _LEV_MAX_DIST, 1).otherwise(0)
        ).alias("n_neardup"),
        davg("dist", "mean_dist"),
    )
    ub = usable.groupBy("lang").agg(F.count(F.lit(1)).alias("n_usable"))
    hb = (
        buckets.filter(F.col("bn") > _LEV_BLOCK_CAP)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_heavy"))
    )
    langs = d.select("lang").distinct()
    z = F.lit(0).cast("long")
    return (
        langs.join(ub, "lang", "left")
        .join(hb, "lang", "left")
        .join(pr, "lang", "left")
        .select(
            "lang",
            F.coalesce(F.col("n_usable"), z).cast("long").alias("n_buckets_used"),
            F.coalesce(F.col("n_heavy"), z).cast("long").alias("n_heavy_buckets"),
            F.coalesce(F.col("n_pairs"), z).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_neardup"), z).cast("long").alias("n_neardup"),
            "mean_dist",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Cross-shard duplicate leakage (round 11) — the composition audit the
# shard-uniformity receipt implies: if exact-duplicate clusters span
# MULTIPLE training shards, per-shard dedup misses them and the model
# sees the same text twice — this query counts exactly how much of the
# duplicate mass leaks across the hash-shard boundary (doc-hash shards
# vs content-hash clusters are independent hashes, so leakage is the
# norm: the receipt quantifies it and motivates global-before-shard
# dedup). Exact integer counts throughout. 100 TB: one hash aggregate
# per content cluster, one 1-row reduce.
# ---------------------------------------------------------------------------

_XSHARD_K = 1024

_XSHARD_SQL = f"""
WITH d AS (
    SELECT {sql_hash60("COALESCE(text, '')")} AS ch,
           {sql_hash60("CAST(doc_id AS VARCHAR)")} % {_XSHARD_K} AS shard
    FROM documents
),
cl AS (
    SELECT ch, COUNT(*) AS n_docs, COUNT(DISTINCT shard) AS n_shards
    FROM d GROUP BY ch HAVING COUNT(*) > 1
),
s AS (
    SELECT COUNT(*) AS n_clusters,
           SUM(CASE WHEN n_shards > 1 THEN 1 ELSE 0 END) AS n_leaky,
           SUM(CAST(n_docs AS HUGEINT)) AS n_dup_docs,
           MAX(n_shards) AS max_shards
    FROM cl
)
SELECT CAST(n_clusters AS BIGINT) AS n_dup_clusters,
       CAST(COALESCE(n_leaky, 0) AS BIGINT) AS n_cross_shard_clusters,
       CAST(COALESCE(n_dup_docs, 0) AS BIGINT) AS n_docs_in_dup_clusters,
       CAST(max_shards AS BIGINT) AS max_shards_per_cluster,
       CASE WHEN n_clusters = 0 THEN NULL
            ELSE ROUND(CAST(n_leaky AS DOUBLE) / n_clusters, 6)
       END AS leakage_rate
FROM s
"""


@register("dedup_cross_shard_leakage", oracle=_XSHARD_SQL)
def dedup_cross_shard_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        hash60(F.coalesce(F.col("text"), F.lit(""))).alias("ch"),
        (hash60(F.col("doc_id").cast("string")) % _XSHARD_K).alias("shard"),
    )
    cl = (
        d.groupBy("ch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("shard").alias("n_shards"),
        )
        .filter(F.col("n_docs") > 1)
    )
    s = cl.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.when(F.col("n_shards") > 1, 1).otherwise(0)).alias("n_leaky"),
        F.sum(F.col("n_docs").cast("decimal(19,0)")).alias("n_dup_docs"),
        F.max("n_shards").alias("max_shards"),
    )
    z = F.lit(0).cast("long")
    return s.select(
        F.col("n_clusters").cast("long").alias("n_dup_clusters"),
        F.coalesce(F.col("n_leaky"), z)
        .cast("long")
        .alias("n_cross_shard_clusters"),
        F.coalesce(F.col("n_dup_docs").cast("long"), z).alias(
            "n_docs_in_dup_clusters"
        ),
        F.col("max_shards").cast("long").alias("max_shards_per_cluster"),
        F.when(F.col("n_clusters") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_leaky").cast("double") / F.col("n_clusters"), 6
            )
        )
        .alias("leakage_rate"),
    )
