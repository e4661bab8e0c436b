"""Similarity search over the ``embeddings`` table (ArrayType(FloatType)).

Brute-force cosine top-k is the correctness baseline; the label-blocked
near-dup pass shows the bucketed/blocked pattern that survives scale
(candidates per block, never the global n² cross join). Dot products are
built-in higher-order array functions (``zip_with`` + ``aggregate``) —
JVM-side, no Python UDF; embeddings are cast float→double so Spark and
the DuckDB oracle run identical IEEE arithmetic.

At 100 TB the brute-force variant is still the right primitive: the
query set is broadcast (it is small by construction) and the corpus scan
is embarrassingly parallel with a per-partition top-k (window +
WindowGroupLimit) before the final merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from deathmetal_datalake_spark.plans.registry import register, spread, sql_davg
from deathmetal_datalake_spark.sources.tables import load_table

_QUERY_MOD = 50  # vec_id % 50 == 0 → the query subset
# FIXED-SIZE evaluation sets (round-5): a bare modulus keeps a constant
# FRACTION of the corpus, so every query/centroid set grows linearly
# with the data and the audits that sweep corpus × queries (brute-force
# ground truth, truncation recall) or corpus × centroids (k-means) turn
# quadratic — measured ×12-14 at 10× data in round 4. Capping vec_id
# below MOD × K keeps the sets at exactly K members at every scale
# ≥ sf0.1 (and bit-identical to the uncapped sets at sf0.01/sf0.1,
# whose vec_ids stop at 1999), so the scans are O(n·K) — linear. The
# caps are mirrored verbatim in every DuckDB oracle, exactly like
# dedup's _auto_max_df, so the scale knob itself is correctness-checked.
_QUERY_CAP = _QUERY_MOD * 40  # ≤40 query vectors at any corpus size
_TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _normprod(a: str, b: str) -> Column:
    """Cosine denominator ‖a‖·‖b‖, NULLed when zero: Spark 4 runs ANSI
    mode by default, so a zero-norm vector (an all-zero embedding — a
    realistic padding/dead-row input) would abort every cosine query
    with DIVIDE_BY_ZERO, while the DuckDB oracles return NULL (x/0)
    and drop the row at the threshold/rank. NULLIF makes the engines
    agree: NULL cosine, filtered wherever a threshold or top-k applies
    (round-8 degenerate-embeddings find)."""
    return F.nullif(
        F.sqrt(_dot(F.col(a), F.col(a))) * F.sqrt(_dot(F.col(b), F.col(b))),
        F.lit(0.0),
    )


_BRUTE_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id,
           v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q CROSS JOIN vecs v
    WHERE q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {_TOP_K}
"""


@register("similarity_bruteforce_topk", oracle=_BRUTE_SQL)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (
                    _normprod("qemb", "emb")
                ),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# The synthetic embeddings are near-orthogonal (within-label cosine
# maxes at ~0.47), so a production-style 0.9 threshold can never fire
# and the filter/verify path would go un-exercised by the driver gate;
# 0.4 yields a small real pair set at every SF.
_NEARDUP_THRESHOLD = 0.4

_NEARDUP_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       a.label AS label,
       ROUND(list_dot_product(a.emb, b.emb) /
             (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
             4) AS cosine
FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) /
      (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
      >= {_NEARDUP_THRESHOLD}
"""


@register("dedup_embedding_cosine", oracle=_NEARDUP_SQL)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (candidates come from
    within a block — the blocked/bucketed shape that avoids global n²)."""
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        )
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    cosine = _dot(F.col("a.emb"), F.col("b.emb")) / (
        _normprod("a.emb", "b.emb")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine >= _NEARDUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cosine, 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path. Sign-random-projection hyperplanes
# are derived deterministically from md5 (no RNG), embedded as literals
# in BOTH engines, so the full pipeline (bucketing → candidate join →
# rerank) is oracle-checked. At 100 TB: bucketing is a map-only pass,
# the candidate join shuffles on an 8-bit key (256 buckets; use more
# bits as the corpus grows), and rerank cost is Σ bucket·queries-in-
# bucket instead of corpus × queries.
# ---------------------------------------------------------------------------

_N_PLANES = 8
_DIM = 64
_ANN_TOP_K = 5


def _plane_weights() -> list[list[float]]:
    import hashlib

    planes = []
    for j in range(_N_PLANES):
        row = []
        for d in range(_DIM):
            h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def _bucket_expr_spark(emb: Column) -> Column:
    planes = _plane_weights()
    bucket = F.lit(0).cast("long")
    for j, row in enumerate(planes):
        plane = F.array(*[F.lit(w) for w in row])
        dot = _dot(emb, plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _bucket_expr_sql(emb: str) -> str:
    planes = _plane_weights()
    parts = []
    for j, row in enumerate(planes):
        lit = "[" + ", ".join(repr(w) for w in row) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({emb}, {lit}::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END"
        )
    return " + ".join(parts)


_ANN_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
bucketed AS (
    SELECT vec_id, emb, {_bucket_expr_sql('emb')} AS bucket FROM vecs
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb, bucket FROM bucketed WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q JOIN bucketed v ON q.bucket = v.bucket AND q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {_ANN_TOP_K}
"""


@register("similarity_ann_lsh_topk", oracle=_ANN_SQL)
def similarity_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    bucketed = vecs.withColumn("bucket", _bucket_expr_spark(F.col("emb")))
    queries = bucketed.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    cosine = _dot(F.col("qemb"), F.col("emb")) / (
        _normprod("qemb", "emb")
    )
    scored = (
        bucketed.join(
            broadcast(queries),
            (F.col("qbucket") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "vec_id", F.round(cosine, 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ANN_TOP_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Pandas-UDF (Arrow) variant of brute-force cosine top-k: same oracle as
# the built-in-expression variant — the two code paths must agree. This
# is the template for extension math that has no Catalyst builtin.
# ---------------------------------------------------------------------------


@register("similarity_pandas_udf_topk", oracle=_BRUTE_SQL)
def similarity_pandas_udf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.functions.vector import cosine_sim

    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine_sim(F.col("qemb"), F.col("emb")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: training-free coarse quantizer (every 125th corpus
# vector is a centroid), cosine cluster assignment, search within the
# query's cluster (nprobe=1). Complements the LSH variant: IVF buckets
# adapt to the data distribution where LSH buckets are data-oblivious.
# Assignment uses ROUNDED similarity + centroid-id tie-break so both
# engines pick identical clusters.
# ---------------------------------------------------------------------------

_CENTROID_MOD = 125
# Fixed cell count (16) for the AUDIT queries: keeps assignment at
# O(n·16), not O(n²/125). A production IVF build would grow cells ~√n
# (a training knob, not a semantics change); the audit pins them so the
# benchmark slope measures the scan, not the eval-set size.
_CENTROID_CAP = _CENTROID_MOD * 16
_CENTROID_REM = 7
_IVF_TOP_K = 5

_IVF_COS = (
    "ROUND(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_IVF_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
assigned AS (
    SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN centroids c
    ) WHERE rn = 1
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb, cid FROM assigned WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q JOIN assigned v ON q.cid = v.cid AND q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {_IVF_TOP_K}
"""


@register("similarity_ivf_topk", oracle=_IVF_SQL)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM) & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    sim_to_centroid = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (_normprod("emb", "cemb")),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.asc("cid")
    )
    # Skinny ranking (same trick as the multi-probe variant): project
    # the embedding away before the corpus × centroids window so the
    # shuffle carries (vec_id, cid, sim) triples, then re-attach emb
    # with a narrow vec_id join.
    assigned = (
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", sim_to_centroid.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(vecs, "vec_id")
    )
    queries = assigned.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"), F.col("cid").alias("qcid")
    )
    cosine = _dot(F.col("qemb"), F.col("emb")) / (
        _normprod("qemb", "emb")
    )
    scored = assigned.join(
        broadcast(queries),
        (F.col("qcid") == F.col("cid")) & (F.col("query_id") != F.col("vec_id")),
    ).select("query_id", "vec_id", F.round(cosine, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_TOP_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Per-label mean centroid — the building block for k-means-style IVF
# training and class prototypes. Cross-row float sums are normally
# order-dependent (partition-parallel vs sequential), so each component
# is summed as DECIMAL(25,12): the double→decimal rounding of arbitrary
# float data agrees across engines (a tie at the 13th fractional digit
# would need the double's exact binary expansion to end there — measure
# zero for real-valued data; verified exact at sf0.01 and sf0.1), and
# decimal addition is associative, so Spark's parallel aggregation and
# DuckDB's sequential one agree bit-for-bit. One posexplode + one
# (label, pos) shuffle; components re-assemble ordered by position.
# ---------------------------------------------------------------------------

_EMB_DIM = 64

_CENTROID_PL_SQL = f"""
WITH vecs AS (
    SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
comps AS (
    SELECT label, g.i AS pos, CAST(emb[g.i + 1] AS DECIMAL(25,12)) AS x
    FROM vecs, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
means AS (
    SELECT label, pos, ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS m,
           COUNT(*) AS n
    FROM comps GROUP BY label, pos
)
SELECT label,
       list(m ORDER BY pos) AS centroid,
       MIN(n) AS n_vecs
FROM means GROUP BY label
"""


@register("embedding_centroid_per_label", oracle=_CENTROID_PL_SQL)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "x")
    )
    means = comps.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(25,12)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return means.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("centroid"),
        F.min("n").alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# K-means, two rounds, exact oracle — the iterative-refinement pattern
# (assign → recompute centroids → reassign) that underlies IVF training,
# expressed so BOTH engines agree bit-for-bit at every step:
# assignment uses ROUND(cosine, 6) with centroid-id tie-break (ties
# resolved identically), centroid updates use DECIMAL(25,12) component
# sums rounded to 6 (associative ⇒ partition-order-free), and the next
# round's distances are computed from those rounded centroids. In
# production the loop runs via the same driver iteration as
# dedup_connected_components with localCheckpoint per round; two rounds
# are unrolled here so the DuckDB oracle can verify the full refinement
# rather than a rows-only check.
# ---------------------------------------------------------------------------

_KM_MOD = 125
_KM_REM = 7
_KM_CAP = _KM_MOD * 16  # fixed k=16 seeds at any corpus size (≥ sf0.1)

_KM_COS = (
    "ROUND(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_KMEANS_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c0 AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs
    WHERE vec_id % {_KM_MOD} = {_KM_REM} AND vec_id < {_KM_CAP}
),
a1 AS (
    SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_KM_COS.format(a="v.emb", b="c.cemb")} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN c0 c
    ) WHERE rn = 1
),
comps1 AS (
    SELECT cid, g.i AS pos, CAST(emb[g.i + 1] AS DECIMAL(25,12)) AS x
    FROM a1, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
c1 AS (
    SELECT cid, list(m ORDER BY pos) AS cemb FROM (
        SELECT cid, pos, ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS m
        FROM comps1 GROUP BY cid, pos
    ) GROUP BY cid
),
a2 AS (
    SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_KM_COS.format(a="v.emb", b="c.cemb")} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN c1 c
    ) WHERE rn = 1
)
SELECT cid, COUNT(*) AS n_assigned, MIN(vec_id) AS min_member
FROM a2 GROUP BY cid
"""


def _km_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Argmax-cosine assignment with the engine-shared tie-break.

    Row-local struct-max over a broadcast centroid ARRAY (round-14,
    §2.4) instead of crossJoin + row_number window: the window form
    shuffled n·K scored rows per assignment pass purely to pick each
    vector's max. ``max(struct(sim, -cid))`` equals rank-1 under
    ``ORDER BY sim DESC NULLS LAST, cid ASC`` exactly: Spark's struct
    ordering puts a NULL field smallest (so NULL cosines lose, as
    NULLS LAST did), NaN largest (as DESC did), and sim ties resolve
    to the smallest cid via the negated id. K is enum-bounded (the
    seed filter), so the collected array is never data-proportional.
    Extra caller columns ride along — the convergence loop carries
    the previous round's assignment through the pass. The trailing
    isNotNull filter mirrors the crossJoin's empty-centroids behavior
    (no seeds → no rows, not NULL assignments)."""
    carr = centroids.agg(F.collect_list(F.struct("cid", "cemb")).alias("_cs"))
    nemb = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    best = F.array_max(
        F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                F.round(
                    _dot(F.col("emb"), c["cemb"])
                    / F.nullif(
                        nemb * F.sqrt(_dot(c["cemb"], c["cemb"])), F.lit(0.0)
                    ),
                    6,
                ).alias("sim"),
                (-c["cid"]).alias("_ncid"),
                c["cid"].alias("cid"),
            ),
        )
    )
    cols = vecs.columns
    return (
        vecs.crossJoin(broadcast(carr))
        .select(*cols, best["cid"].alias("cid"))
        .filter(F.col("cid").isNotNull())
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Decimal-mean centroid recompute (order-free, engine-exact)."""
    comps = assigned.select("cid", F.posexplode("emb").alias("pos", "x"))
    means = comps.groupBy("cid", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("cemb")
    )


@register("kmeans_two_rounds", oracle=_KMEANS_SQL)
def kmeans_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    c0 = vecs.filter((F.col("vec_id") % _KM_MOD == _KM_REM) & (F.col("vec_id") < _KM_CAP)).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    a1 = _km_assign(vecs, c0)
    c1 = _km_update(a1)
    a2 = _km_assign(vecs, c1)
    return a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_assigned"), F.min("vec_id").alias("min_member")
    )


# ---------------------------------------------------------------------------
# Retrieval with metadata: ANN top-k joined back to the documents table
# — the serving-path shape (vector index hit → payload lookup). The
# top-k set is tiny relative to the corpus, so the payload join is a
# broadcast of the *results*, never a shuffle of the document table.
# ---------------------------------------------------------------------------

_RETRIEVE_K = 5

_RETRIEVE_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q CROSS JOIN vecs v
    WHERE q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT r.query_id, r.vec_id, r.cosine, r.rank, d.lang, d.source
FROM ranked r JOIN documents d ON r.vec_id = d.doc_id
WHERE r.rank <= {_RETRIEVE_K}
"""


@register("similarity_retrieval_with_metadata", oracle=_RETRIEVE_SQL)
def similarity_retrieval_with_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    queries = vecs.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    cosine = _dot(F.col("qemb"), F.col("emb")) / (
        _normprod("qemb", "emb")
    )
    scored = (
        vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", F.round(cosine, 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RETRIEVE_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
    # Payload lookup: broadcast the k·|queries| result set onto documents
    # (results ≪ corpus by construction), so the doc table never shuffles.
    return broadcast(topk).join(docs, topk.vec_id == docs.doc_id).select(
        "query_id", "vec_id", "cosine", "rank", "lang", "source"
    )


# ---------------------------------------------------------------------------
# K-means to convergence — the production loop behind the two-round
# oracle-checked unrolling above: iterate assign → update until no
# vector changes cluster, lineage cut per round (localCheckpoint), and
# a loud cap instead of a silent partial result (same contract as
# dedup.min_label_propagation). Registered WITHOUT an oracle: the
# fixed-point iteration count is data-dependent, which is exactly the
# case the driver's weaker rows-only check exists for.
# ---------------------------------------------------------------------------

_KM_MAX_ITERS = 25


def kmeans_converged_assignments(
    vecs: DataFrame, centroids: DataFrame, max_iters: int = _KM_MAX_ITERS
) -> DataFrame:
    """Iterate _km_assign/_km_update to the assignment fixed point.

    ``vecs``: (vec_id, emb); ``centroids``: (cid, cemb) seeds. Returns
    (vec_id, cid). Convergence = zero vectors changed cluster this
    round (an exact integer count — no float tolerance needed).
    """
    assigned = _km_assign(vecs, centroids).localCheckpoint(eager=True)
    for _ in range(max_iters):
        # The previous assignment rides through the assign pass as an
        # extra column (round-14, §2.4): the change count becomes a
        # cheap row-local filter over the freshly checkpointed frame —
        # the old form re-shuffled BOTH checkpointed assignment tables
        # through a vec_id equi-join every round just to compare them.
        prev = assigned.select(
            "vec_id", "emb", F.col("cid").alias("_prev_cid")
        )
        nxt = _km_assign(prev, _km_update(assigned)).localCheckpoint(
            eager=True
        )
        changed = nxt.filter(F.col("cid") != F.col("_prev_cid")).count()
        assigned = nxt.select("vec_id", "emb", "cid")
        if changed == 0:
            return assigned.select("vec_id", "cid")
    raise RuntimeError(
        f"kmeans did not converge within {max_iters} rounds; raise max_iters"
    )


# The fixed point itself is not SQL-expressible (an until-convergence
# loop), but its STRUCTURAL INVARIANTS are, which upgrades the round-3
# rows-only check to an exact contract oracle: every vector is assigned
# exactly once (sizes sum to the corpus count), every cluster id is a
# seed id, the loop converged (the function raises otherwise), and —
# verified at every test SF — no seed's cluster empties, so the
# non-empty cluster count equals the seed count. The last invariant is
# data-conditioned; if a future corpus collapses a cluster the gate
# flags it, which is the behavior we want from a contract.
_KMEANS_INVARIANTS_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST((SELECT COUNT(*) FROM embeddings
             WHERE vec_id % {_KM_MOD} = {_KM_REM} AND vec_id < {_KM_CAP}) AS BIGINT) AS n_clusters,
       TRUE AS all_cids_are_seeds,
       TRUE AS converged
FROM embeddings
"""


@register("kmeans_converged_sizes", oracle=_KMEANS_INVARIANTS_SQL)
def kmeans_converged_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariants of the k-means fixed point (exact contract oracle;
    the two-round prefix of the same loop is value-verified above)."""
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    c0 = vecs.filter((F.col("vec_id") % _KM_MOD == _KM_REM) & (F.col("vec_id") < _KM_CAP)).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
    )
    final = kmeans_converged_assignments(vecs, c0)
    sizes = final.groupBy("cid").agg(F.count(F.lit(1)).alias("n_assigned"))
    return sizes.agg(
        F.sum("n_assigned").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.bool_and(
            ((F.col("cid") % _KM_MOD) == _KM_REM) & (F.col("cid") < _KM_CAP)
        ).alias(
            "all_cids_are_seeds"
        ),
        F.bool_and(F.lit(True)).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Multi-probe IVF: identical coarse quantizer to similarity_ivf_topk,
# but each query searches its NPROBE closest clusters instead of one —
# the standard recall/latency dial of an IVF index (probing 2 of ~C
# clusters roughly doubles scanned candidates while recovering most
# neighbors lost at cluster borders). Corpus vectors stay assigned to
# exactly one cluster, so the probe join generates no duplicate pairs
# and needs no post-dedup. The probe table is (queries × NPROBE) rows —
# broadcast; the corpus side never re-shuffles.
# ---------------------------------------------------------------------------

_NPROBE = 2

_IVF_MP_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
ranked_assign AS (
    SELECT v.vec_id, v.emb, c.cid,
           ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.cid ASC
           ) AS rn
    FROM vecs v CROSS JOIN centroids c
),
assigned AS (
    SELECT vec_id, emb, cid FROM ranked_assign WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, emb AS qemb, cid AS probe_cid, rn AS probe
    FROM ranked_assign
    WHERE rn <= {_NPROBE} AND vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM probes q JOIN assigned v ON q.probe_cid = v.cid AND q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {_IVF_TOP_K}
"""


@register("similarity_ivf_multiprobe_topk", oracle=_IVF_MP_SQL)
def similarity_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM) & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    sim_to_centroid = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (_normprod("emb", "cemb")),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("centroid_sim"), F.asc("cid"))
    # Shared subplan: cluster ranking feeds both the corpus assignment
    # (rn = 1) and the query probe list (rn <= NPROBE). The ranking is
    # computed on SKINNY rows — the embedding is projected away right
    # after the similarity is computed, so the corpus × centroids
    # window shuffles (vec_id, cid, sim) triples, not 64-double arrays
    # (measured ~20× less shuffle volume at a 10× corpus); embeddings
    # are re-attached afterwards by a narrow vec_id join.
    from deathmetal_datalake_spark.plans.registry import session_cache

    ranked_assign = session_cache(
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", sim_to_centroid.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assigned = (
        ranked_assign.filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(vecs, "vec_id")
    )
    queries = vecs.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    probes = (
        ranked_assign.filter(
            (F.col("rn") <= _NPROBE) & ((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP))
        )
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("probe_cid"))
        .join(queries, "query_id")
    )
    cosine = _dot(F.col("qemb"), F.col("emb")) / (
        _normprod("qemb", "emb")
    )
    scored = assigned.join(
        broadcast(probes),
        (F.col("probe_cid") == F.col("cid")) & (F.col("query_id") != F.col("vec_id")),
    ).select("query_id", "vec_id", F.round(cosine, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_TOP_K)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the multi-probe IVF index against
# exact brute-force ground truth — the metric every vector index is
# judged by, computed corpus-parallel (both sides are the registered
# queries' own plans; the comparison is a (query_id, vec_id) join on
# two k-row-per-query tables, negligible next to the searches). Recall
# is a count ratio — exact rational arithmetic in both engines.
# ---------------------------------------------------------------------------

_RECALL_K = _IVF_TOP_K  # ground truth truncated to the ANN's k

_RECALL_SQL = f"""
WITH truth AS (
    SELECT query_id, vec_id FROM ({_BRUTE_SQL}) WHERE rank <= {_RECALL_K}
),
approx AS (
    SELECT query_id, vec_id FROM ({_IVF_MP_SQL})
)
SELECT t.query_id,
       COUNT(a.vec_id) AS n_hits,
       ROUND(COUNT(a.vec_id) / CAST({_RECALL_K} AS DOUBLE), 6) AS recall_at_k
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY t.query_id
"""


@register("similarity_ann_recall", oracle=_RECALL_SQL)
def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = (
        similarity_bruteforce_topk(spark, sf_dir)
        .filter(F.col("rank") <= _RECALL_K)
        .select("query_id", "vec_id")
    )
    approx = similarity_ivf_multiprobe_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_query_id"), F.col("vec_id").alias("a_vec_id")
    )
    return (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("vec_id") == F.col("a_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_vec_id").alias("n_hits"),
            F.round(F.count("a_vec_id") / F.lit(float(_RECALL_K)), 6).alias(
                "recall_at_k"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Scalar int8 quantization audit: per-dimension [min, max] → 256-level
# affine codes, reporting each dimension's range, scale, and mean
# absolute reconstruction error — the table a vector-index build emits
# before switching storage to int8 (4× smaller, SIMD-friendly). Shape:
# one posexplode + a 64-row bounded broadcast join back; the error mean
# uses the DECIMAL(25,12) order-free sum. The quantizer arithmetic is
# floor(x + 0.5) in both engines — no ROUND-tie dialect divergence.
# ---------------------------------------------------------------------------

_QUANT_LEVELS = 255  # codes 0..255

_QUANT_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
elems AS (
    SELECT vec_id, g.pos, emb[g.pos + 1] AS val
    FROM vecs, (SELECT UNNEST(range(64)) AS pos) g
    WHERE g.pos < LENGTH(emb)
),
dims AS (
    SELECT pos, MIN(val) AS dmin, MAX(val) AS dmax FROM elems GROUP BY pos
),
err AS (
    SELECT e.pos, e.vec_id,
           ABS(LEAST({_QUANT_LEVELS}, GREATEST(0,
                   FLOOR((e.val - d.dmin) / ((d.dmax - d.dmin) / {_QUANT_LEVELS}) + 0.5)))
               * ((d.dmax - d.dmin) / {_QUANT_LEVELS}) + d.dmin - e.val) AS abs_err
    FROM elems e JOIN dims d USING (pos)
)
SELECT e.pos,
       COUNT(*) AS n_values,
       ROUND(d.dmin, 6) AS dim_min,
       ROUND(d.dmax, 6) AS dim_max,
       ROUND((d.dmax - d.dmin) / {_QUANT_LEVELS}, 9) AS scale,
       ROUND(CAST(SUM(CAST(e.abs_err AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 9)
           AS avg_abs_err
FROM err e JOIN dims d USING (pos)
GROUP BY e.pos, d.dmin, d.dmax
"""


@register("embedding_int8_quantization", oracle=_QUANT_SQL)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    # Cached: the per-dim stats branch and the error branch both consume
    # the exploded elements — one explode pass, not two.
    elems = session_cache(
        vecs.select("vec_id", F.posexplode("emb").alias("pos", "val"))
    )
    dims = elems.groupBy("pos").agg(
        F.min("val").alias("dmin"), F.max("val").alias("dmax")
    )
    scale = (F.col("dmax") - F.col("dmin")) / _QUANT_LEVELS
    code = F.least(
        F.lit(_QUANT_LEVELS),
        F.greatest(
            F.lit(0),
            F.floor((F.col("val") - F.col("dmin")) / scale + F.lit(0.5)),
        ),
    )
    abs_err = F.abs(code * scale + F.col("dmin") - F.col("val"))
    return (
        elems.join(F.broadcast(dims), "pos")
        .select("pos", "dmin", "dmax", abs_err.alias("abs_err"))
        .groupBy("pos", "dmin", "dmax")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.round(
                F.sum(F.col("abs_err").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_abs_err"),
        )
        .select(
            "pos",
            "n_values",
            F.round("dmin", 6).alias("dim_min"),
            F.round("dmax", 6).alias("dim_max"),
            F.round((F.col("dmax") - F.col("dmin")) / _QUANT_LEVELS, 9).alias("scale"),
            "avg_abs_err",
        )
    )


# ---------------------------------------------------------------------------
# Dimension-truncation recall (the Matryoshka-embedding audit): how much
# of the full-64-dim top-k survives when retrieval uses only the FIRST
# 16 components — the measurement that decides whether a corpus can
# serve candidate-generation from truncated vectors (4× less memory and
# bandwidth) and rerank with full vectors. Same bounded shape as the
# brute-force baseline: queries broadcast, corpus scanned once per
# ranking; overlap is a count ratio (exact rational in both engines).
# ---------------------------------------------------------------------------

_TRUNC_DIMS = 16

_TRUNC_RECALL_SQL = f"""
WITH truth AS (
    SELECT query_id, vec_id FROM ({_BRUTE_SQL})
),
vecs_t AS (
    SELECT vec_id, (CAST(embedding AS DOUBLE[]))[1:{_TRUNC_DIMS}] AS emb
    FROM embeddings
),
queries_t AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs_t WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored_t AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries_t q CROSS JOIN vecs_t v
    WHERE q.query_id <> v.vec_id
),
ranked_t AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored_t
),
approx_t AS (
    SELECT query_id, vec_id FROM ranked_t WHERE rank <= {_TOP_K}
)
SELECT t.query_id,
       COUNT(a.vec_id) AS n_kept,
       ROUND(COUNT(a.vec_id) / CAST({_TOP_K} AS DOUBLE), 6) AS overlap_at_k
FROM truth t LEFT JOIN approx_t a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY t.query_id
"""


@register("similarity_dim_truncation_recall", oracle=_TRUNC_RECALL_SQL)
def similarity_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    truth = similarity_bruteforce_topk(spark, sf_dir).select("query_id", "vec_id")
    vecs_t = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.slice(_as_double("embedding"), 1, _TRUNC_DIMS).alias("emb")
        )
    )
    queries_t = vecs_t.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    scored = (
        vecs_t.join(broadcast(queries_t), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (
                    _normprod("qemb", "emb")
                ),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select(F.col("query_id").alias("a_query_id"), F.col("vec_id").alias("a_vec_id"))
    )
    return (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("vec_id") == F.col("a_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_vec_id").alias("n_kept"),
            F.round(F.count("a_vec_id") / F.lit(float(_TOP_K)), 6).alias(
                "overlap_at_k"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Dimension CORRELATION audit (first 16 components): Pearson r per
# dimension pair from one pass of decimal-exact moments — the table an
# embedding-pipeline owner reads to find dead dimensions (sd ≈ 0) and
# redundant pairs (|r| ≈ 1) before spending storage/compute on all 64.
# Pair products are generated ROW-LOCALLY (one explode of the 120-pair
# upper triangle per vector, no self-join), and every sum is the
# DECIMAL(25,12) order-free convention, so a single map-side-combinable
# aggregation carries the whole audit — the same cost shape at 100 TB.
# ---------------------------------------------------------------------------

_CORR_DIMS = 16

_DIM_CORR_SQL = f"""
WITH vecs AS (
    SELECT (CAST(embedding AS DOUBLE[]))[1:{_CORR_DIMS}] AS emb FROM embeddings
),
pairs AS (
    SELECT g.i, g2.j,
           emb[g.i + 1] AS vi,
           emb[g2.j + 1] AS vj
    FROM vecs,
         (SELECT UNNEST(range({_CORR_DIMS})) AS i) g,
         (SELECT UNNEST(range({_CORR_DIMS})) AS j) g2
    WHERE g.i < g2.j
),
moments AS (
    SELECT i, j,
           COUNT(*) AS n,
           CAST(SUM(CAST(vi AS DECIMAL(25,12))) AS DOUBLE) AS si,
           CAST(SUM(CAST(vj AS DECIMAL(25,12))) AS DOUBLE) AS sj,
           CAST(SUM(CAST(vi * vj AS DECIMAL(25,12))) AS DOUBLE) AS sij,
           CAST(SUM(CAST(vi * vi AS DECIMAL(25,12))) AS DOUBLE) AS sii,
           CAST(SUM(CAST(vj * vj AS DECIMAL(25,12))) AS DOUBLE) AS sjj
    FROM pairs GROUP BY i, j
)
SELECT i, j,
       ROUND((sij - si * sj / n) /
             (sqrt(sii - si * si / n) * sqrt(sjj - sj * sj / n)), 6) AS pearson_r
FROM moments
"""


@register("embedding_dim_correlation", oracle=_DIM_CORR_SQL)
def embedding_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    t = F.slice(_as_double("embedding"), 1, _CORR_DIMS)
    pair_structs = F.expr(
        f"""
        filter(
          flatten(transform(sequence(0, {_CORR_DIMS - 1}), i ->
            transform(sequence(0, {_CORR_DIMS - 1}), j ->
              struct(i AS i, j AS j, emb[i] AS vi, emb[j] AS vj)))),
          p -> p.i < p.j)
        """
    )
    dec = lambda c: F.sum(c.cast("decimal(25,12)")).cast("double")  # noqa: E731
    moments = (
        emb.select(t.alias("emb"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.i", "p.j", "p.vi", "p.vj")
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec(F.col("vi")).alias("si"),
            dec(F.col("vj")).alias("sj"),
            dec(F.col("vi") * F.col("vj")).alias("sij"),
            dec(F.col("vi") * F.col("vi")).alias("sii"),
            dec(F.col("vj") * F.col("vj")).alias("sjj"),
        )
    )
    n = F.col("n")
    return moments.select(
        "i",
        "j",
        F.round(
            (F.col("sij") - F.col("si") * F.col("sj") / n)
            / (
                F.sqrt(F.col("sii") - F.col("si") * F.col("si") / n)
                * F.sqrt(F.col("sjj") - F.col("sj") * F.col("sj") / n)
            ),
            6,
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training: for each query vector,
# the nearest SAME-label neighbor (the positive) and the top-3 nearest
# DIFFERENT-label neighbors (the hard negatives) — the pair set an
# embedding-model trainer feeds to a contrastive loss. Mining runs
# inside the query's IVF cell (the ANN accelerator shared with
# similarity_ivf_topk): candidates are cell-bounded, never the full
# corpus, so the scan is Σ cell² not n² — at 100 TB the cell join is
# the same shape the IVF index already pays. One scoring pass, two
# rankings split by pair type.
# ---------------------------------------------------------------------------

_HN_POS_K = 1
_HN_NEG_K = 3

_HARD_NEG_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
assigned AS (
    SELECT vec_id, label, emb, cid FROM (
        SELECT v.vec_id, v.label, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN centroids c
    ) WHERE rn = 1
),
queries AS (
    SELECT vec_id AS query_id, label AS qlabel, emb AS qemb, cid
    FROM assigned WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           CASE WHEN v.label = q.qlabel THEN 'pos' ELSE 'neg' END AS pair_type,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q JOIN assigned v ON q.cid = v.cid AND q.query_id <> v.vec_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id, pair_type ORDER BY cosine DESC, vec_id ASC
    ) AS rank FROM scored
)
SELECT query_id, pair_type, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked
WHERE (pair_type = 'pos' AND rank <= {_HN_POS_K})
   OR (pair_type = 'neg' AND rank <= {_HN_NEG_K})
"""


@register("similarity_hard_negatives", oracle=_HARD_NEG_SQL)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM) & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    sim_to_centroid = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (_normprod("emb", "cemb")),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("centroid_sim"), F.asc("cid"))
    assigned = (
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", sim_to_centroid.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(vecs, "vec_id")
    )
    queries = assigned.filter((F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qemb"),
        F.col("cid").alias("qcid"),
    )
    cosine = _dot(F.col("qemb"), F.col("emb")) / (
        _normprod("qemb", "emb")
    )
    scored = assigned.join(
        broadcast(queries),
        (F.col("qcid") == F.col("cid")) & (F.col("query_id") != F.col("vec_id")),
    ).select(
        "query_id",
        "vec_id",
        F.when(F.col("label") == F.col("qlabel"), "pos").otherwise("neg").alias("pair_type"),
        F.round(cosine, 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id", "pair_type").orderBy(F.desc("cosine"), F.asc("vec_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked.filter(
        ((F.col("pair_type") == "pos") & (F.col("rank") <= _HN_POS_K))
        | ((F.col("pair_type") == "neg") & (F.col("rank") <= _HN_NEG_K))
    ).select("query_id", "pair_type", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
# embedding — cluster the corpus (the IVF coarse quantizer above),
# then inside each cluster DROP every vector that has a lower-id
# neighbor above the cosine threshold (the paper keeps one exemplar
# per epsilon-ball; lowest vec_id is the deterministic exemplar rule,
# matching dedup_cluster_canonical's min-id convention). Candidates
# are cell-bounded — the pair scan is sum(cell^2) like the paper's
# within-cluster pass, never corpus^2 — and the threshold test uses
# ROUND(cosine, 6) so both engines make identical keep/drop calls.
# Output: the DROPPED vectors with their cell, their exemplar witness
# (the smallest qualifying lower id), witness count, and the max
# cosine that condemned them — the audit table a curation pipeline
# reviews before discarding data. The synthetic embeddings cap
# within-label cosine at ~0.47, so the production-style 0.9+ threshold
# would never fire; 0.35 exercises the full path at every SF.
#
# CANDIDATE BUDGET (the _BAND_ANCHORS / _auto_max_df house pattern,
# mirrored in the oracle): a witness must be one of its cell's
# _SEMDEDUP_ANCHORS smallest vec_ids. All-pairs within a cell is
# sum(cell^2) — with the audit's FIXED cell count that is O(n^2/16)
# and measured x17 at 10x data; the anchor shortlist bounds it at
# O(anchors * n), and matches the paper's practice of comparing
# against cluster exemplars rather than every member.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.35
_SEMDEDUP_ANCHORS = 16

_SEMDEDUP_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
assigned AS (
    SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN centroids c
    ) WHERE rn = 1
),
anchors AS (
    SELECT vec_id, cid, emb FROM (
        SELECT vec_id, cid, emb,
               ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS arn
        FROM assigned
    ) WHERE arn <= {_SEMDEDUP_ANCHORS}
),
pairs AS (
    SELECT b.vec_id, b.cid, a.vec_id AS witness_id,
           ROUND(list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
                 6) AS cosine
    FROM anchors a JOIN assigned b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
)
SELECT vec_id, cid,
       MIN(witness_id) AS exemplar_id,
       CAST(COUNT(*) AS BIGINT) AS n_witnesses,
       MAX(cosine) AS max_cosine
FROM pairs
WHERE cosine >= {_SEMDEDUP_TAU}
GROUP BY vec_id, cid
"""


@register("dedup_semdedup_ivf", oracle=_SEMDEDUP_SQL)
def dedup_semdedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM) & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    sim_to_centroid = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (_normprod("emb", "cemb")),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("centroid_sim"), F.asc("cid"))
    # Skinny assignment ranking (the IVF convention in this module),
    # embeddings re-attached by a narrow vec_id join.
    assigned = (
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", sim_to_centroid.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(vecs, "vec_id")
    )
    w_anchor = Window.partitionBy("cid").orderBy("vec_id")
    a = (
        assigned.withColumn("arn", F.row_number().over(w_anchor))
        .filter(F.col("arn") <= _SEMDEDUP_ANCHORS)
        .select(
            F.col("cid").alias("a_cid"),
            F.col("vec_id").alias("witness_id"),
            F.col("emb").alias("a_emb"),
        )
    )
    cosine = F.round(
        _dot(F.col("a_emb"), F.col("emb"))
        / (_normprod("a_emb", "emb")),
        6,
    )
    pairs = (
        assigned.join(
            a,
            (F.col("a_cid") == F.col("cid"))
            & (F.col("witness_id") < F.col("vec_id")),
        )
        .select("vec_id", "cid", "witness_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= _SEMDEDUP_TAU)
    )
    return pairs.groupBy("vec_id", "cid").agg(
        F.min("witness_id").alias("exemplar_id"),
        F.count(F.lit(1)).cast("long").alias("n_witnesses"),
        F.max("cosine").alias("max_cosine"),
    )


# ---------------------------------------------------------------------------
# SemDeDup label-precision eval: of the vectors SemDeDup drops, how
# many share their exemplar's LABEL? The synthetic embeddings cluster
# by label, so exemplar-label agreement is the ground-truth proxy for
# "the drop was a genuine semantic duplicate" — the audit a curation
# owner reads before trusting the dedup at scale, exactly as
# similarity_ann_recall audits the ANN index. Cost: the semdedup
# result (small) joined twice against the (vec_id, label) projection —
# broadcast-sized; counts and the precision ratio are exact rational
# arithmetic in both engines.
# ---------------------------------------------------------------------------

_SEMDEDUP_EVAL_SQL = f"""
WITH drops AS ({_SEMDEDUP_SQL}),
labeled AS (
    SELECT d.vec_id, d.exemplar_id,
           v.label AS drop_label, e.label AS exemplar_label
    FROM drops d
    JOIN embeddings v ON v.vec_id = d.vec_id
    JOIN embeddings e ON e.vec_id = d.exemplar_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN drop_label = exemplar_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same_label,
       ROUND(SUM(CASE WHEN drop_label = exemplar_label THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS label_precision
FROM labeled
"""


@register("dedup_semdedup_eval", oracle=_SEMDEDUP_EVAL_SQL)
def dedup_semdedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    drops = dedup_semdedup_ivf(spark, sf_dir).select("vec_id", "exemplar_id")
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # `drops` (the semdedup-dropped set) and the exemplar-label frame
    # (the full embeddings table, re-keyed) both grow with the data —
    # no forced broadcast hints (round-10 extension of the round-9
    # verdict's multimodal finding); plain equi-joins let AQE decide.
    labeled = (
        drops.join(labels.withColumnRenamed("label", "drop_label"), "vec_id")
        .join(
            labels.select(
                F.col("vec_id").alias("exemplar_id"),
                F.col("label").alias("exemplar_label"),
            ),
            "exemplar_id",
        )
    )
    same = F.sum(
        F.when(F.col("drop_label") == F.col("exemplar_label"), 1).otherwise(0)
    )
    return labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped"),
        same.cast("long").alias("n_same_label"),
        F.round(same / F.count(F.lit(1)).cast("double"), 6).alias("label_precision"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN compression used at
# the 100 TB design point (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): split each vector into M
# subvectors, quantize each against a per-subspace codebook of K
# codewords, and answer queries with asymmetric distance computation
# (ADC) — a per-query lookup table of exact subspace distances, summed
# over the stored codes. A 64-dim float vector compresses to M=4 bytes;
# the query scan touches ONLY the codes, never the raw vectors.
#
# Codebooks here are seeded from corpus exemplars (the kmeans-family
# _KM_MOD/_KM_REM/_KM_CAP subset — 16 codewords per subspace at every
# scale); refining them with Lloyd rounds is the already-implemented
# kmeans_converged_assignments loop and is orthogonal to the PQ
# encode/ADC machinery verified here.
#
# Cross-engine determinism: subspace L2² is the sequential
# zip-diff-square sum (Spark zip_with+aggregate ≡ DuckDB
# list_zip+list_transform+list_dot_product), rounded to 6dp before any
# comparison; code assignment ties break on codeword id; ADC sums the
# rounded per-subspace distances as DECIMAL(18,6) (associative ⇒
# partition-order-free); top-k carries the vec_id tie-break.
#
# Scale shape: the codebook (M·K = 64 rows) and the per-query LUT
# (|queries|·M·K ≤ 2,560 rows) are broadcast; encode is one linear
# scan producing n·M code rows; ADC is a broadcast hash join of codes
# against the LUT followed by a partial-agg shuffle on (query_id,
# vec_id) — no pairwise vector math at query time and no shuffle of
# the embedding table itself.
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = _EMB_DIM // _PQ_M  # dims per subspace (16)
_PQ_TOP = 10

_PQ_L2 = (
    "ROUND(list_dot_product("
    "list_transform(list_zip({a}, {b}), p -> p[1] - p[2]), "
    "list_transform(list_zip({a}, {b}), p -> p[1] - p[2])), 6)"
)

_PQ_BASE_SQL = f"""
vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
ms AS (SELECT UNNEST(range({_PQ_M})) AS m),
subs AS (
    SELECT vec_id, ms.m,
           emb[ms.m * {_PQ_SUB} + 1 : ms.m * {_PQ_SUB} + {_PQ_SUB}] AS sub
    FROM vecs, ms
),
cw AS (
    SELECT vec_id AS cid, ms.m,
           emb[ms.m * {_PQ_SUB} + 1 : ms.m * {_PQ_SUB} + {_PQ_SUB}] AS cwsub
    FROM vecs, ms
    WHERE vec_id % {_KM_MOD} = {_KM_REM} AND vec_id < {_KM_CAP}
),
codes AS (
    SELECT vec_id, m, cid AS code, d FROM (
        SELECT s.vec_id, s.m, c.cid,
               {_PQ_L2.format(a="s.sub", b="c.cwsub")} AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY {_PQ_L2.format(a="s.sub", b="c.cwsub")} ASC, c.cid ASC
               ) AS rn
        FROM subs s JOIN cw c ON s.m = c.m
    ) WHERE rn = 1
)
"""

_PQ_ADC_SQL = f"""
WITH {_PQ_BASE_SQL},
queries AS (
    SELECT vec_id AS query_id, m, sub AS qsub FROM subs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
lut AS (
    SELECT q.query_id, q.m, c.cid,
           {_PQ_L2.format(a="q.qsub", b="c.cwsub")} AS d
    FROM queries q JOIN cw c ON q.m = c.m
),
adc AS (
    SELECT l.query_id, k.vec_id,
           CAST(SUM(CAST(l.d AS DECIMAL(18,6))) AS DOUBLE) AS approx_dist
    FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.cid
    WHERE l.query_id <> k.vec_id
    GROUP BY l.query_id, k.vec_id
)
SELECT query_id, vec_id, approx_dist, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC
    ) AS rank FROM adc
) WHERE rank <= {_PQ_TOP}
"""


def _pq_l2(a: Column, b: Column) -> Column:
    """Sequential zip-diff-square L2², rounded — engine-shared."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _pq_subspaces(vecs: DataFrame, id_col: str, out: str) -> DataFrame:
    """(id, emb) → (id, m, sub): M contiguous subvector slices."""
    ms = F.sequence(F.lit(0), F.lit(_PQ_M - 1))
    return vecs.select(
        id_col, F.explode(ms).alias("m"), F.col("emb")
    ).select(
        id_col,
        "m",
        F.slice(F.col("emb"), F.col("m") * _PQ_SUB + 1, _PQ_SUB).alias(out),
    )


def _pq_codebook(vecs: DataFrame) -> DataFrame:
    """Per-subspace codewords from the kmeans-family exemplar seeds."""
    seeds = vecs.filter(
        (F.col("vec_id") % _KM_MOD == _KM_REM) & (F.col("vec_id") < _KM_CAP)
    ).select(F.col("vec_id").alias("cid"), "emb")
    return _pq_subspaces(seeds, "cid", "cwsub")


def _pq_codes(vecs: DataFrame) -> DataFrame:
    """Encode: nearest codeword per (vector, subspace) — keeps d for
    the distortion audit. One linear scan; the codebook is broadcast."""
    subs = _pq_subspaces(vecs, "vec_id", "sub")
    cb = _pq_codebook(vecs)
    scored = subs.join(broadcast(cb), "m").withColumn(
        "d", _pq_l2(F.col("sub"), F.col("cwsub"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("d"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("cid").alias("code"), "d")
    )


@register("similarity_pq_adc_topk", oracle=_PQ_ADC_SQL)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    codes = _pq_codes(vecs)
    qsubs = _pq_subspaces(
        vecs.filter(
            (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
        ).select(F.col("vec_id").alias("query_id"), "emb"),
        "query_id",
        "qsub",
    )
    lut = qsubs.join(broadcast(_pq_codebook(vecs)), "m").select(
        "query_id", "m", "cid", _pq_l2(F.col("qsub"), F.col("cwsub")).alias("qd")
    )
    adc = (
        codes.join(
            broadcast(lut),
            (codes.m == lut.m)
            & (codes.code == lut.cid)
            & (lut.query_id != codes.vec_id),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qd").cast("decimal(18,6)")).cast("double").alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_TOP)
        .select("query_id", "vec_id", "approx_dist", F.col("rank").cast("long").alias("rank"))
    )


_PQ_DISTORTION_SQL = f"""
WITH {_PQ_BASE_SQL}
SELECT m,
       ROUND(CAST(SUM(CAST(d AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
           AS mean_sq_err,
       CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes_used,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM codes GROUP BY m
"""


@register("embedding_pq_distortion", oracle=_PQ_DISTORTION_SQL)
def embedding_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality audit: per-subspace mean squared error of
    the PQ encoding and codebook utilization — the numbers that decide
    whether M/K need retuning before a corpus-wide rollout."""
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    return _pq_codes(vecs).groupBy("m").agg(
        F.round(
            F.sum(F.col("d").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_sq_err"),
        F.countDistinct("code").alias("n_codes_used"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# PQ quality evaluation: recall@k of ADC top-k against exact L2 ground
# truth (PQ approximates L2, so the truth side is the exact full-vector
# L2 top-k, not the cosine baseline). Same count-ratio recall shape as
# similarity_ann_recall; the brute-force truth is the fixed-size query
# set × corpus linear scan, the ADC side reuses the codes plan.
# ---------------------------------------------------------------------------

_PQ_TRUTH_SQL = f"""
SELECT query_id, vec_id FROM (
    SELECT q.query_id, v.vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {_PQ_L2.format(a="q.qemb", b="v.emb")} ASC, v.vec_id ASC
           ) AS rank
    FROM (SELECT vec_id AS query_id, emb AS qemb FROM vecs
          WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}) q
    CROSS JOIN vecs v
    WHERE q.query_id <> v.vec_id
) WHERE rank <= {_PQ_TOP}
"""

_PQ_RECALL_SQL = f"""
WITH {_PQ_BASE_SQL},
queries AS (
    SELECT vec_id AS query_id, m, sub AS qsub FROM subs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
lut AS (
    SELECT q.query_id, q.m, c.cid,
           {_PQ_L2.format(a="q.qsub", b="c.cwsub")} AS d
    FROM queries q JOIN cw c ON q.m = c.m
),
approx AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC
               ) AS rank
        FROM (
            SELECT l.query_id, k.vec_id,
                   CAST(SUM(CAST(l.d AS DECIMAL(18,6))) AS DOUBLE) AS approx_dist
            FROM codes k JOIN lut l ON k.m = l.m AND k.code = l.cid
            WHERE l.query_id <> k.vec_id
            GROUP BY l.query_id, k.vec_id
        )
    ) WHERE rank <= {_PQ_TOP}
),
truth AS ({_PQ_TRUTH_SQL})
SELECT t.query_id,
       COUNT(a.vec_id) AS n_hits,
       ROUND(COUNT(a.vec_id) / CAST({_PQ_TOP} AS DOUBLE), 6) AS recall_at_k
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY t.query_id
"""


@register("similarity_pq_recall", oracle=_PQ_RECALL_SQL)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    truth = (
        vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", _pq_l2(F.col("qemb"), F.col("emb")).alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_TOP)
        .select("query_id", "vec_id")
    )
    approx = similarity_pq_adc_topk(spark, sf_dir).select(
        F.col("query_id").alias("a_query_id"), F.col("vec_id").alias("a_vec_id")
    )
    return (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("vec_id") == F.col("a_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_vec_id").alias("n_hits"),
            F.round(F.count("a_vec_id") / F.lit(float(_PQ_TOP)), 6).alias("recall_at_k"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the production ANN index architecture (FAISS IVFPQ; Jégou et
# al. 2011 §V): a coarse IVF quantizer routes each query to its nearest
# NPROBE cells, and candidates inside those cells are scored by PQ
# asymmetric distance over their 4-byte codes — so query cost is
# (corpus/cells · nprobe) LUT lookups, never a full scan and never raw
# vectors. Composes the two oracle-checked building blocks verbatim:
# the coarse assignment is similarity_ivf_multiprobe's (cosine-ranked
# exemplar centroids), the fine scorer is similarity_pq_adc's
# (codes + broadcast per-query LUT, DECIMAL-summed).
#
# Scale shape: one corpus × 16-centroid broadcast assignment (skinny
# rows), one broadcast LUT hash join over the probed cells' codes, one
# partial-agg shuffle on (query_id, vec_id). The cell routing bounds
# the ADC row count at |probed cells| · cell size.
# ---------------------------------------------------------------------------

_IVFPQ_SQL = f"""
WITH {_PQ_BASE_SQL},
centroids AS (
    SELECT vec_id AS ccid, emb AS cemb FROM vecs
    WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
ranked_assign AS (
    SELECT v.vec_id, c.ccid,
           ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.ccid ASC
           ) AS rn
    FROM vecs v CROSS JOIN centroids c
),
assigned AS (SELECT vec_id, ccid FROM ranked_assign WHERE rn = 1),
probes AS (
    SELECT vec_id AS query_id, ccid AS probe_cid
    FROM ranked_assign
    WHERE rn <= {_NPROBE} AND vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
queries AS (
    SELECT vec_id AS query_id, m, sub AS qsub FROM subs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
lut AS (
    SELECT q.query_id, q.m, c.cid,
           {_PQ_L2.format(a="q.qsub", b="c.cwsub")} AS d
    FROM queries q JOIN cw c ON q.m = c.m
),
cand AS (
    SELECT p.query_id, a.vec_id
    FROM probes p JOIN assigned a ON p.probe_cid = a.ccid AND p.query_id <> a.vec_id
),
adc AS (
    SELECT n.query_id, n.vec_id,
           CAST(SUM(CAST(l.d AS DECIMAL(18,6))) AS DOUBLE) AS approx_dist
    FROM cand n
    JOIN codes k ON k.vec_id = n.vec_id
    JOIN lut l ON l.query_id = n.query_id AND l.m = k.m AND l.cid = k.code
    GROUP BY n.query_id, n.vec_id
)
SELECT query_id, vec_id, approx_dist, rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dist ASC, vec_id ASC
    ) AS rank FROM adc
) WHERE rank <= {_PQ_TOP}
"""


@register("similarity_ivfpq_topk", oracle=_IVFPQ_SQL)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM)
        & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("ccid"), F.col("emb").alias("cemb"))
    sim = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (
            _normprod("emb", "cemb")
        ),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("ccid"))
    # Skinny assignment rows (vec_id, ccid, rn) — embeddings projected
    # away before the window shuffle, re-attached never (the fine
    # scorer reads codes, not vectors).
    ranked_assign = session_cache(
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "ccid", sim.alias("csim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .select("vec_id", "ccid", "rn")
    )
    assigned = ranked_assign.filter(F.col("rn") == 1).select("vec_id", "ccid")
    probes = ranked_assign.filter(
        (F.col("rn") <= _NPROBE)
        & (F.col("vec_id") % _QUERY_MOD == 0)
        & (F.col("vec_id") < _QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("ccid").alias("probe_cid"))
    codes = _pq_codes(vecs)
    qsubs = _pq_subspaces(
        vecs.filter(
            (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
        ).select(F.col("vec_id").alias("query_id"), "emb"),
        "query_id",
        "qsub",
    )
    lut = qsubs.join(broadcast(_pq_codebook(vecs)), "m").select(
        "query_id", "m", "cid", _pq_l2(F.col("qsub"), F.col("cwsub")).alias("qd")
    )
    cand = assigned.join(
        broadcast(probes),
        (F.col("probe_cid") == F.col("ccid")) & (F.col("query_id") != F.col("vec_id")),
    ).select("query_id", "vec_id")
    adc = (
        cand.join(codes, "vec_id")
        .join(
            broadcast(lut.withColumnRenamed("query_id", "l_query_id")),
            (F.col("l_query_id") == F.col("query_id"))
            & (lut.m == codes.m)
            & (F.col("cid") == F.col("code")),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qd").cast("decimal(18,6)")).cast("double").alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_TOP)
        .select("query_id", "vec_id", "approx_dist", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Mutual (reciprocal) k-NN pairs over the fixed evaluation set — the
# symmetric-neighbor criterion used for near-duplicate graph edges and
# diversity filtering: keep (a, b) only if b is in a's top-k AND a is
# in b's top-k. One-directional kNN keeps hub vectors that everything
# points at; the reciprocal test removes them, which is why mutual-kNN
# is the standard edge rule for dedup clustering over embeddings.
#
# Scale notes: the eval set is FIXED-size by the same cap convention as
# every similarity audit (vec_id % MOD with an absolute cap → ≤200
# vectors at any corpus size), so the pairwise pass is O(200²) however
# big the corpus is — at production scale the same reciprocal-join step
# runs over each query's ANN candidate list instead of a dense set. The
# kNN frame is computed once, cached, and self-joined on the reversed
# key pair (an equi-join, not a second scoring pass).
# ---------------------------------------------------------------------------

_MUTUAL_MOD = 10
_MUTUAL_CAP = _MUTUAL_MOD * 200  # ≤200 eval vectors at any corpus size
_MUTUAL_K = 5

_MUTUAL_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    WHERE vec_id % {_MUTUAL_MOD} = 0 AND vec_id < {_MUTUAL_CAP}
),
scored AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
                 4) AS cosine
    FROM vecs a JOIN vecs b ON a.vec_id <> b.vec_id
),
knn AS (
    SELECT * FROM (
        SELECT a_id, b_id, cosine, ROW_NUMBER() OVER (
            PARTITION BY a_id ORDER BY cosine DESC, b_id ASC
        ) AS rnk FROM scored
    ) WHERE rnk <= {_MUTUAL_K}
)
SELECT x.a_id AS a_id, x.b_id AS b_id, x.cosine AS cosine,
       CAST(x.rnk AS BIGINT) AS rank_ab, CAST(y.rnk AS BIGINT) AS rank_ba
FROM knn x JOIN knn y ON x.a_id = y.b_id AND x.b_id = y.a_id
WHERE x.a_id < x.b_id
"""


@register("similarity_mutual_topk", oracle=_MUTUAL_SQL)
def similarity_mutual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    vecs = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") % _MUTUAL_MOD == 0) & (F.col("vec_id") < _MUTUAL_CAP)
    ).select("vec_id", _as_double("embedding").alias("emb"))
    a = vecs.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("aemb"))
    b = vecs.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("bemb"))
    scored = a.join(broadcast(b), F.col("a_id") != F.col("b_id")).select(
        "a_id",
        "b_id",
        F.round(
            _dot(F.col("aemb"), F.col("bemb"))
            / (
                _normprod("aemb", "bemb")
            ),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("b_id"))
    knn = session_cache(
        scored.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= _MUTUAL_K
        )
    )
    x, y = knn.alias("x"), knn.alias("y")
    return (
        x.join(
            y,
            (F.col("x.a_id") == F.col("y.b_id")) & (F.col("x.b_id") == F.col("y.a_id")),
        )
        .filter(F.col("x.a_id") < F.col("x.b_id"))
        .select(
            F.col("x.a_id").alias("a_id"),
            F.col("x.b_id").alias("b_id"),
            F.col("x.cosine").alias("cosine"),
            F.col("x.rnk").cast("long").alias("rank_ab"),
            F.col("y.rnk").cast("long").alias("rank_ba"),
        )
    )


# ---------------------------------------------------------------------------
# MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
# diversified rerank: retrieval that penalizes returning ten copies of
# the same near-duplicate — score = λ·rel(q,d) − (1−λ)·sim(d, selected).
# Full MMR is a sequential greedy loop; the distributed form used in
# practice (and here) is the one-step variant: take the top-R relevance
# shortlist, fix the top-1 as the selected anchor, rerank the remainder
# by λ·rel − (1−λ)·sim(d, top1), and emit top-K. That removes the
# dominant duplicate cluster around the best hit in one shuffle-free
# rescoring pass instead of K sequential passes.
#
# Scale notes: the query set is the fixed-cap eval convention (≤10
# queries at any scale); relevance scoring is the broadcast corpus scan
# every retrieval query here uses; the rerank operates on R=20 rows per
# query — driver-free, bounded, one broadcast join against the 1-row-
# per-query anchor frame. λ·rel arithmetic: products/divisions of
# rounded doubles are correctly rounded IEEE in both engines.
# ---------------------------------------------------------------------------

_MMR_QUERY_MOD = 200
_MMR_QUERY_CAP = 2000   # ≤10 query vectors at any corpus size
_MMR_SHORTLIST = 20
_MMR_TOP = 10
_MMR_LAMBDA = "0.7"

_MMR_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs
    WHERE vec_id % {_MMR_QUERY_MOD} = 0 AND vec_id < {_MMR_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id, v.emb,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS rel
    FROM queries q JOIN vecs v ON q.query_id <> v.vec_id
),
short AS (
    SELECT * FROM (
        SELECT query_id, vec_id, emb, rel, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rel DESC, vec_id ASC
        ) AS rn FROM scored
    ) WHERE rn <= {_MMR_SHORTLIST}
),
anchor AS (SELECT query_id, vec_id AS a_id, emb AS a_emb, rel AS a_rel FROM short WHERE rn = 1),
rerank AS (
    SELECT s.query_id, s.vec_id, s.rel,
           ROUND({_MMR_LAMBDA} * s.rel - (1 - {_MMR_LAMBDA}) *
                 ROUND(list_dot_product(s.emb, a.a_emb) /
                       (sqrt(list_dot_product(s.emb, s.emb)) * sqrt(list_dot_product(a.a_emb, a.a_emb))),
                       4), 6) AS mmr_score
    FROM short s JOIN anchor a USING (query_id)
    WHERE s.rn > 1
),
picked AS (
    SELECT * FROM (
        SELECT query_id, vec_id, rel, mmr_score, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY mmr_score DESC, vec_id ASC
        ) AS rn2 FROM rerank
    ) WHERE rn2 <= {_MMR_TOP} - 1
)
SELECT query_id, a_id AS vec_id, a_rel AS rel_cosine,
       ROUND({_MMR_LAMBDA} * a_rel, 6) AS mmr_score,
       CAST(1 AS BIGINT) AS final_rank
FROM anchor
UNION ALL
SELECT query_id, vec_id, rel AS rel_cosine, mmr_score,
       CAST(rn2 + 1 AS BIGINT) AS final_rank
FROM picked
"""


@register("similarity_mmr_rerank", oracle=_MMR_SQL)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    lam = float(_MMR_LAMBDA)
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter(
        (F.col("vec_id") % _MMR_QUERY_MOD == 0) & (F.col("vec_id") < _MMR_QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    scored = vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        "emb",
        F.round(
            _dot(F.col("qemb"), F.col("emb"))
            / (
                _normprod("qemb", "emb")
            ),
            4,
        ).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    short = session_cache(
        scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= _MMR_SHORTLIST
        )
    )
    anchor = short.filter(F.col("rn") == 1).select(
        "query_id",
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("rel").alias("a_rel"),
    )
    div = F.round(
        _dot(F.col("emb"), F.col("a_emb"))
        / (
            _normprod("emb", "a_emb")
        ),
        4,
    )
    rerank = (
        short.filter(F.col("rn") > 1)
        .join(broadcast(anchor), "query_id")
        .select(
            "query_id",
            "vec_id",
            "rel",
            F.round(lam * F.col("rel") - (1 - lam) * div, 6).alias("mmr_score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("mmr_score"), F.asc("vec_id"))
    picked = rerank.withColumn("rn2", F.row_number().over(w2)).filter(
        F.col("rn2") <= _MMR_TOP - 1
    )
    first = anchor.select(
        "query_id",
        F.col("a_id").alias("vec_id"),
        F.col("a_rel").alias("rel_cosine"),
        F.round(lam * F.col("a_rel"), 6).alias("mmr_score"),
        F.lit(1).cast("long").alias("final_rank"),
    )
    rest = picked.select(
        "query_id",
        "vec_id",
        F.col("rel").alias("rel_cosine"),
        "mmr_score",
        (F.col("rn2") + 1).cast("long").alias("final_rank"),
    )
    return first.unionByName(rest)


# ---------------------------------------------------------------------------
# Filtered vector search — ANN under a metadata predicate (label IN
# (0,1,2)), the query shape every production vector store added after
# plain top-k (Qdrant/Vespa/Milvus "filtered search"): the index is
# built on the FULL corpus, the filter applies at probe time
# (pre-filtering inside the cell), and the audit reports recall against
# the filtered brute-force truth plus the per-query surviving candidate
# count — the number that explains WHY filtered recall drops (a
# selective filter empties the probed cell; the production fix is more
# probes or a filter-aware index).
#
# Scale notes: same fixed 16-cell coarse quantizer and ≤40-query eval
# cap as every IVF audit here (O(n·16) assignment, O(n) probe); the
# label filter prunes the probe scan BEFORE scoring, so selectivity
# directly reduces work — the plan the predicate-pushdown gate checks.
# ---------------------------------------------------------------------------

_FILT_LABELS = "(0, 1, 2)"
_FILT_K = 5

_FILTERED_ANN_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
filt AS (SELECT * FROM vecs WHERE label IN {_FILT_LABELS}),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
truth AS (
    SELECT query_id, vec_id FROM (
        SELECT q.query_id, v.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_dot_product(q.qemb, v.emb) /
                       (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))), 4) DESC,
                       v.vec_id ASC
               ) AS rank
        FROM queries q JOIN filt v ON q.query_id <> v.vec_id
    ) WHERE rank <= {_FILT_K}
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs
    WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM} AND vec_id < {_CENTROID_CAP}
),
fassigned AS (
    SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC, c.cid ASC
               ) AS rn
        FROM filt v CROSS JOIN centroids c
    ) WHERE rn = 1
),
qassigned AS (
    SELECT query_id, qemb, cid FROM (
        SELECT q.query_id, q.qemb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_IVF_COS.format(a='q.qemb', b='c.cemb')} DESC, c.cid ASC
               ) AS rn
        FROM queries q CROSS JOIN centroids c
    ) WHERE rn = 1
),
cand AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine
    FROM qassigned q JOIN fassigned v ON q.cid = v.cid AND q.query_id <> v.vec_id
),
approx AS (
    SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
        ) AS rank FROM cand
    ) WHERE rank <= {_FILT_K}
),
counts AS (
    SELECT q.query_id, COUNT(c.vec_id) AS n_candidates
    FROM queries q LEFT JOIN cand c USING (query_id) GROUP BY q.query_id
),
hits AS (
    SELECT t.query_id, COUNT(a.vec_id) AS n_hits
    FROM truth t LEFT JOIN approx a
      ON t.query_id = a.query_id AND t.vec_id = a.vec_id
    GROUP BY t.query_id
)
SELECT c.query_id,
       CAST(c.n_candidates AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / CAST({_FILT_K} AS DOUBLE), 6) AS recall_at_k
FROM counts c LEFT JOIN hits h USING (query_id)
"""


@register("similarity_filtered_ann", oracle=_FILTERED_ANN_SQL)
def similarity_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    labels = [0, 1, 2]
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        )
    )
    filt = vecs.filter(F.col("label").isin(labels)).select("vec_id", "emb")
    queries = session_cache(
        vecs.filter(
            (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
        ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    )
    cos_qv = F.round(
        _dot(F.col("qemb"), F.col("emb"))
        / (
            _normprod("qemb", "emb")
        ),
        4,
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    truth = (
        filt.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos_qv.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= _FILT_K)
        .select("query_id", "vec_id")
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM)
        & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    cos_vc = F.round(
        _dot(F.col("emb"), F.col("cemb"))
        / (
            _normprod("emb", "cemb")
        ),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    fassigned = (
        filt.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", cos_vc.alias("csim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(filt, "vec_id")
    )
    cos_qc = F.round(
        _dot(F.col("qemb"), F.col("cemb"))
        / (
            _normprod("qemb", "cemb")
        ),
        6,
    )
    w_qassign = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    qassigned = (
        queries.crossJoin(broadcast(centroids))
        .select("query_id", "cid", cos_qc.alias("csim"))
        .withColumn("rn", F.row_number().over(w_qassign))
        .filter(F.col("rn") == 1)
        .select("query_id", "cid")
        .join(queries, "query_id")
    )
    cand = session_cache(
        fassigned.alias("v")
        .join(
            broadcast(qassigned.alias("q")),
            (F.col("q.cid") == F.col("v.cid"))
            & (F.col("q.query_id") != F.col("v.vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q.qemb"), F.col("v.emb"))
                / (
                    _normprod("q.qemb", "v.emb")
                ),
                4,
            ).alias("cosine"),
        )
    )
    approx = (
        cand.withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= _FILT_K)
        .select("query_id", "vec_id")
    )
    counts = (
        queries.select("query_id")
        .join(cand.select("query_id", "vec_id"), "query_id", "left")
        .groupBy("query_id")
        .agg(F.count("vec_id").cast("long").alias("n_candidates"))
    )
    hits = (
        truth.join(
            approx.select(
                F.col("query_id").alias("a_query_id"), F.col("vec_id").alias("a_vec_id")
            ),
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("vec_id") == F.col("a_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vec_id").alias("n_hits"))
    )
    return counts.join(hits, "query_id", "left").select(
        "query_id",
        "n_candidates",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(_FILT_K)), 6).alias(
            "recall_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009, the
# default fusion in every hybrid lexical+vector search stack): BM25
# top-20 (text_bm25_retrieval, reused unchanged) fused with the
# cosine top-20 against a fixed query embedding, score =
# Σ 1/(k + rank) with k=60 over whichever lists contain the doc.
# RRF needs only RANKS — no score calibration between the two systems
# — which is exactly why it is the production default. The embeddings
# table indexes documents 1:1 by id here (vec_id ≡ doc_id), the usual
# layout when an embedding pipeline writes alongside the corpus.
#
# Determinism: ranks are exact integers; each RRF term is one
# correctly-rounded division and the two-term sum is a fixed-order
# IEEE chain, mirrored verbatim in the oracle. Scale: both inputs are
# top-k lists (≤20 rows each) — the fusion is a toy-sized full-outer
# join whatever the corpus size; the linear work lives in the two
# retrievers, each already audited.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 15
_RRF_QVEC = 0  # query embedding: vec_id 0


def _bm25_sql() -> str:
    from deathmetal_datalake_spark.plans.text import _BM25_SQL

    return _BM25_SQL


_HYBRID_SQL = f"""
WITH lex AS ({{bm25}}),
vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
q AS (SELECT emb AS qemb FROM vecs WHERE vec_id = {_RRF_QVEC}),
vscore AS (
    SELECT v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM vecs v CROSS JOIN q
    WHERE v.vec_id <> {_RRF_QVEC}
),
vrank AS (
    SELECT vec_id, r_vec FROM (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS r_vec
        FROM vscore
    ) WHERE r_vec <= 20
),
fused AS (
    SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id, l.rank AS r_lex, v.r_vec
    FROM lex l FULL OUTER JOIN vrank v ON l.doc_id = v.vec_id
),
scored AS (
    SELECT doc_id, r_lex, r_vec,
           ROUND(COALESCE(1.0 / ({_RRF_K} + r_lex), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + r_vec), 0.0), 6) AS rrf_score
    FROM fused
)
SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec,
       rrf_score, CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
    FROM scored
) WHERE fused_rank <= {_RRF_TOP}
"""


@register("similarity_hybrid_rrf_fusion", oracle=None)
def similarity_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.text import text_bm25_retrieval

    lex = text_bm25_retrieval(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("r_lex")
    )
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    q = vecs.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("emb").alias("qemb")
    )
    vscore = vecs.filter(F.col("vec_id") != _RRF_QVEC).crossJoin(broadcast(q)).select(
        "vec_id",
        F.round(
            _dot(F.col("qemb"), F.col("emb"))
            / (
                _normprod("qemb", "emb")
            ),
            4,
        ).alias("cosine"),
    )
    # Explicit top-k (TakeOrderedAndProject), not an unpartitioned
    # window over the corpus-sized score frame; the row_number then
    # ranks only the 20 surviving rows.
    top_v = vscore.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(20)
    w_v = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    vrank = top_v.withColumn("r_vec", F.row_number().over(w_v)).select(
        "vec_id", "r_vec"
    )
    fused = lex.join(vrank, lex["doc_id"] == vrank["vec_id"], "full_outer").select(
        F.coalesce(lex["doc_id"], vrank["vec_id"]).alias("doc_id"),
        "r_lex",
        "r_vec",
    )
    term = lambda r: F.coalesce(1.0 / (_RRF_K + F.col(r)), F.lit(0.0))
    scored = fused.withColumn("rrf_score", F.round(term("r_lex") + term("r_vec"), 6))
    w_f = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "doc_id",
            F.col("r_lex").cast("long").alias("r_lex"),
            F.col("r_vec").cast("long").alias("r_vec"),
            "rrf_score",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


# Register the oracle after definition: it embeds the BM25 SQL, which
# lives in plans.text (imported lazily to avoid a cycle at module load).
def _register_hybrid_oracle() -> None:
    from deathmetal_datalake_spark.plans.registry import ORACLES

    ORACLES["similarity_hybrid_rrf_fusion"] = _HYBRID_SQL.format(bm25=_bm25_sql())


_register_hybrid_oracle()


# ---------------------------------------------------------------------------
# Binary sign quantization (1 bit/dim) + Hamming retrieval recall — the
# cheapest embedding compression that still retrieves (64 dims -> one
# 64-bit signature, 256x smaller than float32): pack sign bits into two
# BIGINT words (60+4, keeping both non-negative for engine-portable
# xor/bit_count), rank the eval queries' neighbors by Hamming distance,
# and audit recall@k against exact cosine. The quantize+rank path is
# the 100 TB shape (signatures fit executor memory where floats never
# would); the exact-cosine side stays bounded by the _QUERY_CAP eval
# protocol shared with the rest of the family.
# ---------------------------------------------------------------------------

def _sign_pack_sql(lo: int, hi: int) -> str:
    """Σ_{i in [lo,hi)} (emb[i+1] > 0) << (i-lo) — DuckDB side."""
    return (
        f"list_aggregate(list_transform(range({lo}, {hi}), i -> "
        f"CASE WHEN emb[i + 1] > 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) "
        f"ELSE CAST(0 AS BIGINT) END), 'sum')"
    )


def _sign_pack_col(lo: int, hi: int):
    return F.expr(
        f"aggregate(sequence({lo}, {hi - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + IF(element_at(emb, i + 1) > CAST(0 AS DOUBLE), "
        f"shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT)))"
    )


_SIGNQ_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
packed AS (
    SELECT vec_id, emb,
           {_sign_pack_sql(0, 60)} AS b0,
           {_sign_pack_sql(60, 64)} AS b1
    FROM vecs
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb, b0 AS qb0, b1 AS qb1
    FROM packed WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
ham AS (
    SELECT q.query_id, v.vec_id,
           bit_count(CAST(xor(q.qb0, v.b0) AS BIGINT))
           + bit_count(CAST(xor(q.qb1, v.b1) AS BIGINT)) AS hamming
    FROM queries q CROSS JOIN packed v
    WHERE q.query_id <> v.vec_id
),
bin_top AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY hamming ASC, vec_id ASC
        ) AS rank FROM ham
    ) WHERE rank <= {_TOP_K}
),
cos AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb)) * sqrt(list_dot_product(v.emb, v.emb))),
                 4) AS cosine
    FROM queries q CROSS JOIN vecs v
    WHERE q.query_id <> v.vec_id
),
cos_top AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
        ) AS rank FROM cos
    ) WHERE rank <= {_TOP_K}
)
SELECT b.query_id,
       CAST(COUNT(c.vec_id) AS BIGINT) AS n_overlap,
       ROUND(CAST(COUNT(c.vec_id) AS DOUBLE) / {_TOP_K}, 6) AS recall_at_k,
       ROUND(CAST(SUM(b.hamming) AS DOUBLE) / {_TOP_K}, 6) AS mean_hamming_top
FROM bin_top b
LEFT JOIN cos_top c ON b.query_id = c.query_id AND b.vec_id = c.vec_id
GROUP BY b.query_id
"""


@register("similarity_binary_sign_quant", oracle=_SIGNQ_SQL)
def similarity_binary_sign_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    packed = session_cache(
        spread(vecs).select(
            "vec_id", "emb",
            _sign_pack_col(0, 60).alias("b0"),
            _sign_pack_col(60, 64).alias("b1"),
        )
    )
    queries = packed.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    ham = (
        packed.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.bit_count(F.col("qb0").bitwiseXOR(F.col("b0")))
                + F.bit_count(F.col("qb1").bitwiseXOR(F.col("b1")))
            ).cast("long").alias("hamming"),
        )
    )
    w_ham = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    bin_top = ham.withColumn("rank", F.row_number().over(w_ham)).filter(
        F.col("rank") <= _TOP_K
    )
    cos = (
        packed.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("emb"))
                / (
                    _normprod("qemb", "emb")
                ),
                4,
            ).alias("cosine"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    cos_top = (
        cos.withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", F.col("vec_id").alias("c_vec_id"))
    )
    joined = bin_top.join(
        cos_top,
        (bin_top.query_id == cos_top.query_id)
        & (bin_top.vec_id == cos_top.c_vec_id),
        "left",
    ).select(bin_top.query_id, bin_top.hamming, cos_top.c_vec_id)
    return joined.groupBy("query_id").agg(
        F.count("c_vec_id").cast("long").alias("n_overlap"),
        F.round(F.count("c_vec_id").cast("double") / _TOP_K, 6).alias("recall_at_k"),
        F.round(F.sum("hamming").cast("double") / _TOP_K, 6).alias(
            "mean_hamming_top"
        ),
    )


# ---------------------------------------------------------------------------
# Radius (range) search — the THRESHOLD-based retrieval twin of top-k:
# for each query vector, every corpus vector within a cosine radius,
# folded to per-query neighborhood stats (count, max similarity, the
# argmax neighbor with a total-order tie-break). Top-k answers "best k
# whatever the quality"; range search answers "everything at least
# this similar" — the primitive behind near-dup thresholds and recall
# floors. Cosines are ROUNDED BEFORE the threshold compare and before
# the argmax (the repo's rounded-before-compare rule), so both engines
# classify borderline neighbors identically. Scale: the fixed-size
# query set (_QUERY_CAP ≤ 40) is broadcast against the corpus scan —
# O(n·40), same linear shape as the brute-force baseline; a bucketed
# corpus reuses the IVF cells exactly as the top-k variants do.
# ---------------------------------------------------------------------------

_RADIUS = 0.2  # cosine threshold (the synthetic corpus peaks at ~0.47)

_RADIUS_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine
    FROM queries q CROSS JOIN vecs v
    WHERE q.query_id <> v.vec_id
),
hits AS (
    SELECT query_id, vec_id, cosine FROM scored WHERE cosine >= {_RADIUS}
),
stats AS (
    SELECT query_id, COUNT(*) AS n_within, MAX(cosine) AS max_cosine
    FROM hits GROUP BY query_id
)
SELECT s.query_id,
       CAST(s.n_within AS BIGINT) AS n_within,
       s.max_cosine,
       MIN(h.vec_id) AS nearest_vec_id
FROM stats s
JOIN hits h ON h.query_id = s.query_id AND h.cosine = s.max_cosine
GROUP BY s.query_id, s.n_within, s.max_cosine
ORDER BY s.query_id
"""


@register("similarity_radius_search", oracle=_RADIUS_SQL)
def similarity_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    scored = vecs.join(
        broadcast(queries), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qemb"), F.col("emb"))
            / (
                _normprod("qemb", "emb")
            ),
            4,
        ).alias("cosine"),
    )
    hits = scored.filter(F.col("cosine") >= _RADIUS)
    stats = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_within"),
        F.max("cosine").alias("max_cosine"),
    )
    return (
        hits.join(broadcast(stats), "query_id")
        .filter(F.col("cosine") == F.col("max_cosine"))
        .groupBy("query_id", "n_within", "max_cosine")
        .agg(F.min("vec_id").alias("nearest_vec_id"))
        .select("query_id", "n_within", "max_cosine", "nearest_vec_id")
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Label-centroid drift — the embedding-space monitoring check run when
# a corpus (or encoder) changes: per label, the L2 distance between
# the centroids of two cohorts (even/odd vec_id here; in production,
# yesterday's snapshot vs today's). Per-dimension means use the exact
# DECIMAL sum convention and are ROUNDED BEFORE differencing, and the
# squared diffs are decimal-summed (order-free), so the rounded drift
# agrees bit-for-bit. Cost: one posexplode aggregate — (n·64 rows,
# map-side combinable) — then label×64 tiny frames; linear at any
# corpus size.
# ---------------------------------------------------------------------------

# Single source of truth for embedding width (ADVICE r8): reuse _EMB_DIM
# rather than a parallel constant that could drift.
_DRIFT_DIMS = _EMB_DIM

_CENTROID_DRIFT_SQL = f"""
WITH vecs AS (
    SELECT label, vec_id % 2 AS cohort, CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings
),
comps AS (
    SELECT label, cohort, g.i AS dim, emb[g.i + 1] AS v
    FROM vecs, (SELECT UNNEST(range({_DRIFT_DIMS})) AS i) g
),
cents AS (
    SELECT label, cohort, dim,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 6)
               AS c
    FROM comps GROUP BY label, cohort, dim
),
sizes AS (
    SELECT label,
           CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) / {_DRIFT_DIMS}
                AS BIGINT) AS n_even,
           CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) / {_DRIFT_DIMS}
                AS BIGINT) AS n_odd
    FROM comps GROUP BY label
),
drift AS (
    SELECT a.label,
           ROUND(sqrt(CAST(SUM(CAST((a.c - b.c) * (a.c - b.c)
                                    AS DECIMAL(25,12))) AS DOUBLE)), 6)
               AS centroid_l2_drift
    FROM cents a JOIN cents b
      ON a.label = b.label AND a.dim = b.dim AND a.cohort = 0 AND b.cohort = 1
    GROUP BY a.label
)
SELECT s.label, s.n_even, s.n_odd, d.centroid_l2_drift
FROM sizes s JOIN drift d USING (label)
ORDER BY s.label
"""


@register("similarity_label_centroid_drift", oracle=_CENTROID_DRIFT_SQL)
def similarity_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "label",
            (F.col("vec_id") % 2).alias("cohort"),
            _as_double("embedding").alias("emb"),
        )
    )
    comps = emb.select("label", "cohort", F.posexplode("emb").alias("dim", "v"))
    cents = comps.groupBy("label", "cohort", "dim").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c")
    )
    sizes = comps.groupBy("label").agg(
        (
            F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)) / _DRIFT_DIMS
        )
        .cast("long")
        .alias("n_even"),
        (
            F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)) / _DRIFT_DIMS
        )
        .cast("long")
        .alias("n_odd"),
    )
    a = cents.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("c").alias("ca")
    )
    b = cents.filter(F.col("cohort") == 1).select(
        "label", "dim", F.col("c").alias("cb")
    )
    sq = (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
    drift = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum(sq.cast("decimal(25,12)")).cast("double")), 6
            ).alias("centroid_l2_drift")
        )
    )
    return sizes.join(drift, "label").orderBy("label")


# ---------------------------------------------------------------------------
# Embedding-norm outlier audit — the vector-quality gate before any
# cosine index is trusted: per label, robust (median/MAD) profiling of
# L2 norms, flagging vectors whose norm deviates > 3σ-equivalent. A
# zero-centered or truncated encoder batch shows up here before it
# poisons retrieval. Norms are ROUNDED BEFORE the median (the
# rounded-before-compare rule); the MAD scheme mirrors
# text_robust_length_outliers. One norm projection (no explode — the
# dot product is a per-row array fold), two bounded per-label
# aggregates.
# ---------------------------------------------------------------------------

_NORM_MAD_K = "4.4478"  # 3 * 1.4826, the text_robust_length_outliers constant

_NORM_OUTLIERS_SQL = f"""
WITH norms AS (
    SELECT label, vec_id,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS nrm
    FROM embeddings
),
med AS (
    SELECT label, median(nrm) AS med_norm FROM norms GROUP BY label
),
mad AS (
    SELECT n.label, median(ABS(n.nrm - m.med_norm)) AS mad_norm
    FROM norms n JOIN med m USING (label) GROUP BY n.label
)
SELECT n.label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(m.med_norm, 6) AS med_norm,
       ROUND(d.mad_norm, 6) AS mad_norm,
       CAST(SUM(CASE WHEN ABS(n.nrm - m.med_norm) > {_NORM_MAD_K} * d.mad_norm
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN ABS(n.nrm - m.med_norm) > {_NORM_MAD_K} * d.mad_norm
                      THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
           AS outlier_rate
FROM norms n JOIN med m USING (label) JOIN mad d USING (label)
GROUP BY n.label, m.med_norm, d.mad_norm
ORDER BY n.label
"""


@register("embedding_norm_outliers", oracle=_NORM_OUTLIERS_SQL)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", _as_double("embedding").alias("emb")
    )
    norms = session_cache(
        emb.select(
            "label",
            "vec_id",
            F.round(F.sqrt(_dot(F.col("emb"), F.col("emb"))), 4).alias("nrm"),
        )
    )
    # Distributed exact per-label medians (round 9): grouped
    # percentile() buffers each label's whole norm column in one task
    # at the final merge. Norms are rounded to 4 dp (domain-bounded),
    # so the histogram form is exact and scale-safe — and lazy, so the
    # MAD's nested re-entry with |nrm − median| stays cheap.
    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_lowcard,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache as _cache

    med = grouped_quantiles_lowcard(norms, "label", F.col("nrm"), [0.5]).select(
        "label", F.col("q").alias("med_norm")
    )
    with_med = _cache(
        norms.join(broadcast(med), "label").withColumn(
            "absdev", F.abs(F.col("nrm") - F.col("med_norm"))
        )
    )
    mad = grouped_quantiles_lowcard(
        with_med, "label", F.col("absdev"), [0.5]
    ).select("label", F.col("q").alias("mad_norm"))
    flagged = with_med.join(broadcast(mad), "label")
    is_out = F.col("absdev") > F.lit(float(_NORM_MAD_K)) * F.col("mad_norm")
    return (
        flagged.groupBy("label", "med_norm", "mad_norm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .select(
            "label",
            "n_vectors",
            F.round("med_norm", 6).alias("med_norm"),
            F.round("mad_norm", 6).alias("mad_norm"),
            "n_outliers",
            "outlier_rate",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Triplet-margin audit (round 9) — the metric-learning data check run
# before training retrieval/contrastive models on labeled embeddings:
# for each anchor in the fixed eval set, the nearest SAME-label
# neighbor's cosine (hardest positive proxy) vs the nearest
# OTHER-label neighbor's (hardest negative); margin = pos − neg, and a
# violated margin (negative closer than any positive) flags label
# noise or collapsed clusters. One broadcast eval-set scan over the
# corpus (the ≤40-anchor convention every truth side here uses), two
# grouped maxima — linear at any corpus size. Cosines are rounded
# before comparing/differencing, so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

_TRIPLET_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
anchors AS (
    SELECT vec_id AS anchor_id, label AS a_label, emb AS aemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT a.anchor_id, a.a_label,
           v.label = a.a_label AS same_label,
           ROUND(list_dot_product(a.aemb, v.emb) /
                 (sqrt(list_dot_product(a.aemb, a.aemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine
    FROM anchors a CROSS JOIN vecs v
    WHERE a.anchor_id <> v.vec_id
)
SELECT anchor_id,
       CAST(a_label AS BIGINT) AS label,
       MAX(CASE WHEN same_label THEN cosine END) AS pos_cosine,
       MAX(CASE WHEN NOT same_label THEN cosine END) AS neg_cosine,
       ROUND(MAX(CASE WHEN same_label THEN cosine END)
             - MAX(CASE WHEN NOT same_label THEN cosine END), 4) AS margin,
       MAX(CASE WHEN same_label THEN cosine END)
         < MAX(CASE WHEN NOT same_label THEN cosine END) AS violated
FROM scored
GROUP BY anchor_id, a_label
ORDER BY anchor_id
"""


@register("similarity_triplet_margin_audit", oracle=_TRIPLET_SQL)
def similarity_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        )
    )
    anchors = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("emb").alias("aemb"),
    )
    scored = vecs.join(
        broadcast(anchors), F.col("anchor_id") != F.col("vec_id")
    ).select(
        "anchor_id",
        "a_label",
        (F.col("label") == F.col("a_label")).alias("same_label"),
        F.round(
            _dot(F.col("aemb"), F.col("emb")) / (_normprod("aemb", "emb")), 4
        ).alias("cosine"),
    )
    pos = F.max(F.when(F.col("same_label"), F.col("cosine")))
    neg = F.max(F.when(~F.col("same_label"), F.col("cosine")))
    return (
        scored.groupBy("anchor_id", "a_label")
        .agg(
            pos.alias("pos_cosine"),
            neg.alias("neg_cosine"),
            F.round(pos - neg, 4).alias("margin"),
            (pos < neg).alias("violated"),
        )
        .select(
            "anchor_id",
            F.col("a_label").cast("long").alias("label"),
            "pos_cosine",
            "neg_cosine",
            "margin",
            "violated",
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# Label-centroid SEPARATION matrix (round 9) — the between-class
# companion to the within-label drift audit above: pairwise L2 between
# label centroids. Well-separated centroids mean the labels carry
# geometric signal; a near-zero pair flags label redundancy before a
# classifier is trained on them. Same exact conventions as the drift
# audit (decimal per-dimension means ROUNDED before differencing,
# decimal-summed squared diffs, one sqrt) — the pair frame is labels²,
# a bounded enum square, never data-proportional.
# ---------------------------------------------------------------------------

_SEPARATION_SQL = f"""
WITH vecs AS (
    SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
comps AS (
    SELECT label, g.i AS dim, emb[g.i + 1] AS v
    FROM vecs, (SELECT UNNEST(range({_DRIFT_DIMS})) AS i) g
),
cents AS (
    SELECT label, dim,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*), 6)
               AS c
    FROM comps GROUP BY label, dim
),
sizes AS (
    SELECT label, CAST(COUNT(*) / {_DRIFT_DIMS} AS BIGINT) AS n_vectors
    FROM comps GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       sa.n_vectors AS n_a, sb.n_vectors AS n_b,
       ROUND(sqrt(CAST(SUM(CAST((a.c - b.c) * (a.c - b.c)
                                AS DECIMAL(25,12))) AS DOUBLE)), 6)
           AS centroid_l2
FROM cents a
JOIN cents b ON a.dim = b.dim AND a.label < b.label
JOIN sizes sa ON sa.label = a.label
JOIN sizes sb ON sb.label = b.label
GROUP BY a.label, b.label, sa.n_vectors, sb.n_vectors
ORDER BY label_a, label_b
"""


@register("similarity_centroid_separation", oracle=_SEPARATION_SQL)
def similarity_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _as_double("embedding").alias("emb")
    )
    comps = emb.select(
        "label", F.posexplode("emb").alias("dim", "v")
    )
    cents = session_cache(
        comps.groupBy("label", "dim").agg(
            F.round(
                F.sum(F.col("v").cast("decimal(25,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )
    sizes = cents.groupBy("label").agg(
        F.max("n_vectors").cast("long").alias("n_vectors")
    )
    a = cents.alias("a")
    b = cents.alias("b")
    diff = F.col("a.c") - F.col("b.c")
    pairs = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.round(
                F.sqrt(
                    F.sum((diff * diff).cast("decimal(25,12)")).cast("double")
                ),
                6,
            ).alias("centroid_l2")
        )
    )
    sa = sizes.select(F.col("label").alias("label_a"), F.col("n_vectors").alias("n_a"))
    sb = sizes.select(F.col("label").alias("label_b"), F.col("n_vectors").alias("n_b"))
    return (
        pairs.join(broadcast(sa), "label_a")
        .join(broadcast(sb), "label_b")
        .select(
            F.col("label_a").cast("long").alias("label_a"),
            F.col("label_b").cast("long").alias("label_b"),
            "n_a",
            "n_b",
            "centroid_l2",
        )
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# Per-dimension robust stats (round-9 continuation) — the embedding
# health check run before whitening/robust-scaling a corpus: per
# dimension, the median and interquartile range of the raw (continuous,
# unbounded-domain) component values. Dead dimensions (IQR ~ 0) and
# scale-divergent dimensions surface immediately. This is the first
# consumer of operators/ordering.grouped_quantiles_general — exact
# per-group selection with TWO bounded plan-time actions total for all
# 64 groups, where exact_grouped_quantiles would pay one boundary
# action per group and grouped_quantiles_lowcard cannot take a
# continuous domain. Reference parity: the reference's notebooks would
# run df.describe()-style column stats on a single node; this is the
# multi-executor exact-quantile equivalent.
# ---------------------------------------------------------------------------

_DIM_ROBUST_SQL = f"""
WITH vals AS (
    SELECT g.i AS dim, CAST(e.embedding[g.i + 1] AS DOUBLE) AS v
    FROM embeddings e, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
    WHERE e.embedding IS NOT NULL
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(v) AS BIGINT) AS n_vals,
       ROUND(quantile_cont(v, 0.25), 6) AS q25,
       ROUND(quantile_cont(v, 0.50), 6) AS median,
       ROUND(quantile_cont(v, 0.75), 6) AS q75,
       ROUND(quantile_cont(v, 0.75) - quantile_cont(v, 0.25), 6) AS iqr
FROM vals
GROUP BY dim
ORDER BY dim
"""


@register("embedding_dimension_robust_stats", oracle=_DIM_ROBUST_SQL)
def embedding_dimension_robust_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    vals = session_cache(
        emb.select(F.posexplode(_as_double("embedding")).alias("dim", "v"))
    )
    qs = grouped_quantiles_general(
        vals, "dim", F.col("v"), [0.25, 0.50, 0.75], buckets=32
    )
    piv = qs.groupBy("dim").agg(
        *[
            F.max(F.when(F.col("frac") == f, F.col("q"))).alias(a)
            for f, a in [(0.25, "_q25"), (0.50, "_med"), (0.75, "_q75")]
        ]
    )
    n = vals.groupBy("dim").agg(F.count("v").cast("long").alias("n_vals"))
    return (
        n.join(piv, "dim")
        .select(
            F.col("dim").cast("long"),
            "n_vals",
            F.round("_q25", 6).alias("q25"),
            F.round("_med", 6).alias("median"),
            F.round("_q75", 6).alias("q75"),
            F.round(F.col("_q75") - F.col("_q25"), 6).alias("iqr"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Silhouette audit (round-9 continuation) — the standard cluster-
# quality score, computed against label centroids (the "simplified
# silhouette"): a = distance to own centroid, b = distance to the
# nearest OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]. Mean s per
# label grades label coherence; s < 0 marks vectors closer to a
# foreign centroid (mislabeled or boundary data) — the audit run
# before trusting labels for supervised filtering. Determinism: same
# recipe as the k-means/centroid entries — centroid components and
# per-(vector, centroid) squared sums accumulate in DECIMAL(25,12)
# (associative, partition-order-free), centroids round to 6 dp, and
# the only double ops after that (sqrt, subtract, divide, min/max)
# are IEEE-exact single operations in both engines. 100 TB shape:
# one posexplode + a broadcast of the L×64 centroid frame; cost is
# linear in vectors with a constant L×dim multiplier — no pairwise
# anything.
# ---------------------------------------------------------------------------

_SILHOUETTE_SQL = f"""
WITH comps AS (
    SELECT e.vec_id, e.label, g.i AS pos,
           CAST(e.embedding[g.i + 1] AS DOUBLE) AS x
    FROM embeddings e, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
cent AS (
    SELECT label AS clabel, pos,
           ROUND(CAST(SUM(CAST(x AS DECIMAL(25,12))) AS DOUBLE)
                 / COUNT(*), 6) AS m
    FROM comps GROUP BY 1, 2
),
ssd AS (
    SELECT c.vec_id, c.label, ct.clabel,
           CAST(SUM(CAST((c.x - ct.m) * (c.x - ct.m) AS DECIMAL(25,12)))
                AS DOUBLE) AS v
    FROM comps c JOIN cent ct USING (pos)
    GROUP BY 1, 2, 3
),
per_vec AS (
    SELECT vec_id, label,
           MAX(CASE WHEN clabel = label THEN sqrt(v) END) AS a,
           MIN(CASE WHEN clabel <> label THEN sqrt(v) END) AS b
    FROM ssd GROUP BY 1, 2
),
sil AS (
    SELECT label,
           CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                ELSE (b - a) / GREATEST(a, b) END AS s
    FROM per_vec
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       {sql_davg("s", "mean_silhouette")},
       CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced
FROM sil
GROUP BY label
ORDER BY label
"""


@register("embedding_silhouette_by_label", oracle=_SILHOUETTE_SQL)
def embedding_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import davg, session_cache

    comps = session_cache(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "label",
            F.posexplode(_as_double("embedding")).alias("pos", "x"),
        )
    )
    cent = comps.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("m")
    )
    diff = F.col("x") - F.col("m")
    ssd = (
        comps.join(broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((diff * diff).cast("decimal(25,12)")).cast("double").alias("v"))
    )
    per_vec = ssd.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.sqrt("v"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.sqrt("v"))).alias("b"),
    )
    s = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        per_vec.select("label", s.alias("s"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            davg("s", "mean_silhouette"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_misplaced"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Top principal component by power iteration (round-9 continuation) —
# the dominant variance direction of the (mean-centered) embedding
# corpus via two fixed power-iteration rounds: s = Yv (per-vector
# projection), w = Yᵀs (per-dimension reconstruction), v' = w/‖w‖.
# The classic embedding-health check: a top PC that eats most of the
# norm means a rogue feature (uncentered corpus, dominant dimension) —
# the "anisotropy" audit run before cosine retrieval is trusted.
# Engine-exactness follows the kmeans_two_rounds recipe: every
# data-proportional sum accumulates in DECIMAL(25,12) (associative ⇒
# partition-order-free) and crosses to DOUBLE through the VARCHAR
# round-trip (correctly-rounded parse on both engines — the direct
# decimal→double cast stops being correctly rounded past 2^53
# unscaled), v is re-rounded to 6 dp at each round boundary, and v0 is
# the exactly-representable 0.125·1 (= 1/√64). λ is estimated by ‖w₂‖
# (v₁ is unit). 100 TB shape: two vec_id-shuffle joins + bounded
# 64-row broadcast frames per round; no pairwise anything.
# ---------------------------------------------------------------------------

def _sql_dec_sum(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(25,12))) AS VARCHAR) AS DOUBLE)"
    )


_TOP_PC_SQL = f"""
WITH comps AS (
    SELECT e.vec_id, g.i AS pos, CAST(e.embedding[g.i + 1] AS DOUBLE) AS x
    FROM embeddings e, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
means AS (
    SELECT pos, ROUND({_sql_dec_sum("x")} / COUNT(*), 6) AS m
    FROM comps GROUP BY pos
),
cent AS (
    SELECT c.vec_id, c.pos, c.x - m.m AS y
    FROM comps c JOIN means m USING (pos)
),
s1 AS (
    SELECT vec_id, {_sql_dec_sum("y * 0.125")} AS s FROM cent GROUP BY vec_id
),
w1 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * s1.s")} AS w
    FROM cent c JOIN s1 USING (vec_id) GROUP BY c.pos
),
n1 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM w1),
v1 AS (SELECT pos, ROUND(w / nrm, 6) AS vd FROM w1, n1),
s2 AS (
    SELECT c.vec_id, {_sql_dec_sum("c.y * v1.vd")} AS s
    FROM cent c JOIN v1 USING (pos) GROUP BY c.vec_id
),
w2 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * s2.s")} AS w
    FROM cent c JOIN s2 USING (vec_id) GROUP BY c.pos
),
n2 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM w2)
SELECT CAST(w2.pos AS BIGINT) AS pos,
       ROUND(w2.w / n2.nrm, 6) AS loading,
       ROUND(n2.nrm, 6) AS lambda_proxy
FROM w2, n2
ORDER BY pos
"""


def _dec_sum(col):
    return (
        F.sum(col.cast("decimal(25,12)")).cast("string").cast("double")
    )


@register("embedding_top_pc_power_iteration", oracle=_TOP_PC_SQL)
def embedding_top_pc_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    # Columnar power iteration — same round-13 restructuring as
    # embedding_second_pc_deflation (see its note): s = y·v is a
    # row-local decimal dot against the collected (DIM-value, bounded)
    # iterate, removing the data-proportional shuffle-by-vec_id; the
    # only exchange per round carries the ≤ DIM×tasks partial sums of
    # the w aggregation. Exactness: identical per-term doubles cast to
    # DECIMAL(25,12), exact associative decimal addition, norms and
    # rounds engine-side.
    dim = _EMB_DIM
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    mean_rows = (
        emb.select(F.posexplode("e").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(_dec_sum(F.col("x")) / F.count(F.lit(1)), 6).alias("m"))
        .collect()
    )
    means = [0.0] * dim
    for r in mean_rows:
        means[r["pos"]] = float(r["m"])
    cent = session_cache(
        emb.select(
            "vec_id",
            F.array(
                *[(F.col("e")[i] - F.lit(means[i])) for i in range(dim)]
            ).alias("y"),
        )
    )
    dec = "decimal(25,12)"

    def row_dot(arr, vs):
        # Accumulator pinned at DECIMAL(35,12) with a value-lossless
        # per-step recast — see embedding_second_pc_deflation.
        varr = F.array(*[F.lit(float(v)) for v in vs])
        return (
            F.aggregate(
                F.zip_with(arr, varr, lambda a, b: (a * b).cast(dec)),
                F.lit(0).cast("decimal(35,12)"),
                lambda acc, t: (acc + t).cast("decimal(35,12)"),
            )
            .cast("string")
            .cast("double")
        )

    def power_w(vs):
        s = row_dot(F.col("y"), vs)
        return (
            cent.select(s.alias("s"), F.posexplode("y").alias("pos", "yv"))
            .groupBy("pos")
            .agg(_dec_sum(F.col("yv") * F.col("s")).alias("w"))
        )

    w1 = power_w([0.125] * dim)
    n1 = w1.agg(F.sqrt(_dec_sum(F.col("w") * F.col("w"))).alias("nrm"))
    v1_rows = (
        w1.crossJoin(broadcast(n1))
        .select("pos", F.round(F.col("w") / F.col("nrm"), 6).alias("vd"))
        .collect()
    )
    v1 = [0.0] * dim
    for r in v1_rows:
        v1[r["pos"]] = float(r["vd"])
    w2 = power_w(v1)
    n2 = w2.agg(F.sqrt(_dec_sum(F.col("w") * F.col("w"))).alias("nrm"))
    return (
        w2.crossJoin(broadcast(n2))
        .select(
            F.col("pos").cast("long"),
            F.round(F.col("w") / F.col("nrm"), 6).alias("loading"),
            F.round("nrm", 6).alias("lambda_proxy"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# kNN label agreement (round-9 continuation) — the leave-one-out
# k-nearest-neighbor classifier run as a LABEL-QUALITY audit: for each
# eval anchor (the ≤40-anchor convention), take its 5 nearest
# neighbors by cosine (excluding itself), majority-vote their labels,
# and check the vote against the anchor's own label. Low agreement
# for a label means its region is contaminated — the cheap smell test
# before training on the labels. Determinism: ROUND(cosine, 4) with
# vec_id tie-break orders neighbors identically in both engines;
# majority ties break on label ASC. Linear: one broadcast anchor scan,
# per-anchor windows over ≤ corpus rows — WindowGroupLimit truncates
# to k=5 map-side.
# ---------------------------------------------------------------------------

_KNN_AGREE_K = 5

_KNN_AGREE_SQL = f"""
WITH vecs AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
anchors AS (
    SELECT vec_id AS anchor_id, label AS a_label, emb AS aemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT a.anchor_id, a.a_label, v.vec_id, v.label,
           ROUND(list_dot_product(a.aemb, v.emb) /
                 (sqrt(list_dot_product(a.aemb, a.aemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine
    FROM anchors a CROSS JOIN vecs v
    WHERE a.anchor_id <> v.vec_id
),
topk AS (
    SELECT * FROM (
        SELECT anchor_id, a_label, label,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rn
        FROM scored
    ) z WHERE rn <= {_KNN_AGREE_K}
),
votes AS (
    SELECT anchor_id, a_label, label, COUNT(*) AS c
    FROM topk GROUP BY 1, 2, 3
),
winner AS (
    SELECT anchor_id, a_label, label AS pred FROM (
        SELECT anchor_id, a_label, label, c,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY c DESC, label ASC) AS wr
        FROM votes
    ) z WHERE wr = 1
)
SELECT CAST(a_label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(SUM(CASE WHEN pred = a_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree,
       ROUND(SUM(CASE WHEN pred = a_label THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS agreement_rate
FROM winner
GROUP BY a_label
ORDER BY label
"""


@register("embedding_knn_label_agreement", oracle=_KNN_AGREE_SQL)
def embedding_knn_label_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", _as_double("embedding").alias("emb")
        )
    )
    anchors = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("emb").alias("aemb"),
    )
    scored = vecs.join(
        broadcast(anchors), F.col("anchor_id") != F.col("vec_id")
    ).select(
        "anchor_id",
        "a_label",
        "vec_id",
        "label",
        F.round(
            _dot(F.col("aemb"), F.col("emb")) / (_normprod("aemb", "emb")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_AGREE_K)
    )
    votes = topk.groupBy("anchor_id", "a_label", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    ww = Window.partitionBy("anchor_id").orderBy(F.desc("c"), F.asc("label"))
    winner = (
        votes.withColumn("wr", F.row_number().over(ww))
        .filter(F.col("wr") == 1)
        .select("anchor_id", "a_label", F.col("label").alias("pred"))
    )
    agree = F.sum(F.when(F.col("pred") == F.col("a_label"), 1).otherwise(0))
    return (
        winner.groupBy(F.col("a_label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            agree.cast("long").alias("n_agree"),
            F.round(agree * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "agreement_rate"
            ),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# IVF nprobe recall curve (round-9 continuation) — the tuning table an
# ANN deployment reads before picking its probe budget: recall@k vs
# the brute-force truth at nprobe ∈ {1, 2, 4}, in one pass. The
# centroid ranking is computed ONCE and filtered three ways (rn <= np
# against a 3-row literal probe frame), so the curve costs barely more
# than the single-nprobe query. Recall is an integer hit count over k
# — exact; the mean over queries goes through davg.
# ---------------------------------------------------------------------------

_CURVE_NPROBES = [1, 2, 4]

_NPROBE_CURVE_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
centroids AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs
    WHERE vec_id % {_CENTROID_MOD} = {_CENTROID_REM}
      AND vec_id < {_CENTROID_CAP}
),
ranked_assign AS (
    SELECT v.vec_id, v.emb, c.cid,
           ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_IVF_COS.format(a='v.emb', b='c.cemb')} DESC,
                        c.cid ASC
           ) AS rn
    FROM vecs v CROSS JOIN centroids c
),
assigned AS (
    SELECT vec_id, emb, cid FROM ranked_assign WHERE rn = 1
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
truth AS (
    SELECT query_id, vec_id FROM (
        SELECT q.query_id, v.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_dot_product(q.qemb, v.emb) /
                        (sqrt(list_dot_product(q.qemb, q.qemb))
                         * sqrt(list_dot_product(v.emb, v.emb))), 4) DESC,
                        v.vec_id ASC
               ) AS rank
        FROM queries q CROSS JOIN vecs v WHERE q.query_id <> v.vec_id
    ) z WHERE rank <= {_IVF_TOP_K}
),
np AS (SELECT UNNEST({_CURVE_NPROBES}) AS nprobe),
probes AS (
    SELECT np.nprobe, r.vec_id AS query_id, r.emb AS qemb, r.cid AS probe_cid
    FROM ranked_assign r, np
    WHERE r.rn <= np.nprobe AND r.vec_id % {_QUERY_MOD} = 0
      AND r.vec_id < {_QUERY_CAP}
),
scored AS (
    SELECT q.nprobe, q.query_id, v.vec_id,
           ROUND(list_dot_product(q.qemb, v.emb) /
                 (sqrt(list_dot_product(q.qemb, q.qemb))
                  * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine
    FROM probes q JOIN assigned v
      ON q.probe_cid = v.cid AND q.query_id <> v.vec_id
),
approx AS (
    SELECT nprobe, query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY nprobe, query_id ORDER BY cosine DESC, vec_id ASC
        ) AS rank FROM scored
    ) z WHERE rank <= {_IVF_TOP_K}
),
per_query AS (
    SELECT n.nprobe, t.query_id,
           COUNT(a.vec_id) * 1.0 / {_IVF_TOP_K} AS recall
    FROM truth t CROSS JOIN np n
    LEFT JOIN approx a
      ON a.nprobe = n.nprobe AND a.query_id = t.query_id
     AND a.vec_id = t.vec_id
    GROUP BY n.nprobe, t.query_id
)
SELECT CAST(nprobe AS BIGINT) AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       {{davg_recall}}
FROM per_query
GROUP BY nprobe
ORDER BY nprobe
""".format(davg_recall=sql_davg("recall", "mean_recall_at_k"))


@register("similarity_ivf_nprobe_recall_curve", oracle=_NPROBE_CURVE_SQL)
def similarity_ivf_nprobe_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import davg, session_cache

    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    centroids = vecs.filter(
        (F.col("vec_id") % _CENTROID_MOD == _CENTROID_REM)
        & (F.col("vec_id") < _CENTROID_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    sim = F.round(
        _dot(F.col("emb"), F.col("cemb")) / _normprod("emb", "cemb"), 6
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.asc("cid")
    )
    ranked_assign = session_cache(
        vecs.crossJoin(broadcast(centroids))
        .select("vec_id", "cid", sim.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assigned = (
        ranked_assign.filter(F.col("rn") == 1)
        .select("vec_id", "cid")
        .join(vecs, "vec_id")
    )
    queries = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    cos_q = F.round(
        _dot(F.col("qemb"), F.col("emb")) / _normprod("qemb", "emb"), 4
    )
    w_truth = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    truth = session_cache(
        vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos_q.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_truth))
        .filter(F.col("rank") <= _IVF_TOP_K)
        .select("query_id", "vec_id")
    )
    np_df = spark.createDataFrame(
        [(n,) for n in _CURVE_NPROBES], "nprobe int"
    )
    probes = (
        ranked_assign.filter(
            (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
        )
        .join(broadcast(np_df), F.col("rn") <= F.col("nprobe"))
        .select(
            "nprobe",
            F.col("vec_id").alias("query_id"),
            F.col("cid").alias("probe_cid"),
        )
        .join(queries, "query_id")
    )
    scored = assigned.join(
        broadcast(probes),
        (F.col("probe_cid") == F.col("cid"))
        & (F.col("query_id") != F.col("vec_id")),
    ).select("nprobe", "query_id", "vec_id", cos_q.alias("cosine"))
    w_rank = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    approx = (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _IVF_TOP_K)
        .select(
            F.col("nprobe").alias("a_nprobe"),
            F.col("query_id").alias("a_query_id"),
            F.col("vec_id").alias("a_vec_id"),
        )
    )
    per_query = (
        truth.crossJoin(broadcast(np_df))
        .join(
            approx,
            (F.col("nprobe") == F.col("a_nprobe"))
            & (F.col("query_id") == F.col("a_query_id"))
            & (F.col("vec_id") == F.col("a_vec_id")),
            "left",
        )
        .groupBy("nprobe", "query_id")
        .agg(
            (F.count("a_vec_id") * F.lit(1.0) / F.lit(float(_IVF_TOP_K))).alias(
                "recall"
            )
        )
    )
    return (
        per_query.groupBy(F.col("nprobe").cast("long").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            davg("recall", "mean_recall_at_k"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# Intra-list diversity at k (round-9 continuation) — the audit MMR
# exists to improve: for each eval query, the mean pairwise
# dissimilarity (1 − cosine) among its brute-force top-5 results. A
# near-zero diversity list is five copies of one document — retrieval
# that "works" but tells the user nothing new. Pairwise work is k·(k−1)/2
# = 10 pairs per query over the FIXED eval set — bounded by
# construction. Cosines round to 4 before differencing (the family
# convention), pair means go through davg.
# ---------------------------------------------------------------------------

_DIVERSITY_K = 5

_DIVERSITY_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
    SELECT vec_id AS query_id, emb AS qemb FROM vecs
    WHERE vec_id % {_QUERY_MOD} = 0 AND vec_id < {_QUERY_CAP}
),
topk AS (
    SELECT query_id, vec_id, emb FROM (
        SELECT q.query_id, v.vec_id, v.emb,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_dot_product(q.qemb, v.emb) /
                        (sqrt(list_dot_product(q.qemb, q.qemb))
                         * sqrt(list_dot_product(v.emb, v.emb))), 4) DESC,
                        v.vec_id ASC
               ) AS rank
        FROM queries q CROSS JOIN vecs v WHERE q.query_id <> v.vec_id
    ) z WHERE rank <= {_DIVERSITY_K}
),
pairs AS (
    SELECT a.query_id,
           1.0 - ROUND(list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))), 4) AS dissim
    FROM topk a JOIN topk b
      ON a.query_id = b.query_id AND a.vec_id < b.vec_id
),
perq AS (
    SELECT query_id, COUNT(*) AS n_pairs, {sql_davg("dissim", "diversity")}
    FROM pairs GROUP BY query_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       {sql_davg("diversity", "mean_diversity")},
       ROUND(MIN(diversity), 6) AS min_diversity
FROM perq
"""


@register("similarity_result_diversity_at_k", oracle=_DIVERSITY_SQL)
def similarity_result_diversity_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import davg, session_cache

    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("emb")
        )
    )
    queries = vecs.filter(
        (F.col("vec_id") % _QUERY_MOD == 0) & (F.col("vec_id") < _QUERY_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    cos_q = F.round(
        _dot(F.col("qemb"), F.col("emb")) / _normprod("qemb", "emb"), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    topk = session_cache(
        vecs.join(broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "emb", cos_q.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _DIVERSITY_K)
        .select("query_id", "vec_id", "emb")
    )
    b = topk.select(
        F.col("query_id").alias("b_query_id"),
        F.col("vec_id").alias("b_vec_id"),
        F.col("emb").alias("b_emb"),
    )
    dissim = F.lit(1.0) - F.round(
        _dot(F.col("emb"), F.col("b_emb")) / _normprod("emb", "b_emb"), 4
    )
    pairs = topk.join(
        b,
        (F.col("query_id") == F.col("b_query_id"))
        & (F.col("vec_id") < F.col("b_vec_id")),
    ).select("query_id", dissim.alias("dissim"))
    perq = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pairs"), davg("dissim", "diversity")
    )
    return perq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
        davg("diversity", "mean_diversity"),
        F.round(F.min("diversity"), 6).alias("min_diversity"),
    )


# ---------------------------------------------------------------------------
# Second principal component by deflation (round 10) — the natural
# continuation of the top-PC power iteration: subtract the rank-one
# projection onto the (rounded, hence engine-deterministic) first
# component and run the same two power rounds on the residual. Reports
# the second loadings, its Rayleigh-norm proxy, and the v1.v2
# orthogonality dot as an in-query invariant check (should be ~0; it
# is NOT exactly 0 because v1 is the 2-round approximation, which is
# the point of reporting it). All sums go through the DECIMAL(25,12)
# crossing; every division/sqrt is the same IEEE op on both engines.
# Scale: each round is one join + two hash aggregates over the
# centered component frame — the same shapes as the top-PC query.
# ---------------------------------------------------------------------------

_SECOND_PC_SQL = f"""
WITH comps AS (
    SELECT e.vec_id, g.i AS pos, CAST(e.embedding[g.i + 1] AS DOUBLE) AS x
    FROM embeddings e, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
means AS (
    SELECT pos, ROUND({_sql_dec_sum("x")} / COUNT(*), 6) AS m
    FROM comps GROUP BY pos
),
cent AS (
    SELECT c.vec_id, c.pos, c.x - m.m AS y
    FROM comps c JOIN means m USING (pos)
),
s1 AS (
    SELECT vec_id, {_sql_dec_sum("y * 0.125")} AS s FROM cent GROUP BY vec_id
),
w1 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * s1.s")} AS w
    FROM cent c JOIN s1 USING (vec_id) GROUP BY c.pos
),
n1 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM w1),
v1a AS (SELECT pos, ROUND(w / nrm, 6) AS vd FROM w1, n1),
s2 AS (
    SELECT c.vec_id, {_sql_dec_sum("c.y * v1a.vd")} AS s
    FROM cent c JOIN v1a USING (pos) GROUP BY c.vec_id
),
w2 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * s2.s")} AS w
    FROM cent c JOIN s2 USING (vec_id) GROUP BY c.pos
),
n2 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM w2),
v1 AS (SELECT pos, ROUND(w / nrm, 6) AS vd FROM w2, n2),
proj AS (
    SELECT c.vec_id, {_sql_dec_sum("c.y * v1.vd")} AS p
    FROM cent c JOIN v1 USING (pos) GROUP BY c.vec_id
),
cent2 AS (
    SELECT c.vec_id, c.pos, c.y - proj.p * v1.vd AS y
    FROM cent c JOIN proj USING (vec_id) JOIN v1 USING (pos)
),
t1 AS (
    SELECT vec_id, {_sql_dec_sum("y * 0.125")} AS s FROM cent2 GROUP BY vec_id
),
u1 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * t1.s")} AS w
    FROM cent2 c JOIN t1 USING (vec_id) GROUP BY c.pos
),
m1 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM u1),
q1 AS (SELECT pos, ROUND(w / nrm, 6) AS vd FROM u1, m1),
t2 AS (
    SELECT c.vec_id, {_sql_dec_sum("c.y * q1.vd")} AS s
    FROM cent2 c JOIN q1 USING (pos) GROUP BY c.vec_id
),
u2 AS (
    SELECT c.pos, {_sql_dec_sum("c.y * t2.s")} AS w
    FROM cent2 c JOIN t2 USING (vec_id) GROUP BY c.pos
),
m2 AS (SELECT sqrt({_sql_dec_sum("w * w")}) AS nrm FROM u2),
v2 AS (SELECT pos, ROUND(w / nrm, 6) AS vd FROM u2, m2),
ortho AS (
    SELECT {_sql_dec_sum("v1.vd * v2.vd")} AS od
    FROM v1 JOIN v2 USING (pos)
)
SELECT CAST(u2.pos AS BIGINT) AS pos,
       ROUND(u2.w / m2.nrm, 6) AS loading2,
       ROUND(m2.nrm, 6) AS lambda2_proxy,
       ROUND(ortho.od, 6) AS ortho_dot
FROM u2, m2, ortho
ORDER BY pos
"""


@register("embedding_second_pc_deflation", oracle=_SECOND_PC_SQL)
def embedding_second_pc_deflation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    # Columnar power iteration (round-13 optimization, guide §2.3/§2.4):
    # the old form posexploded the corpus to (vec_id, pos, y) and ran
    # every power round as join-by-pos → SHUFFLE-BY-VEC_ID (the
    # data-proportional exchange) → join-by-vec_id → shuffle-by-pos
    # (~25 corpus jobs end to end; 28 s at sf0.01 on a vanilla sweep
    # session). Kept as arrays, the projection s = y·v is a ROW-LOCAL
    # decimal dot against the (bounded, DIM-value) iterate vector —
    # collected to literals each round, the established v1-localization
    # convention — so the only exchange left per round carries the
    # ≤ DIM×tasks partial sums of the w aggregation. The vec_id-keyed
    # shuffle of the whole corpus is gone at every scale. Exactness:
    # identical per-term doubles cast to DECIMAL(25,12); decimal
    # addition is exact and associative, so the regrouping cannot
    # change any sum; norms and rounds still run engine-side.
    dim = _EMB_DIM
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("e")
    )
    mean_rows = (
        emb.select(F.posexplode("e").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(_dec_sum(F.col("x")) / F.count(F.lit(1)), 6).alias("m"))
        .collect()
    )
    means = [0.0] * dim
    for r in mean_rows:
        means[r["pos"]] = float(r["m"])
    cent = session_cache(
        emb.select(
            "vec_id",
            F.array(
                *[(F.col("e")[i] - F.lit(means[i])) for i in range(dim)]
            ).alias("y"),
        )
    )
    dec = "decimal(25,12)"

    def row_dot(arr, vs):
        """Row-local decimal dot of an array column against a literal
        vector — the map-only replacement for join-by-pos + dec-sum
        grouped by vec_id. Accumulator pinned at DECIMAL(35,12) with a
        per-step recast: Spark widens a+b per addition and at the
        38-precision cap starts shedding scale (38,12 + 25,12 ->
        38,11), which would ROUND mid-sum; the recast is
        value-lossless (partial sums of 64 bounded terms stay far
        below 10^23) and keeps every addition exact at scale 12 — the
        same exactness SUM(decimal(25,12))'s internal buffer provides.
        """
        varr = F.array(*[F.lit(float(v)) for v in vs])
        return (
            F.aggregate(
                F.zip_with(arr, varr, lambda a, b: (a * b).cast(dec)),
                F.lit(0).cast("decimal(35,12)"),
                lambda acc, t: (acc + t).cast("decimal(35,12)"),
            )
            .cast("string")
            .cast("double")
        )

    def power_round(frame, vs):
        """One corpus pass: s map-only, then w_pos = dec-sum of y_pos*s
        (the exchange carries only per-task partial sums, ≤ DIM rows
        each); nrm + round(w/nrm, 6) on the DIM-row frame, collected
        to literals for the next round. Returns (w, nrm, vd) lists."""
        s = row_dot(F.col("y"), vs)
        w = (
            frame.select(s.alias("s"), F.posexplode("y").alias("pos", "yv"))
            .groupBy("pos")
            .agg(_dec_sum(F.col("yv") * F.col("s")).alias("w"))
        )
        n = w.agg(F.sqrt(_dec_sum(F.col("w") * F.col("w"))).alias("nrm"))
        rows = (
            w.crossJoin(broadcast(n))
            .select(
                "pos", "w", "nrm", F.round(F.col("w") / F.col("nrm"), 6).alias("vd")
            )
            .collect()
        )
        ws, vd = [0.0] * dim, [0.0] * dim
        nrm = rows[0]["nrm"] if rows else None
        for r in rows:
            ws[r["pos"]] = float(r["w"])
            vd[r["pos"]] = float(r["vd"])
        return ws, nrm, vd

    v0 = [0.125] * dim
    _, _, v1a = power_round(cent, v0)
    _, _, v1 = power_round(cent, v1a)
    p = row_dot(F.col("y"), v1)
    v1arr = F.array(*[F.lit(float(v)) for v in v1])
    cent2 = session_cache(
        cent.select("vec_id", p.alias("p"), "y").select(
            "vec_id",
            F.zip_with(
                F.col("y"), v1arr, lambda yi, vi: yi - F.col("p") * vi
            ).alias("y"),
        )
    )
    _, _, q1 = power_round(cent2, v0)
    u2, m2_nrm, v2 = power_round(cent2, q1)
    # v1·v2 orthogonality dot — engine-side decimal fold over the two
    # DIM-value literal vectors (the oracle's ortho CTE).
    od_row = spark.range(1).select(
        F.aggregate(
            F.zip_with(
                F.array(*[F.lit(float(v)) for v in v1]),
                F.array(*[F.lit(float(v)) for v in v2]),
                lambda a, b: (a * b).cast(dec),
            ),
            F.lit(0).cast("decimal(35,12)"),
            lambda acc, t: (acc + t).cast("decimal(35,12)"),
        )
        .cast("string")
        .cast("double")
        .alias("od")
    ).first()
    od = float(od_row["od"])
    out = spark.createDataFrame(
        [(i, float(u2[i]), float(m2_nrm), od) for i in range(dim)],
        "pos bigint, w double, nrm double, od double",
    )
    return out.select(
        F.col("pos").cast("long"),
        F.round(F.col("w") / F.col("nrm"), 6).alias("loading2"),
        F.round("nrm", 6).alias("lambda2_proxy"),
        F.round("od", 6).alias("ortho_dot"),
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# Centroid shift drift by label (round 11) — embedding-space drift
# detection, the vector analog of the value-drift family: split each
# label's vectors into two deterministic halves (vec_id parity — a
# hash-free A/B of the corpus) and compare the half-centroids. Because
# centroid cosine is scale-invariant, the per-dimension DECIMAL(25,12)
# SUM vectors stand in for the means exactly (counts cancel); the
# shift norm re-introduces the counts in plain double arithmetic over
# the same three exact dots. The dots run over 64-element arrays built
# in dimension order, folded sequentially on both engines (the
# established list_dot_product <-> F.aggregate parity, ROUND 4).
# 100 TB: per-(label, half, dim) sums are one hash aggregate over the
# exploded frame; the label-level result is enum-bounded.
# ---------------------------------------------------------------------------

_CSHIFT_DIM = 64

_CSHIFT_SQL = f"""
WITH vecs AS (
    SELECT label, vec_id % 2 AS half,
           CAST(embedding AS DOUBLE[]) AS emb
    FROM embeddings
),
sums AS (
    SELECT label, half, g.i,
           CAST(CAST(SUM(CAST(emb[g.i + 1] AS DECIMAL(25,12))) AS VARCHAR)
                AS DOUBLE) AS s
    FROM vecs, (SELECT UNNEST(range({_CSHIFT_DIM})) AS i) g
    GROUP BY 1, 2, 3
),
sv AS (
    SELECT label, half, list(s ORDER BY i) AS v FROM sums GROUP BY 1, 2
),
cnt AS (SELECT label, half, COUNT(*) AS n FROM vecs GROUP BY 1, 2),
j AS (
    SELECT a.label,
           ca.n AS n_even, cb.n AS n_odd,
           list_dot_product(a.v, b.v) AS dab,
           list_dot_product(a.v, a.v) AS daa,
           list_dot_product(b.v, b.v) AS dbb
    FROM sv a
    JOIN sv b ON a.label = b.label AND a.half = 0 AND b.half = 1
    JOIN cnt ca ON ca.label = a.label AND ca.half = 0
    JOIN cnt cb ON cb.label = a.label AND cb.half = 1
)
SELECT label,
       CAST(n_even AS BIGINT) AS n_even,
       CAST(n_odd AS BIGINT) AS n_odd,
       CASE WHEN daa = 0 OR dbb = 0 THEN NULL
            ELSE ROUND(dab / (sqrt(daa) * sqrt(dbb)), 4) END
           AS centroid_cosine,
       ROUND(SQRT(GREATEST(
           daa / (CAST(n_even AS DOUBLE) * n_even)
           - 2.0 * dab / (CAST(n_even AS DOUBLE) * n_odd)
           + dbb / (CAST(n_odd AS DOUBLE) * n_odd), 0.0)), 6)
           AS shift_norm
FROM j ORDER BY label
"""


@register("similarity_centroid_shift_drift", oracle=_CSHIFT_SQL)
def similarity_centroid_shift_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            _as_double("embedding").alias("emb"),
        )
    )
    sums = (
        vecs.select(
            "label", "half", F.posexplode("emb").alias("i", "x")
        )
        .groupBy("label", "half", "i")
        .agg(
            F.sum(F.col("x").cast("decimal(25,12)"))
            .cast("string")
            .cast("double")
            .alias("s")
        )
    )
    sv = sums.groupBy("label", "half").agg(
        F.array_sort(F.collect_list(F.struct("i", "s"))).alias("iv")
    ).select(
        "label",
        "half",
        F.expr("transform(iv, p -> p.s)").alias("v"),
    )
    cnt = vecs.groupBy("label", "half").agg(F.count(F.lit(1)).alias("n"))
    a = sv.filter(F.col("half") == 0).select(
        "label", F.col("v").alias("va")
    )
    b = sv.filter(F.col("half") == 1).select(
        "label", F.col("v").alias("vb")
    )
    ca = cnt.filter(F.col("half") == 0).select(
        "label", F.col("n").alias("n_even")
    )
    cb = cnt.filter(F.col("half") == 1).select(
        "label", F.col("n").alias("n_odd")
    )
    j = (
        a.join(b, "label")
        .join(ca, "label")
        .join(cb, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            _dot(F.col("va"), F.col("vb")).alias("dab"),
            _dot(F.col("va"), F.col("va")).alias("daa"),
            _dot(F.col("vb"), F.col("vb")).alias("dbb"),
        )
    )
    ne = F.col("n_even").cast("double")
    no = F.col("n_odd").cast("double")
    return j.select(
        "label",
        F.col("n_even").cast("long").alias("n_even"),
        F.col("n_odd").cast("long").alias("n_odd"),
        F.when(
            (F.col("daa") == 0) | (F.col("dbb") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("dab") / (F.sqrt(F.col("daa")) * F.sqrt(F.col("dbb"))), 4
            )
        )
        .alias("centroid_cosine"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("daa") / (ne * ne)
                    - F.lit(2.0) * F.col("dab") / (ne * no)
                    + F.col("dbb") / (no * no),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("shift_norm"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# Prefix energy profile (round 11) — the Matryoshka-representation
# audit: how much of the corpus's embedding energy lives in the first
# L dimensions? If 32 of 64 dims carry 95% of the energy, a truncated
# index is nearly free recall-wise — this is the receipt that decision
# reads. Exactness: per-dimension squared mass is a DECIMAL(25,12) sum
# of exact double squares (float->double is exact; the double product
# rounds identically on both engines before the decimal cast), prefix
# totals are sums over the FIXED 64-dim frame, and the ratio crosses to
# double via the VARCHAR parse. 100 TB: one hash aggregate over the
# exploded (dim, x^2) frame; the profile frame is 4 rows.
# ---------------------------------------------------------------------------

_PREFIX_LENGTHS = (8, 16, 32, 64)

_PREFIX_ENERGY_SQL = f"""
WITH comps AS (
    SELECT g.i AS i, emb[g.i + 1] * emb[g.i + 1] AS x2
    FROM (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         (SELECT UNNEST(range({_CSHIFT_DIM})) AS i) g
),
dims AS (
    SELECT i, SUM(CAST(x2 AS DECIMAL(25,12))) AS e FROM comps GROUP BY i
),
tot AS (SELECT SUM(e) AS te FROM dims),
prof AS (
    SELECT l.len,
           SUM(CASE WHEN dims.i < l.len THEN dims.e ELSE CAST(0 AS DECIMAL(25,12)) END) AS pe
    FROM dims, (SELECT UNNEST({list(_PREFIX_LENGTHS)}) AS len) l
    GROUP BY l.len
)
SELECT CAST(prof.len AS BIGINT) AS prefix_len,
       CAST(CAST(prof.pe AS VARCHAR) AS DOUBLE) AS prefix_energy,
       CASE WHEN tot.te = 0 THEN NULL
            ELSE ROUND(CAST(CAST(prof.pe AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(tot.te AS VARCHAR) AS DOUBLE), 6)
       END AS energy_fraction
FROM prof, tot ORDER BY prefix_len
"""


@register("embedding_prefix_energy_profile", oracle=_PREFIX_ENERGY_SQL)
def embedding_prefix_energy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    vecs = spread(
        load_table(spark, sf_dir, "embeddings").select(
            _as_double("embedding").alias("emb")
        )
    )
    dims = (
        vecs.select(F.posexplode("emb").alias("i", "x"))
        .select("i", (F.col("x") * F.col("x")).alias("x2"))
        .groupBy("i")
        .agg(F.sum(F.col("x2").cast("decimal(25,12)")).alias("e"))
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    dims = session_cache(dims)
    tot = dims.agg(F.sum("e").alias("te"))
    lens = spark.createDataFrame(
        [(int(l),) for l in _PREFIX_LENGTHS], "len long"
    )
    prof = (
        dims.crossJoin(broadcast(lens))
        .groupBy("len")
        .agg(
            F.sum(
                F.when(F.col("i") < F.col("len"), F.col("e")).otherwise(
                    F.lit(0).cast("decimal(25,12)")
                )
            ).alias("pe")
        )
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        prof.crossJoin(broadcast(tot))
        .select(
            F.col("len").cast("long").alias("prefix_len"),
            dd(F.col("pe")).alias("prefix_energy"),
            F.when(F.col("te") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(dd(F.col("pe")) / dd(F.col("te")), 6))
            .alias("energy_fraction"),
        )
        .orderBy("prefix_len")
    )


# ---------------------------------------------------------------------------
# Participation ratio of the per-dimension variance spectrum (round
# 12) — the one-number answer to "how many of the 64 embedding
# dimensions actually carry signal?": PR = (Σ var_d)² / Σ var_d², the
# inverse-participation measure from physics that equals 64 for a
# perfectly isotropic space and 1 when a single dimension dominates —
# the cheap proxy for effective rank that needs NO eigendecomposition
# (the power-iteration query above covers the top component; this
# covers the whole spectrum's flatness). Exactness: per-dim moments
# are the DECIMAL(25,12) order-free sums; each var_d is then ONE
# identical IEEE expression, re-quantized to DECIMAL at 12 dp before
# the 64-row spectrum sums so no float sum is order-dependent. 100 TB:
# one row-local explode (64 rows/vector, map-side combinable), one
# aggregate to 64 rows, one 1-row reduce.
# ---------------------------------------------------------------------------

_PR_SQL = f"""
WITH vals AS (
    SELECT g.i, (CAST(embedding AS DOUBLE[]))[g.i + 1] AS v
    FROM embeddings, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
moments AS (
    SELECT i,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(v AS DECIMAL(25,12))) AS VARCHAR) AS DOUBLE) AS s1,
           CAST(CAST(SUM(CAST(v * v AS DECIMAL(25,12))) AS VARCHAR) AS DOUBLE) AS s2
    FROM vals GROUP BY i
),
vars_ AS (
    SELECT i,
           ROUND((s2 - s1 * s1 / n) / n, 12) AS var_d
    FROM moments
),
s AS (
    SELECT COUNT(*) AS n_dims,
           CAST(CAST(SUM(CAST(var_d AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
               AS sv,
           CAST(CAST(SUM(CAST(ROUND(var_d * var_d, 12) AS DECIMAL(28,12)))
                AS VARCHAR) AS DOUBLE) AS sv2
    FROM vars_
)
SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vectors,
       CAST(n_dims AS BIGINT) AS n_dims,
       ROUND(sv, 6) AS total_variance,
       CASE WHEN COALESCE(sv2, 0) = 0 THEN NULL
            ELSE ROUND(sv * sv / sv2, 6) END AS participation_ratio,
       CASE WHEN COALESCE(sv2, 0) = 0 OR n_dims = 0 THEN NULL
            ELSE ROUND(sv * sv / sv2 / n_dims, 6) END AS pr_fraction
FROM s
"""


@register("embedding_participation_ratio", oracle=_PR_SQL)
def embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.slice(_as_double("embedding"), 1, _EMB_DIM)).alias(
            "i", "v"
        )
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    dec = lambda c: dd(F.sum(c.cast("decimal(25,12)")))  # noqa: E731
    moments = vals.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("v")).alias("s1"),
        dec(F.col("v") * F.col("v")).alias("s2"),
    )
    vars_ = moments.select(
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / F.col("n"),
            12,
        ).alias("var_d")
    )
    s = vars_.agg(
        F.count(F.lit(1)).alias("n_dims"),
        dd(F.sum(F.col("var_d").cast("decimal(28,12)"))).alias("sv"),
        dd(
            F.sum(
                F.round(F.col("var_d") * F.col("var_d"), 12).cast(
                    "decimal(28,12)"
                )
            )
        ).alias("sv2"),
    )
    nv = emb.agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    pr = F.col("sv") * F.col("sv") / F.col("sv2")
    return s.crossJoin(broadcast(nv)).select(  # [1row] vector count
        "n_vectors",
        F.col("n_dims").cast("long").alias("n_dims"),
        F.round(F.col("sv"), 6).alias("total_variance"),
        F.when(
            F.coalesce(F.col("sv2"), F.lit(0.0)) == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(pr, 6))
        .alias("participation_ratio"),
        F.when(
            (F.coalesce(F.col("sv2"), F.lit(0.0)) == 0)
            | (F.col("n_dims") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(pr / F.col("n_dims"), 6))
        .alias("pr_fraction"),
    )


# ---------------------------------------------------------------------------
# Adjusted Rand Index of k-means vs labels (round 13) — the external
# clustering-evaluation number: how much the UNSUPERVISED 2-round
# k-means structure (kmeans_two_rounds' exact assignment law) agrees
# with the supervised label column, chance-corrected. Everything is
# pair-counting combinatorics on the clusters x labels contingency
# table (bounded 16 x |labels|): with S = sum_ij C(n_ij,2),
# A = sum_i C(a_i,2), B = sum_j C(b_j,2), T = C(n,2),
# ARI = 2(ST - AB) / (T(A+B) - 2AB) — exact integers in decimal(38,0)
# end to end, ONE final division. 100 TB: the assignment is the
# audited corpus x 16-centroid scan; the rest is bounded frames.
# ---------------------------------------------------------------------------

_ARI_SQL = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
c0 AS (
    SELECT vec_id AS cid, emb AS cemb FROM vecs
    WHERE vec_id % {_KM_MOD} = {_KM_REM} AND vec_id < {_KM_CAP}
),
a1 AS (
    SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_KM_COS.format(a="v.emb", b="c.cemb")} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN c0 c
    ) WHERE rn = 1
),
comps1 AS (
    SELECT cid, g.i AS pos, CAST(emb[g.i + 1] AS DECIMAL(25,12)) AS x
    FROM a1, (SELECT UNNEST(range({_EMB_DIM})) AS i) g
),
c1 AS (
    SELECT cid, list(m ORDER BY pos) AS cemb FROM (
        SELECT cid, pos, ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS m
        FROM comps1 GROUP BY cid, pos
    ) GROUP BY cid
),
a2 AS (
    SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {_KM_COS.format(a="v.emb", b="c.cemb")} DESC, c.cid ASC
               ) AS rn
        FROM vecs v CROSS JOIN c1 c
    ) WHERE rn = 1
),
cont AS (
    SELECT a2.cid, e.label, COUNT(*) AS nij
    FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
    GROUP BY 1, 2
),
sums AS (
    SELECT
        SUM(CAST(nij AS HUGEINT) * (nij - 1) // 2) AS s,
        (SELECT SUM(CAST(a AS HUGEINT) * (a - 1) // 2)
         FROM (SELECT SUM(nij) AS a FROM cont GROUP BY cid)) AS aa,
        (SELECT SUM(CAST(b AS HUGEINT) * (b - 1) // 2)
         FROM (SELECT SUM(nij) AS b FROM cont GROUP BY label)) AS bb,
        (SELECT CAST(SUM(nij) AS HUGEINT) * (SUM(nij) - 1) // 2 FROM cont)
            AS t,
        (SELECT COUNT(DISTINCT cid) FROM cont) AS n_clusters,
        (SELECT COUNT(DISTINCT label) FROM cont) AS n_labels,
        (SELECT SUM(nij) FROM cont) AS n
    FROM cont
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(n_labels AS BIGINT) AS n_labels,
       CASE WHEN t * (aa + bb) - 2 * aa * bb = 0 THEN NULL
            ELSE ROUND(
                CAST(CAST(2 * (s * t - aa * bb) AS VARCHAR) AS DOUBLE)
                / CAST(CAST(t * (aa + bb) - 2 * aa * bb AS VARCHAR)
                       AS DOUBLE), 6)
       END AS ari
FROM sums
"""


@register("embedding_ari_kmeans_labels", oracle=_ARI_SQL)
def embedding_ari_kmeans_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = spread(
        emb.select("vec_id", _as_double("embedding").alias("emb"))
    )
    c0 = vecs.filter(
        (F.col("vec_id") % _KM_MOD == _KM_REM) & (F.col("vec_id") < _KM_CAP)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("cemb"))
    a1 = _km_assign(vecs, c0)
    c1 = _km_update(a1)
    a2 = _km_assign(vecs, c1)
    cont = (
        a2.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    cont = session_cache(cont)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    pairs = lambda c: d38(c) * (c - 1) / 2  # exact: c*(c-1) is even
    s_f = cont.agg(
        F.sum(pairs(F.col("nij")).cast("decimal(38,0)")).alias("s"),
        F.sum("nij").cast("decimal(38,0)").alias("n"),
        F.countDistinct("cid").cast("long").alias("n_clusters"),
        F.countDistinct("label").cast("long").alias("n_labels"),
    )
    a_f = (
        cont.groupBy("cid")
        .agg(F.sum("nij").alias("a"))
        .agg(F.sum(pairs(F.col("a")).cast("decimal(38,0)")).alias("aa"))
    )
    b_f = (
        cont.groupBy("label")
        .agg(F.sum("nij").alias("b"))
        .agg(F.sum(pairs(F.col("b")).cast("decimal(38,0)")).alias("bb"))
    )
    j = s_f.crossJoin(broadcast(a_f)).crossJoin(broadcast(b_f))  # [1row] x2
    t = (F.col("n") * (F.col("n") - 1) / 2).cast("decimal(38,0)")
    num = (
        F.lit(2) * (F.col("s") * t - F.col("aa") * F.col("bb"))
    ).cast("decimal(38,0)")
    den = (
        t * (F.col("aa") + F.col("bb"))
        - F.lit(2) * F.col("aa") * F.col("bb")
    ).cast("decimal(38,0)")
    return j.select(
        F.col("n").cast("long").alias("n_vecs"),
        "n_clusters",
        "n_labels",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dd(num) / dd(den), 6))
        .alias("ari"),
    )
