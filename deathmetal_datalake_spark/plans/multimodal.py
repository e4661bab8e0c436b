"""Multimodal catalog entries: binary-payload plumbing, oracle-checked.

The documents table doubles as a binary corpus (utf-8 payloads) so the
Arrow-batched decode stage can be verified against DuckDB's
octet_length/md5 — proving the mapInPandas plumbing end-to-end, not
just its schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.multimodal import (
    decode_media,
    deterministic_decode,
    documents_as_media,
    sample_frames,
)
from deathmetal_datalake_spark.plans.registry import register
from deathmetal_datalake_spark.sources.tables import load_table

_DECODE_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


@register("multimodal_decode_stats", oracle=_DECODE_SQL)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(documents_as_media(docs), decoder=deterministic_decode)


_FRAMES_SQL = """
SELECT doc_id AS media_id,
       COUNT(*) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents, UNNEST(range(0, GREATEST(octet_length(encode(text)), 1), 64)) AS g(i)
GROUP BY media_id, n_bytes
"""


@register("multimodal_frame_counts", oracle=_FRAMES_SQL)
def multimodal_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame fan-out verified by count: one frame per 64-byte slice."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_media(docs), every_n_bytes=64)
    sizes = documents_as_media(docs).select(
        "media_id", F.octet_length("content").cast("long").alias("n_bytes")
    )
    counts = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return counts.join(sizes, "media_id").select("media_id", "n_frames", "n_bytes")


_RESIZE_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       CAST(LEAST(octet_length(encode(text)), 256) AS BIGINT) AS new_bytes
FROM documents
"""


@register("multimodal_resize_stats", oracle=_RESIZE_SQL)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage through the Arrow batch path; the truncate-only fake
    makes the size law (new = min(orig, target)) SQL-checkable."""
    from deathmetal_datalake_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(documents_as_media(docs), target_bytes=256).select(
        "media_id", "orig_bytes", "new_bytes"
    )


# The fake embedding is the md5 digest's 16 bytes; SQL reproduces each
# component by hex-slicing md5(), verifying the whole mapInPandas path.
_FEATURES_SQL = """
WITH hexed AS (
    SELECT doc_id, md5(text) AS h FROM documents
)
SELECT doc_id AS media_id,
       list_transform(range(16),
           i -> CAST(('0x' || substr(h, 2 * i + 1, 2)) AS BIGINT)) AS features
FROM hexed
"""


@register("multimodal_feature_embeddings", oracle=_FEATURES_SQL)
def multimodal_feature_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage (model-embedding shape) through the
    Arrow batch path, oracle-checked component-by-component."""
    from deathmetal_datalake_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs))
