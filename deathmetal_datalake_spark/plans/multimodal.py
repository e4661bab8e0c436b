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
