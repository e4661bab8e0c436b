"""Corpus flow: the training-data medallion — raw documents → deduped →
quality-filtered → stratified-sampled → packed sequences, each stage a
zone parquet write.

This is the composition story for the pipeline operators in
``plans/pipeline.py``/``plans/dedup.py``: the same medallion shape as
the reference's bronze→silver→gold (``flows/bronze.py`` ``silver.py``
``gold.py``), applied to corpus assembly. Every stage is a pure
DataFrame transform; writes are snappy parquet directories, so the flow
scales by partitioning alone and each zone is independently resumable —
re-running a stage overwrites its zone idempotently.

Stage semantics (all Catalyst-native, zero Python UDFs):
1. **dedup**: exact-hash dedup — keep the min doc_id per 60-bit content
   hash (one shuffle on the hash key).
2. **quality**: cheap pre-filters — token count and mean token length
   bounds (projection + filter; no shuffle).
3. **sample**: deterministic per-language hash sampling (stateless
   filter; no shuffle, stable under re-runs and retries).
4. **pack**: fixed-token-budget packing per language from the exclusive
   prefix sum (one shuffle on the group key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.pipeline import (
    _DEFAULT_RATE,
    _LANG_RATES as _SAMPLE_RATES,
    _PACK_BUDGET,
)
from deathmetal_datalake_spark.plans.registry import hash60

_MIN_TOKENS = 5
_MAX_MEAN_TOKEN_LEN = 12.0


def dedup_stage(docs: DataFrame) -> DataFrame:
    """Exact dedup: first (min doc_id) copy per content hash survives."""
    w = Window.partitionBy(hash60("text")).orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def quality_stage(docs: DataFrame) -> DataFrame:
    """Token-count / mean-token-length bounds (the cheap pre-filters)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    mean_len = (F.length(F.trim(F.col("text"))) - (n_tokens - 1)) / n_tokens
    return (
        docs.withColumn("n_tokens", n_tokens.cast("long"))
        .filter((F.col("n_tokens") >= _MIN_TOKENS) & (mean_len <= _MAX_MEAN_TOKEN_LEN))
    )


def sample_stage(docs: DataFrame) -> DataFrame:
    """Deterministic per-language keep-rate (stateless hash filter)."""
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in _SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.filter((hash60(F.col("doc_id").cast("string")) % 100) < rate)


def pack_stage(docs: DataFrame) -> DataFrame:
    """Assign pack ids from the exclusive per-language token prefix sum."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        F.floor(prefix / _PACK_BUDGET).cast("long").alias("pack_id"),
    )


def corpus_flow(spark: SparkSession, docs: DataFrame, corpus_dir: str) -> dict[str, str]:
    """Run the four stages, writing one zone directory per stage; returns
    {stage: path}. Counts are monotonically non-increasing through
    dedup→quality→sample; pack preserves the sampled count."""
    out: dict[str, str] = {}
    spark_local = docs.sparkSession

    def materialize(name: str, df: DataFrame) -> DataFrame:
        # Each zone is written once and the NEXT stage reads the written
        # parquet back: one execution per stage. Chaining the lazy plans
        # instead would re-run every upstream stage per downstream write
        # (the dedup window would execute four times).
        dest = os.path.join(corpus_dir, name)
        df.write.mode("overwrite").option("compression", "snappy").parquet(dest)
        out[name] = dest
        return spark_local.read.parquet(dest)

    deduped = materialize("deduped", dedup_stage(docs))
    quality = materialize("quality", quality_stage(deduped))
    sampled = materialize("sampled", sample_stage(quality))
    materialize("packed", pack_stage(sampled))
    return out
