"""Parquet table loaders for the driver-generated test datasets.

Analog of the reference's zone readers (``flows/silver.py:39-45``,
``flows/gold.py:28-33``, ``main.py:13-16``) with one structural upgrade:
the reference downloads whole S3 objects eagerly before wrapping them
lazily (defeating pushdown — SURVEY.md §4); here every loader is a lazy
``spark.read.parquet`` so column pruning and predicate pushdown reach the
parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
# vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The legacy
# escape hatch reads it as a long (nanos since epoch); we then rebuild a
# TIMESTAMP_NTZ at microsecond precision, matching DuckDB's
# CAST(ts AS TIMESTAMP) on the same file bit-for-bit.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``{sf_dir}/{name}.parquet`` lazily."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        previous = spark.conf.get(_NANOS_AS_LONG, "false")
        spark.conf.set(_NANOS_AS_LONG, "true")
        try:
            raw = spark.read.parquet(path)
        finally:
            spark.conf.set(_NANOS_AS_LONG, previous)
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn(
                "ts",
                # `div` (integer floor division) — a double division would
                # round half-up and drift 1µs off DuckDB's truncating
                # nanos→micros cast.
                F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})"),
            )
        return raw
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register each table as a temp view (SQL-path analog of the
    reference's Trino catalog tables, ``scripts/trino_create_tables.sql``)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
