"""Bronze flow: landing CSVs → normalized, deduplicated snappy Parquet.

Reference: ``flows/bronze.py:61-99`` (CSV → Polars → parquet per object,
with name normalization at :30-40 and ``unique()`` at :80), fan-out via
Prefect ``.map`` (:112).

Spark-first restructuring: one multi-file CSV scan per dataset replaces
the reference's per-object task fan-out (Spark parallelizes within the
scan), and the sink is a *directory* of part-files instead of the
reference's single object (``flows/bronze.py:92``) — the single-object
layout serializes the write and caps downstream read parallelism at 1
task; a directory scales writes and reads with the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from deathmetal_datalake_spark.operators.columns import normalize_column_names
from deathmetal_datalake_spark.schemas import DATASETS

# Reference infers from the first 5000 rows (`flows/bronze.py:74`).
# Spark's samplingRatio-based inference reads a fraction instead; for
# parity-of-intent we keep full-file inference at small scale and note
# that at 100 TB bronze should use declared schemas (schemas.py).
_INFER_OPTIONS = {"header": "true", "inferSchema": "true"}


def bronze_dataset(spark: SparkSession, landing_dir: str, dataset: str) -> DataFrame:
    """Read every landing CSV chunk of one dataset and normalize it.

    The multi-file read implicitly unions chunks (reference operator
    S6/S7); chunk files each carry a header (``flows/landing.py:38-47``)
    which the ``header`` option strips per-file. Embedded header rows
    that survive mid-file are handled downstream at silver (P11).
    """
    path = os.path.join(landing_dir, dataset)
    df = spark.read.options(**_INFER_OPTIONS).csv(path)
    # P1 normalize + dedupe column names (`flows/bronze.py:30-40`),
    # P13 full-row dedupe (`flows/bronze.py:80`).
    return normalize_column_names(df).dropDuplicates()


def bronze_flow(
    spark: SparkSession,
    landing_dir: str,
    bronze_dir: str,
    datasets: tuple[str, ...] = DATASETS,
) -> dict[str, str]:
    """landing/{ds}/*.csv → bronze/{ds}/ parquet. Returns path map."""
    out: dict[str, str] = {}
    for ds in datasets:
        src = os.path.join(landing_dir, ds)
        if not os.path.isdir(src):
            # Dataset-presence conditional (`flows/silver.py:169-183`).
            continue
        dest = os.path.join(bronze_dir, ds)
        bronze_dataset(spark, landing_dir, ds).write.mode("overwrite").option(
            "compression", "snappy"
        ).parquet(dest)
        out[ds] = dest
    return out
