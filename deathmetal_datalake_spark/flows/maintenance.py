"""Table-maintenance operators: small-file compaction and
schema-evolution reads.

The reference sidesteps both problems by writing exactly one object per
table (`flows/bronze.py:92`) — which is itself the scale anti-pattern.
With directory-per-table sinks, real deployments need:

- **compaction** (the OPTIMIZE analog): streaming ingest and frequent
  appends leave many small part-files; small files cost a scan task each
  and bloat the file index. Compaction rewrites a table to ~target-sized
  files with a no-shuffle coalesce when reducing file count.
- **schema evolution**: appended batches can carry added columns;
  ``mergeSchema`` reads reconcile old and new footers (missing columns
  → NULL), the Parquet-level analog of Iceberg/Delta schema evolution.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_part_files, total_bytes) for a parquet table directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_table(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet table into ~target-sized files; returns the new
    file count. Uses coalesce (no shuffle) since compaction only merges.
    The write goes through a temp dir then swaps, so a failed rewrite
    never destroys the table."""
    n_files, total = table_file_stats(path)
    target = max(1, math.ceil(total / target_file_bytes))
    if target >= n_files:
        return n_files
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(target).write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    backup = path.rstrip("/") + "__old"
    os.rename(path, backup)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(backup)
    return table_file_stats(path)[0]


def read_with_schema_evolution(spark: SparkSession, path: str) -> DataFrame:
    """mergeSchema read: batches appended with extra columns reconcile
    into one schema; rows from older batches get NULLs."""
    return spark.read.option("mergeSchema", "true").parquet(path)
