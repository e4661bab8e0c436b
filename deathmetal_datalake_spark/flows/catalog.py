"""Catalog-managed zone tables — the Iceberg/Nessie analog (S10/S11).

Reference: ``flows_iceberg/bronze_iceberg.py:40-44`` (create-if-absent +
overwrite), ``silver_iceberg.py:26-30`` / ``gold_iceberg.py:21-24``
(append), reads via ``CATALOG.load_table`` (S11). The environment has no
Iceberg runtime, so the Spark-native analog is the session catalog +
warehouse dir: ``saveAsTable`` with ``overwrite``/``append`` carries the
same write-mode semantics, ``spark.table`` is the catalog read. On a
cluster with the Iceberg/Delta catalog plugin these calls become
``df.writeTo(...).createOrReplace()/append()`` with no other changes —
the flow code is format-agnostic by design.

Snapshot/branch/time-travel semantics (the part ``saveAsTable`` cannot
express) live in ``sources/snapshots.SnapshotTable``: immutable
manifests over parquet, O(1) branch/rollback/fast-forward, driver-
checked via ``plans/snapshot_queries.py``.

Bucketing lives here too: fact tables written ``bucketBy`` the join key
let repeated joins run shuffle-free (co-located sort-merge), the
table-layout lever that matters most at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_name(zone: str, dataset: str) -> str:
    """``zone.dataset`` identity (``flows_iceberg/bronze_iceberg.py:35``)
    flattened for the default database."""
    return f"{zone}_{dataset}"


def write_zone_table(
    df: DataFrame, zone: str, dataset: str, mode: str = "overwrite"
) -> str:
    """S10: create-if-absent + overwrite (bronze) / append (silver, gold
    default) — ``saveAsTable`` implements both create and write in one
    idempotent call."""
    name = table_name(zone, dataset)
    df.write.mode(mode).format("parquet").saveAsTable(name)
    return name


def read_zone_table(spark: SparkSession, zone: str, dataset: str) -> DataFrame:
    """S11: catalog table read (``daft.read_iceberg(CATALOG.load_table)``)."""
    return spark.table(table_name(zone, dataset))


def write_bucketed_fact(
    df: DataFrame, zone: str, dataset: str, bucket_col: str, n_buckets: int = 16
) -> str:
    """Bucketed fact-table layout: co-locates rows by join key so
    fact⨝fact joins on ``bucket_col`` skip the shuffle entirely
    (SortMergeJoin reads pre-bucketed, pre-sorted part files)."""
    name = table_name(zone, dataset)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    return name


def write_partitioned_events(df: DataFrame, path: str, partition_col: str = "event_date") -> None:
    """Date-partitioned event layout: `events/event_date=YYYY-MM-DD/...`.

    The partitioning lever for time-series at 100 TB — queries with a
    date predicate scan only the matching directories (PartitionFilters
    in the plan), turning a full-table scan into a per-day read.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn(partition_col, F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .option("compression", "snappy")
        .parquet(path)
    )


def merge_upsert(target: "DataFrame", updates: "DataFrame", key: str) -> "DataFrame":
    """MERGE INTO analog (SCD-1 upsert): rows in ``updates`` replace
    same-key rows in ``target``; unmatched update rows are inserted.

    Expressed as one full-outer join on the key with column-wise
    COALESCE(update, target) — a single shuffle on the merge key, the
    same physical shape Delta/Iceberg MERGE compiles to for the
    all-columns-update case. At 100 TB the join benefits from both
    sides being bucketed/partitioned by the key (write_bucketed_fact);
    AQE handles update-batch skew.

    Caveat: the COALESCE form cannot write an explicit NULL over a
    non-NULL target value — matched rows take the update's value only
    where it is non-NULL (the common SCD-1 contract).
    """
    from pyspark.sql import functions as F

    if set(updates.columns) != set(target.columns):
        raise ValueError("merge_upsert requires identical column sets")
    u = updates.select(
        F.col(key).alias("_mk"),
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns if c != key],
    )
    joined = target.join(u, target[key] == u["_mk"], "full_outer")
    merged_cols = [
        F.coalesce(target[key], u["_mk"]).alias(key),
        *[
            F.coalesce(F.col(f"_u_{c}"), target[c]).alias(c)
            for c in target.columns
            if c != key
        ],
    ]
    return joined.select(*merged_cols)


def snapshot_diff(v_old: "DataFrame", v_new: "DataFrame", key: str) -> "DataFrame":
    """Change-data-capture between two versions of a keyed table
    (the ``table_changes`` / incremental-read analog for the snapshot
    catalog): emits one row per key whose state differs, labeled
    ``added`` / ``removed`` / ``changed``, with ``old_<col>`` /
    ``new_<col>`` value pairs for every non-key column.

    One full-outer join on the key — a single shuffle, NULL-safe
    comparisons (a NULL→value transition counts as a change). Unchanged
    keys are filtered before any downstream consumer, so the output is
    O(churn), not O(table) — the property that makes downstream
    incremental recomputes viable on a 100 TB table with a 0.1% daily
    delta.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    if set(v_old.columns) != set(v_new.columns):
        raise ValueError("snapshot_diff requires identical column sets")
    cols = [c for c in v_old.columns if c != key]
    o = v_old.select(
        F.col(key).alias("_ok"), *[F.col(c).alias(f"_o_{c}") for c in cols]
    )
    n = v_new.select(
        F.col(key).alias("_nk"), *[F.col(c).alias(f"_n_{c}") for c in cols]
    )
    j = o.join(n, o["_ok"] == n["_nk"], "full_outer")
    # Initializer matters: a key-only table (membership set) has no
    # value columns, and its diff is pure added/removed.
    value_changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in cols],
        F.lit(False),
    )
    change = (
        F.when(F.col("_nk").isNull(), "removed")
        .when(F.col("_ok").isNull(), "added")
        .when(value_changed, "changed")
    )
    return (
        j.select(
            F.coalesce(F.col("_ok"), F.col("_nk")).alias(key),
            change.alias("change"),
            *[F.col(f"_o_{c}").alias(f"old_{c}") for c in cols],
            *[F.col(f"_n_{c}").alias(f"new_{c}") for c in cols],
        )
        .filter(F.col("change").isNotNull())
    )
