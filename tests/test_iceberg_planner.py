"""External-planner acceptance for the Iceberg export (VERDICT r6 #5):
an engine-shaped reader that consumes ONLY the exported metadata tree
(vN.metadata.json + Avro manifest list + Avro manifests) must be able
to plan a pruned scan — manifest pruning from field_summaries, file
pruning from typed partition values and Appendix-D bounds — WITHOUT
opening any data file, and then execute the plan to the same rows the
native reader produces (equality deletes applied, snapshots pinnable).

The no-data-files-at-plan-time claim is proven mechanically: the data
directories are renamed away while planning runs.
"""

from __future__ import annotations

import hashlib
import os

import pytest


@pytest.fixture()
def table(spark, tmp_path):
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_partition_spec([("bucket[4]", "user_id")])
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 10).alias("grp"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    t.write(mk(0, 100), mode="overwrite")
    t.write(mk(100, 200), mode="append")  # disjoint user_id range: bounds differ
    t.delete_keys(
        mk(0, 200).filter(F.col("user_id").isin(3, 7, 150)).select("user_id"),
        "user_id",
    )
    return t


def _planner(spark, table):
    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner

    meta_path = table.export_iceberg_metadata(codec="avro")
    return IcebergScanPlanner(spark, meta_path)


def _hide_data_dirs(base_path):
    moved = []
    for name in os.listdir(base_path):
        p = os.path.join(base_path, name)
        if name != "metadata" and os.path.isdir(p):
            os.rename(p, p + ".hidden")
            moved.append(p)
    return moved


def _restore(moved):
    for p in moved:
        os.rename(p + ".hidden", p)


def _bucket4(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 4


def test_partition_eq_prunes_manifests_without_opening_data(spark, table):
    planner = _planner(spark, table)
    moved = _hide_data_dirs(table.base_path)
    try:
        plan = planner.plan_scan({"user_id": ("eq", 42)})
    finally:
        _restore(moved)

    # Planning succeeded while every data file was unreachable.
    assert plan.data_files, "plan kept no files"
    # field_summaries pruned whole manifests: 2 writes x 4 buckets = 8
    # data manifests, only the target bucket's 2 survive.
    assert plan.n_manifests_total == 8
    assert plan.n_manifests_pruned == 6
    want_bucket = _bucket4(42)
    for f in plan.data_files:
        assert str(f.partition["user_id_bucket4"]) == str(want_bucket)

    got = {r["user_id"] for r in planner.execute(plan).collect()}
    assert 42 in got
    # Everything planned-in shares the bucket (superset of the exact
    # answer, as partition pruning should be), nothing outside it.
    assert all(_bucket4(u) == want_bucket for u in got)


def test_column_bounds_prune_files(spark, table):
    planner = _planner(spark, table)
    moved = _hide_data_dirs(table.base_path)
    try:
        plan = planner.plan_scan({"user_id": ("range", 150, 199)})
    finally:
        _restore(moved)
    # The first write's files (user_id 0-99) are excluded by their
    # Appendix-D upper bounds without being opened.
    assert plan.n_files_pruned > 0
    assert plan.data_files
    for f in plan.data_files:
        from deathmetal_datalake_spark.sources.iceberg_planner import (
            decode_single_value,
        )

        hi = decode_single_value("long", f.upper_bounds.get(1))
        assert hi is None or hi >= 150

    rows = planner.execute(plan)
    got = {r["user_id"] for r in rows.filter(rows.user_id >= 150).collect()}
    native = {
        r["user_id"]
        for r in table.read().filter("user_id >= 150 and user_id <= 199").collect()
    }
    assert got == native  # 150 was deleted; the delete manifests apply


def test_full_scan_matches_native_reader(spark, table):
    planner = _planner(spark, table)
    plan = planner.plan_scan()
    assert plan.deletes, "equality-delete manifests missing from the plan"
    got = sorted(
        (r["user_id"], r["grp"], r["name"]) for r in planner.execute(plan).collect()
    )
    native = sorted(
        (r["user_id"], r["grp"], r["name"]) for r in table.read().collect()
    )
    assert got == native
    assert len(got) == 197  # 200 minus 3 deleted keys


def test_snapshot_pinned_plan_time_travels(spark, table):
    planner = _planner(spark, table)
    first = planner.meta["snapshots"][0]["snapshot-id"]
    plan = planner.plan_scan(snapshot_id=first)
    assert plan.snapshot_id == first
    assert not plan.deletes  # the delete commit is after this snapshot
    assert planner.execute(plan).count() == 100


def test_month_transform_range_prunes_manifests(spark, tmp_path):
    # Date-transform partition values render as fixed-width ISO
    # prefixes, so a RANGE predicate on the source column prunes
    # manifests/files lexicographically — the planner's range path.
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl_month"))
    t.set_partition_spec([("month", "event_date")])
    df = spark.range(180).select(
        F.col("id").alias("row_id"),
        F.expr("date_add(DATE '2024-01-01', CAST(id AS INT))").alias("event_date"),
        (F.col("id") % 7).alias("grp"),
    )
    t.write(df, mode="overwrite")

    planner = IcebergScanPlanner(spark, t.export_iceberg_metadata(codec="avro"))
    moved = _hide_data_dirs(t.base_path)
    try:
        plan = planner.plan_scan(
            {"event_date": ("range", "2024-02-10", "2024-03-20")}
        )
    finally:
        _restore(moved)
    # 6 months of data; only Feb and Mar manifests may survive. The
    # spec encodes month partition values as months since epoch.
    assert plan.n_manifests_total == 6
    assert plan.n_manifests_pruned == 4
    months = {int(f.partition["event_date_month"]) for f in plan.data_files}
    assert months == {(2024 - 1970) * 12 + 1, (2024 - 1970) * 12 + 2}

    rows = planner.execute(plan)
    got = {
        r["row_id"]
        for r in rows.filter(
            "event_date >= DATE '2024-02-10' AND event_date <= DATE '2024-03-20'"
        ).collect()
    }
    native = {
        r["row_id"]
        for r in t.read()
        .filter("event_date >= DATE '2024-02-10' AND event_date <= DATE '2024-03-20'")
        .collect()
    }
    assert got == native and len(got) == 40


def test_identity_partition_eq_plans_typed(spark, tmp_path):
    # Round-8 ADVICE (medium): an eq predicate on an identity-
    # partitioned int column used to crash planning with a TypeError
    # (str(v) predicate vs int-decoded field-summary bounds). Identity
    # values are now coerced to the source type, and incomparable
    # renderings keep the manifest instead of crashing.
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl_ident"))
    t.set_partition_spec([("identity", "grp")])
    df = spark.range(50).select(
        F.col("id").alias("row_id"), (F.col("id") % 5).cast("int").alias("grp")
    )
    t.write(df, mode="overwrite")

    planner = IcebergScanPlanner(spark, t.export_iceberg_metadata(codec="avro"))
    moved = _hide_data_dirs(t.base_path)
    try:
        plan = planner.plan_scan({"grp": ("eq", 3)})
        range_plan = planner.plan_scan({"grp": ("range", 1, 2)})
    finally:
        _restore(moved)

    # 5 identity partitions -> 5 data manifests; only grp=3 survives eq.
    assert plan.n_manifests_total == 5
    assert plan.n_manifests_pruned == 4
    # identity is order-preserving, so typed RANGE pruning applies too.
    assert range_plan.n_manifests_pruned == 3

    got = sorted(r["row_id"] for r in planner.execute(plan).collect())
    native = sorted(
        r["row_id"] for r in t.read().filter("grp = 3").collect()
    )
    assert got == native and len(got) == 10


def test_equality_delete_is_sequence_scoped(spark, tmp_path):
    # Round-8 ADVICE (high): an equality delete applies only to data
    # files with data sequence number STRICTLY LESS than the delete's.
    # A key deleted and then re-inserted in a later snapshot must
    # survive the planner's execute() exactly as it survives the
    # native reader (snapshots.delete_keys DELETE-then-INSERT).
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl_seqscope"))
    mk = lambda lo, hi, tag: spark.range(lo, hi).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit(tag), F.col("id")).alias("name"),
    )
    t.write(mk(0, 20, "old"), mode="overwrite")
    t.delete_keys(
        mk(0, 20, "x").filter(F.col("user_id").isin(3, 7)).select("user_id"),
        "user_id",
    )
    # Re-insert key 3 AFTER the delete: it must come back.
    t.write(mk(3, 4, "new"), mode="append")

    planner = IcebergScanPlanner(spark, t.export_iceberg_metadata(codec="avro"))
    plan = planner.plan_scan()
    assert plan.deletes, "delete manifest missing"

    got = sorted((r["user_id"], r["name"]) for r in planner.execute(plan).collect())
    native = sorted((r["user_id"], r["name"]) for r in t.read().collect())
    assert got == native
    assert (3, "new3") in got, "re-inserted key was dropped by an older delete"
    assert all(u != 7 for u, _ in got), "deleted key leaked back"


def test_sequence_scoped_deletes_across_schema_evolution(spark, tmp_path):
    # Round-8 robustness: execute() groups planned files by data
    # sequence number; when those groups span a schema evolution
    # (a column added in a later snapshot), the union must read NULL
    # for the new column from older files — the same semantics one
    # mixed parquet read gives — while the delete still applies only
    # to strictly-older files.
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl_evo"))
    v1 = spark.range(10).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("old"), F.col("id")).alias("name"),
    )
    t.write(v1, mode="overwrite")
    t.delete_keys(v1.filter(F.col("user_id") == 4).select("user_id"), "user_id")
    # re-insert key 4 WITH an added column (schema evolution + newer seq)
    v2 = spark.range(4, 5).select(
        F.col("id").alias("user_id"),
        F.lit("new4").alias("name"),
        F.lit("extra").alias("tag"),
    )
    t.write(v2, mode="append")

    planner = IcebergScanPlanner(spark, t.export_iceberg_metadata(codec="avro"))
    plan = planner.plan_scan()
    got = {
        (r["user_id"], r["name"]) for r in planner.execute(plan).collect()
    }
    assert (4, "new4") in got, "re-inserted evolved row dropped"
    assert (4, "old4") not in got, "deleted pre-evolution row leaked"
    assert len(got) == 10  # 10 originals - 1 deleted + 1 re-inserted


def test_seq_tag_name_avoids_user_column_collision(spark, tmp_path):
    # Round-9 ADVICE: execute() tags sequence groups with a helper
    # column; a table that legitimately owns a "__seq" data column must
    # not have it overwritten by the tag (and it must survive in the
    # output).
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.iceberg_planner import IcebergScanPlanner
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl_seqcol"))
    df = spark.range(8).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 100).alias("__seq"),  # user-owned column, real data
    )
    t.write(df, mode="overwrite")
    t.delete_keys(df.filter(F.col("user_id") == 2).select("user_id"), "user_id")
    t.write(
        spark.range(2, 3).select(
            F.col("id").alias("user_id"), F.lit(999).alias("__seq")
        ),
        mode="append",
    )

    planner = IcebergScanPlanner(spark, t.export_iceberg_metadata(codec="avro"))
    out = planner.execute(planner.plan_scan())
    assert "__seq" in out.columns, "user __seq column dropped by the tag"
    got = sorted((r["user_id"], r["__seq"]) for r in out.collect())
    native = sorted((r["user_id"], r["__seq"]) for r in t.read().collect())
    assert got == native
    assert (2, 999) in got and (2, 200) not in got
