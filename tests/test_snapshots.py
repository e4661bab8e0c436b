"""Snapshot/branch table format: Iceberg+Nessie-analog semantics
(``sources/snapshots.py``) — versioned writes, time travel, branches,
rollback, write-audit-publish, orphan detection."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from deathmetal_datalake_spark.sources.snapshots import SnapshotTable
from deathmetal_datalake_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def table(spark):
    with tempfile.TemporaryDirectory(prefix="dml-snap-") as d:
        yield SnapshotTable(spark, os.path.join(d, "orders_tbl"))


@pytest.fixture()
def orders(spark):
    return load_table(spark, SF, "orders")


def test_overwrite_append_and_time_travel(table, orders):
    part1 = orders.filter(F.col("o_orderstatus") == "F")
    part2 = orders.filter(F.col("o_orderstatus") != "F")
    s1 = table.write(part1, mode="overwrite")
    s2 = table.write(part2, mode="append")
    assert s2.parent_id == s1.snapshot_id
    # Head = union of both writes; snapshot 1 = first write only.
    assert table.read().count() == orders.count()
    assert table.read(snapshot_id=s1.snapshot_id).count() == part1.count()
    # Overwrite resets the file set; history keeps all three versions.
    s3 = table.write(part2, mode="overwrite")
    assert table.read().count() == part2.count()
    assert [s.snapshot_id for s in table.history()] == [
        s1.snapshot_id,
        s2.snapshot_id,
        s3.snapshot_id,
    ]
    # Every historical version remains readable after the overwrite.
    assert table.read(snapshot_id=s2.snapshot_id).count() == orders.count()


def test_as_of_timestamp_read(table, orders):
    s1 = table.write(orders.limit(10), mode="overwrite")
    s2 = table.write(orders.limit(5), mode="append")
    at_s1 = table.read(as_of=s1.committed_at)
    assert at_s1.count() == 10
    at_s2 = table.read(as_of=s2.committed_at + 1)
    assert at_s2.count() == 15
    with pytest.raises(LookupError):
        table.read(as_of=s1.committed_at - 1)


def test_branch_isolation_and_publish(table, orders):
    table.write(orders.filter(F.col("o_orderstatus") == "F"), mode="overwrite")
    main_count = table.read().count()
    # Audit on a staging branch: main must not see the staged append.
    table.create_branch("audit")
    table.write(
        orders.filter(F.col("o_orderstatus") == "O"), mode="append", branch="audit"
    )
    assert table.read().count() == main_count
    assert table.read(branch="audit").count() > main_count
    # Publish = O(1) fast-forward of main onto the audited branch.
    table.fast_forward("main", "audit")
    assert table.read().count() == table.read(branch="audit").count()
    table.drop_branch("audit")
    assert "audit" not in table.branches()


def test_rollback_is_metadata_only(table, orders):
    s1 = table.write(orders.limit(10), mode="overwrite")
    table.write(orders.limit(20), mode="overwrite")
    table.rollback("main", s1.snapshot_id)
    assert table.read().count() == 10
    # Rolling back to a snapshot outside the lineage is refused.
    with pytest.raises(LookupError):
        table.rollback("main", 999)


def test_schema_and_values_roundtrip(table, orders):
    table.write(orders, mode="overwrite")
    got = table.read()
    assert got.schema == orders.schema
    assert (
        got.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_orphan_detection(table, orders, spark):
    table.write(orders.limit(5), mode="overwrite")
    # Simulate a failed write: a data dir with no manifest pointing at it.
    stray = os.path.join(table.base_path, "data", "snap-99-deadbeef")
    orders.limit(1).write.parquet(stray)
    orphans = table.orphan_data_dirs()
    assert orphans == [stray]


def test_branch_guards(table, orders):
    with pytest.raises(LookupError):
        table.create_branch("b", from_branch="main")  # no snapshots yet
    table.write(orders.limit(1), mode="overwrite")
    table.create_branch("b")
    with pytest.raises(ValueError):
        table.create_branch("b")
    with pytest.raises(ValueError):
        table.drop_branch("main")


def test_compaction_preserves_rows_and_history(table, orders):
    import glob

    for i in range(4):  # append-heavy history -> many small files
        table.write(orders.limit(25), mode="overwrite" if i == 0 else "append")
    before = table.read().count()
    head_before = table.current_snapshot_id()
    snap = table.compact(target_files=2)
    assert table.read().count() == before
    # compacted head has exactly the target file layout
    files = [
        f
        for d in snap.data_dirs
        for f in glob.glob(os.path.join(d, "part-*.parquet"))
    ]
    assert len(files) == 2
    # the pre-compaction version is still reconstructable
    assert table.read(snapshot_id=head_before).count() == before
    assert len(table.history()) == 5


def test_optimistic_commit_conflict(table, orders):
    from deathmetal_datalake_spark.sources.snapshots import CommitConflict

    s1 = table.write(orders.limit(10), mode="overwrite")
    # writer B commits on top of s1 first
    table.write(orders.limit(5), mode="append", expected_parent=s1.snapshot_id)
    # writer A, also based on s1, must now be refused
    with pytest.raises(CommitConflict):
        table.write(orders.limit(3), mode="append", expected_parent=s1.snapshot_id)
