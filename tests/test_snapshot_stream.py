"""Snapshot table as a streaming source (``sources/snapshot_stream.py``):
manifest-log tailing via the Python Data Source API — exactly-once
restart from checkpoint, commit isolation (staged/orphan data is
invisible), anchored consumers, and the append-only contract."""

from __future__ import annotations

import os
import tempfile

import pytest

from deathmetal_datalake_spark.sources.snapshot_stream import register_snapshot_feed
from deathmetal_datalake_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def scratch():
    with tempfile.TemporaryDirectory(prefix="dml-feed-") as d:
        yield d


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v")


def _drain(spark, table, scratch, name, anchor=None):
    """availableNow run of the feed into a parquet sink; checkpoint is
    keyed by ``name`` so re-running the same name RESUMES."""
    register_snapshot_feed(spark)
    schema = table.read().schema
    reader = (
        spark.readStream.format("snapshot_feed")
        .schema(schema)
        .option("path", table.base_path)
    )
    if anchor is not None:
        reader = reader.option("anchor", str(anchor))
    out = os.path.join(scratch, f"{name}-out")
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, f"{name}-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_feed_delivers_committed_appends(spark, scratch):
    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 10), "append")
    tbl.write(_df(spark, 10, 25), "append")
    got = _drain(spark, tbl, scratch, "full")
    assert got.count() == 25
    assert got.selectExpr("min(k)", "max(k)").first() == (0, 24)


def test_restart_is_exactly_once(spark, scratch):
    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 20), "append")
    assert _drain(spark, tbl, scratch, "eo").count() == 20
    tbl.write(_df(spark, 20, 35), "append")
    tbl.write(_df(spark, 35, 40), "append")
    got = _drain(spark, tbl, scratch, "eo")  # same checkpoint: delta only
    assert got.count() == 40
    assert got.distinct().count() == 40  # no replays, no loss


def test_anchor_skips_already_seen(spark, scratch):
    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    s1 = tbl.write(_df(spark, 0, 10), "append")
    tbl.write(_df(spark, 10, 30), "append")
    got = _drain(spark, tbl, scratch, "anch", anchor=s1.snapshot_id)
    assert got.count() == 20
    assert got.selectExpr("min(k)").first()[0] == 10


def test_commit_isolation_uncommitted_data_invisible(spark, scratch):
    """Data dirs on disk but not referenced by a PUBLISHED snapshot
    (failed writes, open transactions) never reach the feed — the
    property a file-stream over data/*/ cannot give."""
    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 10), "append")
    # An in-flight/failed write: data landed, refs never moved.
    stray = os.path.join(tbl._data_dir, "snap-inflight00")
    _df(spark, 100, 200).write.parquet(stray)
    assert tbl.orphan_data_dirs() == [stray]
    got = _drain(spark, tbl, scratch, "iso")
    assert got.count() == 10
    assert got.selectExpr("max(k)").first()[0] == 9


def test_overwrite_after_offset_raises(spark, scratch):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 10), "append")
    assert _drain(spark, tbl, scratch, "ow").count() == 10
    tbl.write(_df(spark, 0, 5), "overwrite")
    with pytest.raises(StreamingQueryException, match="append-only|overwrite"):
        _drain(spark, tbl, scratch, "ow")


def test_admission_control_caps_steady_state_batches(spark, scratch):
    """max_snapshots_per_batch=2 while tailing a live producer: after
    the (uncapped) first batch, every micro-batch advances at most 2
    snapshots (≤20 rows here), the backlog drains across several
    batches, and delivery stays exactly-once."""
    import time

    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 10), "append")
    register_snapshot_feed(spark)
    out = os.path.join(scratch, "ac-out")
    q = (
        spark.readStream.format("snapshot_feed")
        .schema(tbl.read().schema)
        .option("path", tbl.base_path)
        .option("max_snapshots_per_batch", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "ac-ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # Wait for the first (uncapped) batch to establish position,
        # then land a 6-snapshot backlog for the capped steady state.
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 10:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        for i in range(1, 7):
            tbl.write(_df(spark, i * 10, (i + 1) * 10), "append")
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 70:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 70
    assert got.distinct().count() == 70  # exactly-once across capped batches
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    # 6 backlog snapshots / cap 2 → at least 3 batches after the first.
    assert len(data_batches) >= 4
    # Every batch after the first respects the cap (2 snapshots = 20 rows).
    assert all(p["numInputRows"] <= 20 for p in data_batches[1:])


def test_empty_branch_yields_nothing(spark, scratch):
    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    tbl.write(_df(spark, 0, 5), "append")
    # Tail a branch that has no snapshots: latestOffset stays at the
    # anchor, the run drains zero batches, the sink dir never appears.
    register_snapshot_feed(spark)
    schema = tbl.read().schema
    out = os.path.join(scratch, "nb-out")
    q = (
        spark.readStream.format("snapshot_feed")
        .schema(schema)
        .option("path", tbl.base_path)
        .option("branch", "nope")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "nb-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        n = spark.read.parquet(out).count()
    except Exception:
        n = 0  # sink never materialized — equally empty
    assert n == 0


def test_cdc_mode_streams_inserts_and_deletes(spark, scratch):
    """change_feed=true: delete snapshots become key events instead of
    killing the stream; insert events carry their committing snapshot."""
    from deathmetal_datalake_spark.sources.snapshot_stream import cdc_schema

    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    s1 = tbl.write(_df(spark, 0, 10), "append")
    tbl.write(_df(spark, 10, 20), "append")
    tbl.delete_keys(
        tbl.read().filter("k < 5").select("k"), "k"
    )
    register_snapshot_feed(spark)
    out = os.path.join(scratch, "cdc-out")
    q = (
        spark.readStream.format("snapshot_feed")
        .schema(cdc_schema(tbl.read().schema))
        .option("path", tbl.base_path)
        .option("change_feed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "cdc-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 25  # 20 inserts + 5 delete events
    ins = got.filter("_change_type = 'insert'")
    dels = got.filter("_change_type = 'delete'")
    assert ins.count() == 20
    assert dels.count() == 5
    assert dels.filter("v IS NOT NULL").count() == 0  # payload NULL
    assert {r[0] for r in dels.select("k").collect()} == {0, 1, 2, 3, 4}
    # Events are attributed to their committing snapshots.
    assert ins.filter(f"_commit_snapshot_id = {s1.snapshot_id}").count() == 10
    assert dels.select("_commit_snapshot_id").distinct().count() == 1
    # Restart with the same checkpoint: a fresh delete arrives alone.
    tbl.delete_keys(tbl.read().filter("k >= 18").select("k"), "k")
    q2 = (
        spark.readStream.format("snapshot_feed")
        .schema(cdc_schema(_df(spark, 0, 1).schema))
        .option("path", tbl.base_path)
        .option("change_feed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "cdc-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 27  # exactly the 2 new delete events arrived
    assert got2.filter("_change_type = 'delete'").count() == 7


def test_feed_tails_catalog_bound_table(spark, scratch):
    """A table whose refs live in a SnapshotCatalog's shared store is
    tailed via catalog+table options; rows published by a multi-table
    TRANSACTION reach the feed."""
    from deathmetal_datalake_spark.sources.transactions import SnapshotCatalog

    cat = SnapshotCatalog(spark, os.path.join(scratch, "cat"))
    with cat.transaction() as txn:
        txn.write("docs", _df(spark, 0, 10), mode="append")
        txn.write("embs", _df(spark, 100, 105), mode="append")
    with cat.transaction() as txn:
        txn.write("docs", _df(spark, 10, 30), mode="append")
    register_snapshot_feed(spark)
    tbl = cat.table("docs")
    out = os.path.join(scratch, "cb-out")
    q = (
        spark.readStream.format("snapshot_feed")
        .schema(tbl.read().schema)
        .option("path", tbl.base_path)
        .option("catalog", cat.base_path)
        .option("table", "docs")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "cb-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30  # both transactional commits, docs only
    assert got.selectExpr("max(k)").first()[0] == 29


def test_read_changes_pads_evolved_schema(spark, scratch):
    """Inserts from files written before a column existed surface it
    as NULL in the change feed (same union-schema rule as read())."""
    from pyspark.sql import functions as F

    tbl = SnapshotTable(spark, os.path.join(scratch, "t"))
    s1 = tbl.write(_df(spark, 0, 5), "append")
    tbl.write(_df(spark, 5, 8).withColumn("extra", F.lit("x")), "append")
    # Anchor BEFORE the evolved append; anchor schema lacks `extra`,
    # so the feed keeps the anchor's stable schema.
    ch = tbl.read_changes(since_snapshot_id=s1.snapshot_id)
    assert set(ch.columns) == {"_change_type", "_commit_snapshot_id", "k", "v"}
    assert ch.count() == 3
