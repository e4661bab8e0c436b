"""Manifest-level column statistics + planning-time file skipping
(``sources/snapshots.py``): the Iceberg manifest-entry analog. Stats
are harvested from parquet FOOTERS at commit (no data scan) and
``read(filters=...)`` skips whole data dirs before Spark lists a file —
then re-applies the exact predicate, so pruning can only reduce I/O,
never change results."""

from __future__ import annotations

import datetime
import json
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from deathmetal_datalake_spark.sources.snapshots import (
    SnapshotTable,
    _dir_may_match,
)
from deathmetal_datalake_spark.sources.tables import load_table
from deathmetal_datalake_spark.sources.transactions import SnapshotCatalog

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def table(spark):
    with tempfile.TemporaryDirectory(prefix="dml-stats-") as d:
        yield SnapshotTable(spark, os.path.join(d, "orders_tbl"))


@pytest.fixture()
def orders(spark):
    return load_table(spark, SF, "orders")


def _yearly_appends(table, orders):
    """One append per order year — the clustered-arrival layout (daily
    ingest batches) that makes manifest pruning effective."""
    years = sorted(
        r[0] for r in orders.select(F.year("o_orderdate")).distinct().collect()
    )
    for y in years:
        table.write(
            orders.filter(F.year("o_orderdate") == y),
            mode="append" if table.current_snapshot_id() else "overwrite",
        )
    return years


def test_write_records_footer_stats(table, orders):
    table.write(orders, mode="overwrite")
    snap = table.history()[-1]
    assert len(snap.dir_stats) == 1
    (stats,) = snap.dir_stats.values()
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    assert stats["o_orderkey"]["min"] == lo
    assert stats["o_orderkey"]["max"] == hi
    assert stats["o_orderkey"]["nulls"] == 0
    assert stats["o_orderkey"]["rows"] == orders.count()
    # Dates are stored as ISO strings (lexicographic == chronological).
    dlo = orders.agg(F.min("o_orderdate")).first()[0]
    assert stats["o_orderdate"]["min"] == dlo.isoformat()
    # Stats survive the JSON manifest round-trip.
    reloaded = table._load_snapshot(snap.snapshot_id)
    assert reloaded.dir_stats == snap.dir_stats


def test_date_filter_prunes_dirs_and_matches_plain_filter(table, orders):
    years = _yearly_appends(table, orders)
    cutoff = datetime.date(years[-2], 1, 1)  # keep the last two years
    filters = [("o_orderdate", ">=", cutoff)]
    kept, pruned = table.scan_dirs(filters)
    assert len(kept) == 2
    assert len(pruned) == len(years) - 2
    got = table.read(filters=filters)
    want = table.read().filter(F.col("o_orderdate") >= F.lit(cutoff))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_equality_and_in_and_range_ops(table, orders):
    years = _yearly_appends(table, orders)
    y = years[1]
    # '=' on the year boundary keeps exactly one dir.
    kept, _ = table.scan_dirs([("o_orderdate", "=", datetime.date(y, 6, 1))])
    assert len(kept) == 1
    # 'in' keeps the dirs whose ranges cover any listed value.
    kept, _ = table.scan_dirs(
        [
            (
                "o_orderdate",
                "in",
                [datetime.date(years[0], 3, 3), datetime.date(years[-1], 3, 3)],
            )
        ]
    )
    assert len(kept) == 2
    # '<' strictly before the first year's start keeps nothing, and the
    # empty-scan read still has the right schema and the filter applied.
    none = table.read(
        filters=[("o_orderdate", "<", datetime.date(years[0], 1, 1))]
    )
    assert none.count() == 0
    assert none.columns == table.read().columns


def test_numeric_and_string_pruning(table, orders):
    # Two disjoint key ranges; a key predicate keeps one dir.
    mid = orders.approxQuantile("o_orderkey", [0.5], 0.0)[0]
    table.write(orders.filter(F.col("o_orderkey") <= mid), "overwrite")
    table.write(orders.filter(F.col("o_orderkey") > mid), "append")
    kept, pruned = table.scan_dirs([("o_orderkey", "<=", int(mid))])
    assert len(kept) == 1 and len(pruned) == 1
    # String bounds: priorities are '1-URGENT'..'5-LOW'; a dir holding
    # only '1-*' is provably free of '5-LOW'.
    table.write(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"), "overwrite"
    )
    table.write(
        orders.filter(F.col("o_orderpriority") == "5-LOW"), "append"
    )
    kept, pruned = table.scan_dirs([("o_orderpriority", "=", "5-LOW")])
    assert len(kept) == 1 and len(pruned) == 1
    got = table.read(filters=[("o_orderpriority", "=", "5-LOW")]).count()
    assert got == orders.filter(F.col("o_orderpriority") == "5-LOW").count()


def test_all_null_and_absent_columns(spark, table):
    # Dir 1: col x present and non-null. Dir 2: x all NULL.
    # Dir 3 (schema evolution): x ABSENT entirely = all NULL too.
    d1 = spark.range(0, 5).withColumn("x", F.col("id") + 100)
    d2 = spark.range(5, 10).withColumn("x", F.lit(None).cast("long"))
    d3 = spark.range(10, 15)
    table.write(d1, "overwrite")
    table.write(d2, "append")
    table.write(d3, "append")
    # Comparison predicates prune both NULL-only dirs.
    kept, pruned = table.scan_dirs([("x", ">=", 0)])
    assert len(kept) == 1 and len(pruned) == 2
    assert table.read(filters=[("x", ">=", 0)]).count() == 5
    # is_null keeps only dirs that can hold NULLs; not_null the inverse.
    kept, _ = table.scan_dirs([("x", "is_null", None)])
    assert len(kept) == 2
    assert table.read(filters=[("x", "is_null", None)]).count() == 10
    kept, _ = table.scan_dirs([("x", "not_null", None)])
    assert len(kept) == 1
    assert table.read(filters=[("x", "not_null", None)]).count() == 5


def test_not_equal_prunes_only_constant_dirs(table, orders):
    table.write(orders.filter(F.col("o_orderstatus") == "F"), "overwrite")
    table.write(orders.filter(F.col("o_orderstatus") != "F"), "append")
    kept, pruned = table.scan_dirs([("o_orderstatus", "!=", "F")])
    assert len(kept) == 1 and len(pruned) == 1  # min==max=='F' dir goes
    got = table.read(filters=[("o_orderstatus", "!=", "F")]).count()
    assert got == orders.filter(F.col("o_orderstatus") != "F").count()


def test_filters_compose_with_row_level_deletes(table, orders):
    years = _yearly_appends(table, orders)
    victims = orders.filter(F.year("o_orderdate") == years[-1]).limit(7)
    n_victims_kept = victims.count()
    table.delete_keys(victims.select("o_orderkey"), "o_orderkey")
    cutoff = datetime.date(years[-1], 1, 1)
    got = table.read(filters=[("o_orderdate", ">=", cutoff)])
    want = (
        orders.filter(F.col("o_orderdate") >= F.lit(cutoff))
        .join(victims.select("o_orderkey"), "o_orderkey", "left_anti")
    )
    assert got.count() == want.count()
    # And pruning still happened underneath the anti-join.
    kept, pruned = table.scan_dirs([("o_orderdate", ">=", cutoff)])
    assert len(kept) == 1 and len(pruned) == len(years) - 1
    assert n_victims_kept == 7


def test_pre_stats_manifests_read_unpruned(table, orders):
    """A manifest written before this feature (no dir_stats key) keeps
    reading — filters just skip nothing."""
    _yearly_appends(table, orders)
    head = table.current_snapshot_id()
    path = table._snap_path(head)
    with open(path) as f:
        d = json.load(f)
    d.pop("dir_stats")
    d.pop("file_stats")
    with open(path, "w") as f:
        json.dump(d, f)
    cutoff = orders.agg(F.max("o_orderdate")).first()[0]
    kept, pruned = table.scan_dirs([("o_orderdate", ">=", cutoff)])
    assert pruned == []  # nothing provable without stats
    got = table.read(filters=[("o_orderdate", ">=", cutoff)]).count()
    assert got == orders.filter(F.col("o_orderdate") >= F.lit(cutoff)).count()


def test_unknown_or_mistyped_predicates_never_prune():
    stats = {"x": {"min": 1, "max": 5, "nulls": 0, "rows": 10}}
    # Type-mismatched literal: unknown, keep.
    assert _dir_may_match(stats, [("x", "=", "banana")])
    # Unknown column: keep.
    assert _dir_may_match(stats, [("y", "=", 99)])
    # bool literal against int stats: keep (bool is not numeric here).
    assert _dir_may_match(stats, [("x", "=", True)])
    # In-range value: keep; out-of-range: prune.
    assert _dir_may_match(stats, [("x", "=", 3)])
    assert not _dir_may_match(stats, [("x", "=", 7)])
    # AND semantics: one provably-false conjunct prunes the dir.
    assert not _dir_may_match(stats, [("y", "=", 9), ("x", ">", 5)])


def test_sorted_compaction_enables_pruning_on_sort_key(table, orders):
    """compact(sort_by=...) range-partitions the rewrite, so the NEW
    dir-level stats... are one dir — but per-FILE row groups cluster.
    The manifest path proves the rewrite keeps stats fresh."""
    _yearly_appends(table, orders)
    snap = table.compact(sort_by=["o_orderdate"])
    assert len(snap.data_dirs) == 1
    (stats,) = [snap.dir_stats[d] for d in snap.data_dirs]
    assert "o_orderdate" in stats and stats["o_orderdate"]["min"] is not None
    # Equality of the pruned read still holds post-compaction.
    cutoff = orders.agg(F.max("o_orderdate")).first()[0]
    got = table.read(filters=[("o_orderdate", "=", cutoff)]).count()
    assert got == orders.filter(F.col("o_orderdate") == F.lit(cutoff)).count()


def test_transactional_writes_carry_stats(spark, orders):
    with tempfile.TemporaryDirectory(prefix="dml-statcat-") as d:
        cat = SnapshotCatalog(spark, os.path.join(d, "cat"))
        with cat.transaction() as txn:
            txn.write("lo", orders.filter(F.col("o_orderkey") <= 100), "overwrite")
            txn.write("hi", orders.filter(F.col("o_orderkey") > 100), "overwrite")
        lo = cat.table("lo")
        kept, pruned = lo.scan_dirs([("o_orderkey", ">", 100)])
        assert kept == [] and len(pruned) == 1
        assert lo.read(filters=[("o_orderkey", "<=", 100)]).count() == (
            orders.filter(F.col("o_orderkey") <= 100).count()
        )


def test_file_level_pruning_survives_compaction(table, orders):
    """After compact(sort_by=[date]) the table is ONE dir — dir-level
    stats can't skip anything. The per-FILE manifest stats still can,
    because the sorted rewrite gives each file a narrow date range."""
    _yearly_appends(table, orders)
    table.compact(target_files=8, sort_by=["o_orderdate"])
    cutoff = orders.selectExpr(
        "date_add(max(o_orderdate), -120)"
    ).first()[0]
    filters = [("o_orderdate", ">=", cutoff)]
    kept_dirs, pruned_dirs = table.scan_dirs(filters)
    assert len(kept_dirs) == 1 and pruned_dirs == []  # dir level: nothing
    kept_f, pruned_f = table.scan_files(filters)
    assert len(kept_f) + len(pruned_f) == 8
    assert len(pruned_f) >= 5  # ~2% of the date range ≥ 6 of 8 files skip
    got = table.read(filters=filters)
    want = table.read().filter(F.col("o_orderdate") >= F.lit(cutoff))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_zorder_compaction_prunes_on_both_dimensions(table, orders):
    """Z-ordered rewrite: files cover narrow hyper-rectangles in BOTH
    dimensions, so file skipping works for predicates on either —
    which a lexicographic sort only gives its leading column."""
    _yearly_appends(table, orders)
    table.compact(target_files=16, zorder_by=["o_orderdate", "o_totalprice"])
    date_med = orders.selectExpr(
        "cast(to_date(to_timestamp(percentile(cast(cast(o_orderdate as timestamp) as double), 0.55))) as date)"
    ).first()[0]
    price_med = orders.approxQuantile("o_totalprice", [0.55], 0.0)[0]
    for filters in (
        [("o_orderdate", ">=", date_med)],
        [("o_totalprice", ">=", price_med)],
    ):
        kept_f, pruned_f = table.scan_files(filters)
        assert len(kept_f) + len(pruned_f) == 16
        assert len(pruned_f) >= 3, filters
        assert len(kept_f) >= 1, filters
        got = table.read(filters=filters)
        want = table.read().filter(_as_col(filters[0]))
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0


def _as_col(f):
    col, op, val = f
    assert op == ">="
    return F.col(col) >= F.lit(val)


def test_zorder_rejects_string_columns(table, orders):
    table.write(orders, "overwrite")
    with pytest.raises(ValueError, match="unsupported type"):
        table.compact(zorder_by=["o_orderpriority"])
    with pytest.raises(ValueError, match="exclusive"):
        table.compact(sort_by=["o_orderkey"], zorder_by=["o_orderkey"])


def test_metadata_only_aggregates(table, orders, spark):
    """COUNT(*)/MIN/MAX answered from the manifest with zero data I/O —
    the Iceberg/Delta metadata-only-aggregate shortcut."""
    _yearly_appends(table, orders)
    assert table.metadata_count() == orders.count()
    lo, hi = table.metadata_min_max("o_orderkey")
    want_lo, want_hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    assert (lo, hi) == (want_lo, want_hi)
    dlo, dhi = table.metadata_min_max("o_orderdate")
    wd = orders.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    assert (dlo, dhi) == (wd[0], wd[1])  # decoded back to date objects
    # String columns refuse (parquet bounds may be truncated).
    assert table.metadata_min_max("o_orderpriority") is None
    # Pending deletes make both unknowable — scan required.
    table.delete_keys(orders.limit(3).select("o_orderkey"), "o_orderkey")
    assert table.metadata_count() is None
    assert table.metadata_min_max("o_orderkey") is None
    # Compaction applies deletes physically; metadata answers return.
    table.compact()
    assert table.metadata_count() == orders.count() - 3


def test_date_predicate_at_midnight_timestamp_stat_not_pruned(spark, tmp_path):
    # Regression (found by the partition-pruning property test): a
    # TIMESTAMP column whose dir-min sits exactly at midnight must NOT
    # be pruned by a `<= date` predicate for that same day — date
    # bounds/values are normalized to the midnight-timestamp form so
    # the lexicographic compare matches Spark's own date→timestamp
    # cast semantics.
    import datetime as dt
    import os

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    df = spark.createDataFrame(
        [(1, dt.datetime(1999, 3, 3, 0, 0, 0)), (2, dt.datetime(1999, 3, 10, 5, 0))],
        "k long, ts timestamp",
    )
    t = SnapshotTable(spark, os.path.join(str(tmp_path), "mid"))
    t.write(df, "overwrite")
    filters = [("ts", "<=", dt.date(1999, 3, 3))]
    kept, pruned = t.scan_dirs(filters)
    assert pruned == []  # the dir holds a satisfying row (k=1)
    assert [r.k for r in t.read(filters=filters).collect()] == [1]
