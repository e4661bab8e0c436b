"""Rename/drop schema evolution via the field-id column registry.

Iceberg's mechanism (field ids in metadata, physical names per write
epoch, readers re-alias): rename is O(1) metadata with old dirs
re-aliased at read time; drop removes the id everywhere; re-adding a
dropped name mints a FRESH id so old values never resurrect. Guards:
partition-spec sources and outstanding delete-vector keys refuse
rename/drop. A table that never evolves has no registry and reads
byte-identically to before.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def table(spark, tmp_path):
    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, lo, hi, value_col="amount"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias(value_col)
    )


def test_rename_realiases_old_dirs_and_reads_new(table, spark):
    table.write(_df(spark, 0, 50), mode="overwrite")
    table.rename_column("amount", "amount_usd")
    table.write(_df(spark, 50, 80, "amount_usd"), mode="append")

    out = table.read()
    assert sorted(out.columns) == ["amount_usd", "k"]
    rows = {r.k: r.amount_usd for r in out.collect()}
    assert len(rows) == 80
    assert rows[7] == 70 and rows[60] == 600  # old + new dirs both aliased

    # Filters bind to the logical name across epochs.
    assert table.read(filters=[("amount_usd", ">=", 700)]).count() == 10


def test_rename_chain_and_swap_do_not_collide(table, spark):
    # a->b while a column literally named b exists in the old files:
    # the one-select re-alias must not collide mid-rename.
    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") + 100).alias("b")
    )
    table.write(df, mode="overwrite")
    table.rename_column("b", "c")
    table.rename_column("a", "b")
    out = table.read()
    assert sorted(out.columns) == ["b", "c"]
    r = {row.b: row.c for row in out.collect()}
    assert r[3] == 103  # b carries old a's values, c carries old b's


def test_drop_then_readd_gets_fresh_id_no_resurrection(table, spark):
    table.write(_df(spark, 0, 20), mode="overwrite")
    table.drop_column("amount")
    assert table.read().columns == ["k"]

    # Re-add the NAME via an append: fresh field id — old bytes stay
    # invisible, old rows surface NULL (Iceberg no-resurrection).
    table.write(_df(spark, 20, 30), mode="append")
    out = table.read()
    assert sorted(out.columns) == ["amount", "k"]
    vals = {r.k: r.amount for r in out.collect()}
    assert vals[5] is None  # pre-drop row did NOT resurrect its value
    assert vals[25] == 250


def test_time_travel_renders_current_schema(table, spark):
    s1 = table.write(_df(spark, 0, 10), mode="overwrite")
    table.rename_column("amount", "amt")
    old = table.read(snapshot_id=s1.snapshot_id)
    # Chosen semantics (documented): reads render under the CURRENT
    # logical schema regardless of snapshot — same data, new name.
    assert sorted(old.columns) == ["amt", "k"]
    assert old.count() == 10


def test_guards_spec_source_and_delete_keys(table, spark):
    table.set_partition_spec([("bucket[2]", "k")])
    table.write(_df(spark, 0, 30), mode="overwrite")
    with pytest.raises(ValueError, match="partition-spec source"):
        table.rename_column("k", "key")

    table.delete_keys(_df(spark, 0, 2).select("amount"), "amount")
    with pytest.raises(ValueError, match="outstanding delete vectors"):
        table.rename_column("amount", "amount_usd")
    table.fold_deletes()
    table.rename_column("amount", "amount_usd")  # folds cleared the guard
    assert sorted(table.read().columns) == ["amount_usd", "k"]


def test_maintenance_rewrites_under_current_names(table, spark):
    table.write(_df(spark, 0, 40), mode="overwrite")
    table.rename_column("amount", "amt")
    table.write(_df(spark, 40, 60, "amt"), mode="append")
    table.compact(target_files=2)
    out = table.read()
    assert sorted(out.columns) == ["amt", "k"]
    assert out.count() == 60
    # Post-compaction stats are keyed under the CURRENT name again, so
    # manifest pruning works for the renamed column.
    assert table.read(filters=[("amt", ">=", 590)]).count() == 1


def test_no_registry_means_legacy_behavior(table, spark):
    table.write(_df(spark, 0, 10), mode="overwrite")
    assert table.current_columns() is None  # no registry until evolution
    assert sorted(table.read().columns) == ["amount", "k"]


def test_incremental_feeds_rename_aware(table, spark):
    # read_appends / read_changes must render the CURRENT logical names
    # even when the delta spans a rename epoch.
    s1 = table.write(_df(spark, 0, 10), mode="overwrite")
    table.write(_df(spark, 10, 20), mode="append")
    table.rename_column("amount", "amt")
    table.write(_df(spark, 20, 30, "amt"), mode="append")

    inc = table.read_appends(s1.snapshot_id)
    assert sorted(inc.columns) == ["amt", "k"]
    vals = {r.k: r.amt for r in inc.collect()}
    assert len(vals) == 20  # both post-anchor appends, none of the base
    assert vals[15] == 150 and vals[25] == 250  # pre- and post-rename dirs

    changes = table.read_changes(s1.snapshot_id)
    assert "amt" in changes.columns and "amount" not in changes.columns
    assert changes.filter(changes._change_type == "insert").count() == 20


def test_stats_pruning_survives_rename(table, spark):
    # Two well-separated value ranges in separate dirs, then a rename:
    # a filter on the NEW name must still PRUNE the pre-rename dir
    # (its stats are keyed under the old physical name — the per-epoch
    # filter remap makes them addressable again).
    table.write(_df(spark, 0, 50), mode="overwrite")        # amount 0..490
    table.rename_column("amount", "amt")
    table.write(_df(spark, 1000, 1050, "amt"), mode="append")  # amt 10000..

    kept, pruned = table.scan_files(filters=[("amt", ">=", 9000)])
    assert kept and pruned  # old dir pruned, new dir kept
    assert all("snap-" in p for p in kept)
    # And the pruned read is still exactly correct.
    assert table.read(filters=[("amt", ">=", 9000)]).count() == 50
    # The reverse filter prunes the post-rename dir instead.
    kept2, pruned2 = table.scan_files(filters=[("amt", "<=", 400)])
    assert kept2 and pruned2
    assert set(kept2).isdisjoint(kept)


def test_widen_int_to_long_across_epochs(table, spark):
    # v1 dir written as INT; widen; v2 dir appends LONG values beyond
    # the int range. A single mergeSchema read would refuse to merge
    # int with bigint — the epoch-group cast is what unifies them.
    table.write(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 10).cast("int").alias("qty")
        ),
        mode="overwrite",
    )
    table.widen_column("qty", "long")
    table.write(
        spark.range(10, 13).select(
            F.col("id").alias("k"),
            (F.col("id") + 4_000_000_000).cast("long").alias("qty"),
        ),
        mode="append",
    )
    out = table.read()
    assert dict(out.dtypes)["qty"] == "bigint"
    vals = {r.k: r.qty for r in out.collect()}
    assert vals[3] == 30 and vals[12] == 4_000_000_012  # beyond int range
    assert len(vals) == 13


def test_widen_guards(table, spark):
    table.write(
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("score")
        ),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="cannot widen"):
        table.widen_column("k", "double")  # long -> double: not a promotion
    with pytest.raises(ValueError, match="unsupported target"):
        table.widen_column("score", "int")
    table.widen_column("score", "double")  # no-op widen of an already-wide col
    assert dict(table.read().dtypes)["score"] == "double"


def test_widen_composes_with_rename(table, spark):
    table.write(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("qty")
        ),
        mode="overwrite",
    )
    table.widen_column("qty", "long")
    table.rename_column("qty", "quantity")
    out = table.read()
    assert dict(out.dtypes)["quantity"] == "bigint"
    assert {r.k: r.quantity for r in out.collect()}[4] == 8


def test_widen_decimal_precision(table, spark):
    table.write(
        spark.range(5).select(
            F.col("id").alias("k"),
            (F.col("id") * 100).cast("decimal(10,2)").alias("amount"),
        ),
        mode="overwrite",
    )
    table.widen_column("amount", "decimal(20,2)")
    table.write(
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            (F.col("id") * F.lit(10) ** 15).cast("decimal(20,2)").alias("amount"),
        ),
        mode="append",
    )
    out = table.read()
    assert dict(out.dtypes)["amount"] == "decimal(20,2)"
    vals = {r.k: r.amount for r in out.collect()}
    assert len(vals) == 8 and int(vals[6]) == 6 * 10**15
    with pytest.raises(ValueError, match="cannot widen"):
        table.widen_column("amount", "decimal(12,2)")  # narrowing refused
    with pytest.raises(ValueError, match="cannot widen"):
        table.widen_column("amount", "decimal(22,4)")  # scale change refused


def test_second_widen_over_mixed_width_dirs(table, spark):
    # Regression: widen q, append wide, then widen ANOTHER column —
    # the schema probe must not merge int with bigint across epochs
    # (footer walk, newest dir wins), and the final read unifies all.
    table.write(
        spark.range(5).select(
            F.col("id").alias("k"),
            F.col("id").cast("int").alias("q"),
            F.col("id").cast("int").alias("r"),
        ),
        mode="overwrite",
    )
    table.widen_column("q", "long")
    table.write(
        spark.range(5, 8).select(
            F.col("id").alias("k"),
            F.col("id").cast("long").alias("q"),
            F.col("id").cast("int").alias("r"),
        ),
        mode="append",
    )
    table.widen_column("r", "long")  # over mixed-width dirs
    out = table.read()
    assert dict(out.dtypes) == {"k": "bigint", "q": "bigint", "r": "bigint"}
    assert out.count() == 8


def test_fold_deletes_and_pruned_empty_read_across_widen(table, spark):
    # fold_deletes' per-cover-group read and read()'s all-pruned empty
    # path both cross widen epochs — neither may hit the int/bigint
    # merge refusal, and results must stay exact.
    table.write(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 10).cast("int").alias("qty")
        ),
        mode="overwrite",
    )
    table.widen_column("qty", "long")
    table.write(
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") * 10).cast("long").alias("qty")
        ),
        mode="append",
    )
    table.delete_keys(
        spark.range(2).select(F.col("id").alias("k")), "k"
    )
    folded = table.fold_deletes()
    assert folded is not None and not folded.deletes
    out = table.read()
    assert dict(out.dtypes)["qty"] == "bigint"
    assert out.count() == 28
    # All-pruned path: an impossible filter leaves zero dirs.
    empty = table.read(filters=[("qty", ">", 10_000_000)])
    assert empty.count() == 0 and dict(empty.dtypes)["qty"] == "bigint"
