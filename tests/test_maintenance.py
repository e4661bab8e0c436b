"""Compaction and schema-evolution maintenance operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from deathmetal_datalake_spark.flows.maintenance import (
    compact_table,
    read_with_schema_evolution,
    table_file_stats,
)
from deathmetal_datalake_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_compact_table_reduces_files(spark, tmp_path):
    path = str(tmp_path / "orders_frag")
    # fragment: 32 tiny part files
    load_table(spark, SF, "orders").repartition(32).write.parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, _ = table_file_stats(path)
    assert n_before >= 32
    n_after = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n_after < n_before
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    # value-preserving: same totals
    a = after.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    b = load_table(spark, SF, "orders").agg(F.sum("o_totalprice").alias("s")).first()["s"]
    assert abs(a - b) < 1e-6


def test_compact_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "orders_ok")
    load_table(spark, SF, "orders").coalesce(1).write.parquet(path)
    n = compact_table(spark, path)
    assert n == 1


def test_schema_evolution_merge(spark, tmp_path):
    path = str(tmp_path / "evolving")
    v1 = load_table(spark, SF, "nation")
    v1.write.parquet(path)
    v2 = v1.withColumn("n_comment", F.concat(F.lit("about "), F.col("n_name")))
    v2.write.mode("append").parquet(path)
    merged = read_with_schema_evolution(spark, path)
    assert "n_comment" in merged.columns
    assert merged.count() == 50
    # old rows surface the evolved column as NULL
    assert merged.filter(F.col("n_comment").isNull()).count() == 25


def test_orc_roundtrip_preserves_values(spark, tmp_path):
    """Second columnar format (S9 analog): ORC write/read round-trips
    the exact values and schema of a parquet-sourced table."""
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    dest = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    assert back.schema == orders.schema
    h = lambda df: df.agg(F.sum(F.xxhash64(*df.columns))).collect()[0][0]
    assert back.count() == orders.count() and h(back) == h(orders)
