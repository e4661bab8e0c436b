"""two_phase_order / ntile_from_rank parity vs the single-partition
global window they replace (round-9 verdict item #1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.ordering import (
    ntile_from_rank,
    two_phase_order,
)


def _frame(spark, n=997):
    # Deliberately skewed + tie-heavy key (k has ~10 distinct values),
    # unique tie-break on id; values exercise the running sum.
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("k"),
        ((F.col("id") * 37) % 101).alias("v"),
    )


@pytest.mark.parametrize("parts", [1, 3, 8, 64])
def test_rank_and_cumsum_match_global_window(spark, parts):
    df = _frame(spark)
    order = [F.desc("k"), F.asc("id")]
    got = two_phase_order(
        df, order, rank_col="r", cumsum=("v", "cv"), num_partitions=parts
    )
    w = Window.orderBy(*order)
    want = df.withColumn("r", F.row_number().over(w)).withColumn(
        "cv", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    lhs = {(x["id"], x["r"], x["cv"]) for x in got.collect()}
    rhs = {(x["id"], x["r"], x["cv"]) for x in want.collect()}
    assert lhs == rhs


def test_n_total_col_and_no_helper_columns_leak(spark):
    df = _frame(spark, 100)
    got = two_phase_order(
        df, [F.asc("id")], rank_col="r", n_total_col="n", num_partitions=7
    )
    rows = got.collect()
    assert {r["n"] for r in rows} == {100}
    assert not [c for c in got.columns if c.startswith("__bounded")]


def test_user_column_named_like_marker_survives(spark):
    df = _frame(spark, 50).withColumn("__bounded_pid", F.col("id") * 2)
    got = two_phase_order(df, [F.asc("id")], rank_col="r", num_partitions=4)
    rows = got.collect()
    assert all(r["__bounded_pid"] == 2 * r["id"] for r in rows)


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 5), (101, 7)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"), ((F.col("id") * 13) % 29).alias("s"))
    order = [F.desc("s"), F.asc("id")]
    ranked = two_phase_order(
        df, order, rank_col="r", n_total_col="nn", num_partitions=4
    ).withColumn("bucket", ntile_from_rank(F.col("r"), F.col("nn"), k))
    w = Window.orderBy(*order)
    want = df.withColumn("bucket", F.ntile(k).over(w))
    lhs = {(x["id"], x["bucket"]) for x in ranked.collect()}
    rhs = {(x["id"], x["bucket"]) for x in want.collect()}
    assert lhs == rhs


def test_plan_has_no_empty_partition_window_over_data(spark):
    # The helper's ONLY global window is over the per-partition totals
    # frame, ordered by the __bounded marker column — the shape the
    # plan gate whitelists. Every data-proportional window must be
    # partitioned.
    df = _frame(spark, 500)
    got = two_phase_order(df, [F.asc("id")], rank_col="r", num_partitions=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    from tests.test_plan_quality import _empty_partition_windows

    offenders = _empty_partition_windows(plan)
    assert offenders == [] or all("__bounded" in o for o in offenders)
