"""Bucket-colocated joins: correctness vs a plain join, plan shape
(no full-table shuffle), and the validation contract."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.colocated import bucket_colocated_join
from deathmetal_datalake_spark.sources.snapshots import SnapshotTable
from deathmetal_datalake_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def pair(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t_ord = SnapshotTable(spark, os.path.join(str(tmp_path), "ord"))
    t_ord.set_partition_spec([("bucket[8]", "o_custkey")])
    t_ord.write(orders, "overwrite")
    t_cust = SnapshotTable(spark, os.path.join(str(tmp_path), "cust"))
    t_cust.set_partition_spec([("bucket[8]", "c_custkey")])
    t_cust.write(cust, "overwrite")
    return orders, cust, t_ord, t_cust


def test_inner_join_matches_plain_join(spark, pair):
    orders, cust, t_ord, t_cust = pair
    got = bucket_colocated_join(t_ord, t_cust, "o_custkey", "c_custkey")
    want = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_left_join_matches_plain_join(spark, pair):
    orders, cust, t_ord, t_cust = pair
    got = bucket_colocated_join(t_ord, t_cust, "o_custkey", "c_custkey", how="left")
    want = orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
    assert sorted(
        map(tuple, got.collect()), key=str
    ) == sorted(map(tuple, want.collect()), key=str)


def test_plan_has_no_full_table_shuffle(spark, pair):
    _, _, t_ord, t_cust = pair
    got = bucket_colocated_join(t_ord, t_cust, "o_custkey", "c_custkey")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # The whole point: per-bucket joins over the pre-bucketed layout,
    # never a cluster-wide hash exchange or full-table sort-merge.
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Join") >= 8  # one per bucket actually present


def test_validation_contract(spark, tmp_path, pair):
    orders, cust, t_ord, t_cust = pair
    # Different n on the two sides is refused.
    t_bad = SnapshotTable(spark, os.path.join(str(tmp_path), "bad"))
    t_bad.set_partition_spec([("bucket[4]", "c_custkey")])
    t_bad.write(cust, "overwrite")
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_colocated_join(t_ord, t_bad, "o_custkey", "c_custkey")
    # No bucket spec on the key is refused.
    t_plain = SnapshotTable(spark, os.path.join(str(tmp_path), "plain"))
    t_plain.write(cust, "overwrite")
    with pytest.raises(ValueError, match="no bucket"):
        bucket_colocated_join(t_ord, t_plain, "o_custkey", "c_custkey")
    # Pending deletes are refused with the fold hint...
    t_cust.delete_keys(cust.select("c_custkey").limit(3), "c_custkey")
    with pytest.raises(ValueError, match="fold_deletes"):
        bucket_colocated_join(t_ord, t_cust, "o_custkey", "c_custkey")
    # ...and folding makes it valid again, minus the deleted keys.
    t_cust.fold_deletes()
    got = bucket_colocated_join(t_ord, t_cust, "o_custkey", "c_custkey")
    gone = {r[0] for r in cust.select("c_custkey").limit(3).collect()}
    assert got.filter(F.col("c_custkey").isin(list(gone))).count() == 0


def test_pre_spec_dirs_refused_until_compacted(spark, tmp_path, pair):
    orders, cust, t_ord, _ = pair
    t = SnapshotTable(spark, os.path.join(str(tmp_path), "evolved"))
    t.write(cust.limit(40), "overwrite")  # pre-spec dir
    t.set_partition_spec([("bucket[8]", "c_custkey")])
    t.write(cust.subtract(cust.limit(40)), "append")
    with pytest.raises(ValueError, match="compact"):
        bucket_colocated_join(t_ord, t, "o_custkey", "c_custkey")
    t.compact()  # re-buckets the whole head under the current spec
    got = bucket_colocated_join(t_ord, t, "o_custkey", "c_custkey")
    want = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert got.count() == want.count()
