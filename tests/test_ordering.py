"""two_phase_order / ntile_from_rank parity vs the single-partition
global window they replace (round-9 verdict item #1).

The 10× lesson baked into these tests: the bucket must be a pure
function of row VALUES (literal boundaries), never of physical
partition ids — a spark_partition_id() formulation diverged between
the offsets branch and the main branch once inputs were big enough
that AQE stopped coalescing to one partition. Parity is therefore
asserted at several forced bucket counts, including many more buckets
than rows."""

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
        df, order, F.col("k"), key_desc=True,
        rank_col="r", cumsum=("v", "cv"), num_partitions=parts,
    )
    w = Window.orderBy(*order)
    want = df.withColumn("r", F.row_number().over(w)).withColumn(
        "cv", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    lhs = {(x["id"], x["r"], x["cv"]) for x in got.collect()}
    rhs = {(x["id"], x["r"], x["cv"]) for x in want.collect()}
    assert lhs == rhs


@pytest.mark.parametrize("parts", [4, 32])
def test_rank_matches_on_unique_ascending_key(spark, parts):
    df = _frame(spark, 500)
    got = two_phase_order(
        df, [F.asc("id")], F.col("id"), rank_col="r", num_partitions=parts
    )
    rows = got.collect()
    assert {(x["id"], x["r"]) for x in rows} == {(i, i + 1) for i in range(500)}


def test_parity_survives_branch_reevaluation_of_an_aggregate_input(spark):
    # Regression shape for the 10× divergence: the input is itself an
    # AGGREGATE (each branch re-plans and re-prunes it); with
    # value-derived buckets the offsets and main branches must still
    # agree exactly.
    df = (
        _frame(spark, 2000)
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c"))
    )
    order = [F.desc("sv"), F.asc("k")]
    got = two_phase_order(
        df, order, F.col("sv"), key_desc=True, rank_col="r", num_partitions=8
    )
    w = Window.orderBy(*order)
    want = df.withColumn("r", F.row_number().over(w))
    assert {(x["k"], x["r"]) for x in got.collect()} == {
        (x["k"], x["r"]) for x in want.collect()
    }


def test_n_total_col_and_no_helper_columns_leak(spark):
    df = _frame(spark, 100)
    got = two_phase_order(
        df, [F.asc("id")], F.col("id"),
        rank_col="r", n_total_col="n", num_partitions=7,
    )
    rows = got.collect()
    assert {r["n"] for r in rows} == {100}
    assert not [c for c in got.columns if c.startswith("__bounded")]


def test_user_column_named_like_marker_survives(spark):
    df = _frame(spark, 50).withColumn("__bounded_bkt", F.col("id") * 2)
    got = two_phase_order(
        df, [F.asc("id")], F.col("id"), rank_col="r", num_partitions=4
    )
    rows = got.collect()
    assert all(r["__bounded_bkt"] == 2 * r["id"] for r in rows)


def test_null_keys_sort_like_the_global_window(spark):
    df = _frame(spark, 60).withColumn(
        "nk", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("v"))
    )
    for desc in (False, True):
        order = [F.desc("nk") if desc else F.asc("nk"), F.asc("id")]
        got = two_phase_order(
            df, order, F.col("nk"), key_desc=desc, rank_col="r", num_partitions=5
        )
        want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
        assert {(x["id"], x["r"]) for x in got.collect()} == {
            (x["id"], x["r"]) for x in want.collect()
        }


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (23, 5), (100, 5), (101, 7)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id"), ((F.col("id") * 13) % 29).alias("s"))
    order = [F.desc("s"), F.asc("id")]
    ranked = two_phase_order(
        df, order, F.col("s"), key_desc=True,
        rank_col="r", n_total_col="nn", num_partitions=4,
    ).withColumn("bucket", ntile_from_rank(F.col("r"), F.col("nn"), k))
    w = Window.orderBy(*order)
    want = df.withColumn("bucket", F.ntile(k).over(w))
    lhs = {(x["id"], x["bucket"]) for x in ranked.collect()}
    rhs = {(x["id"], x["bucket"]) for x in want.collect()}
    assert lhs == rhs


def test_plan_has_no_empty_partition_window_over_data(spark):
    # The helper's ONLY global window is over the per-bucket totals
    # frame, ordered by the __bounded marker column — the shape the
    # plan gate whitelists. Every data-proportional window must be
    # partitioned.
    df = _frame(spark, 500)
    got = two_phase_order(
        df, [F.asc("id")], F.col("id"), rank_col="r", num_partitions=8
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    from tests.test_plan_quality import _empty_partition_windows

    offenders = _empty_partition_windows(plan)
    assert offenders == [] or all("__bounded" in o for o in offenders)


@pytest.mark.parametrize("n", [1, 2, 7, 100, 997])
def test_exact_global_quantiles_match_percentile_aggregate(spark, n):
    from deathmetal_datalake_spark.operators.ordering import exact_global_quantiles

    df = spark.range(n).select(((F.col("id") * 37) % 101).cast("double").alias("x"))
    fracs = [0.25, 0.5, 0.75, 0.9]
    got = {
        r["frac"]: r["q"]
        for r in exact_global_quantiles(df, F.col("x"), fracs, num_partitions=5)
        .collect()
    }
    want_row = df.agg(
        *[F.expr(f"percentile(x, {f})").alias(f"p{i}") for i, f in enumerate(fracs)]
    ).collect()[0]
    want = {f: want_row[f"p{i}"] for i, f in enumerate(fracs)}
    assert got == want  # bit-identical doubles, not approximately


def test_exact_global_quantiles_skip_nulls_and_empty_frame(spark):
    from deathmetal_datalake_spark.operators.ordering import exact_global_quantiles

    df = spark.range(10).select(
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double")).alias("x")
    )
    got = {
        r["frac"]: r["q"]
        for r in exact_global_quantiles(df, F.col("x"), [0.5]).collect()
    }
    want = df.agg(F.expr("percentile(x, 0.5)").alias("p")).collect()[0]["p"]
    assert got == {0.5: want}
    empty = df.filter(F.col("x") < -1)
    assert exact_global_quantiles(empty, F.col("x"), [0.5]).collect() == []


def test_grouped_quantiles_lowcard_match_grouped_percentile(spark):
    from deathmetal_datalake_spark.operators.ordering import grouped_quantiles_lowcard

    df = spark.range(500).select(
        (F.col("id") % 4).alias("g"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") * 7) % 23)
        .cast("double")
        .alias("x"),
    )
    fracs = [0.25, 0.5, 0.9]
    got = {
        (r["g"], r["frac"]): r["q"]
        for r in grouped_quantiles_lowcard(df, "g", F.col("x"), fracs).collect()
    }
    want_rows = df.groupBy("g").agg(
        *[F.expr(f"percentile(x, {f})").alias(f"p{i}") for i, f in enumerate(fracs)]
    ).collect()
    want = {
        (r["g"], f): r[f"p{i}"] for r in want_rows for i, f in enumerate(fracs)
    }
    assert got == want  # bit-identical doubles


def test_grouped_quantiles_lowcard_single_row_groups_and_all_null_group(spark):
    from deathmetal_datalake_spark.operators.ordering import grouped_quantiles_lowcard

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 1.0), ("b", 2.0), ("c", None)],
        "g string, x double",
    )
    got = {
        (r["g"], r["frac"]): r["q"]
        for r in grouped_quantiles_lowcard(df, "g", F.col("x"), [0.5]).collect()
    }
    assert got == {("a", 0.5): 5.0, ("b", 0.5): 1.5}  # c: no non-null values


# ---------------------------------------------------------------------------
# Tie-heavy sub-bucketing (round-9 continuation, NEXT #3): a leading
# key with a dominant value can never be split by boundaries of the key
# itself — sub_key splits heavy tie groups by the tie-break instead.
# Results must stay bit-identical; balance must actually improve.
# ---------------------------------------------------------------------------


def _tie_heavy(spark, n=3000):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(n):
        r = rng.random()
        k = 3 if r < 0.6 else (7 if r < 0.8 else rng.randint(0, 40))
        if rng.random() < 0.02:
            k = None
        s = None if rng.random() < 0.02 else rng.randint(0, 10**6)
        rows.append((i, k, s, rng.randint(1, 100)))
    return spark.createDataFrame(rows, "id long, k long, s long, v long")


@pytest.mark.parametrize("key_desc,sub_desc", [
    (False, False), (False, True), (True, False), (True, True),
])
def test_sub_key_tie_heavy_matches_global_window(spark, key_desc, sub_desc):
    df = _tie_heavy(spark)
    order = [
        F.col("k").desc() if key_desc else F.col("k").asc(),
        F.col("s").desc_nulls_last() if sub_desc else F.col("s").asc_nulls_first(),
        F.col("id").asc(),
    ]
    got = two_phase_order(
        df, order, F.col("k"), key_desc=key_desc,
        rank_col="r", cumsum=("v", "cv"), n_total_col="nt",
        num_partitions=8, sub_key=F.col("s"), sub_desc=sub_desc,
    ).select("id", "r", "cv", "nt")
    w = Window.orderBy(*order)
    want = df.select(
        "id",
        F.row_number().over(w).alias("r"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cv"),
        F.count("*").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("nt"),
    )
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0


def test_sub_key_actually_splits_the_heavy_tie_group(spark):
    from deathmetal_datalake_spark.operators.ordering import _bucket_expr

    df = _tie_heavy(spark)
    b = _bucket_expr(df, F.col("k"), False, 8, F.col("s"), False)
    n_buckets = (
        df.withColumn("b", b).filter(F.col("k") == 3).select("b").distinct().count()
    )
    assert n_buckets > 1  # without sub_key this is exactly 1 by construction
    b0 = _bucket_expr(df, F.col("k"), False, 8, None, False)
    n0 = (
        df.withColumn("b", b0).filter(F.col("k") == 3).select("b").distinct().count()
    )
    assert n0 == 1


def test_string_order_key_is_monotone_in_spark_string_order(spark):
    from deathmetal_datalake_spark.operators.ordering import string_order_key

    words = [
        "", "a", "ab", "abc", "abcdefg", "abcdefgh", "ananas", "banana~!",
        "zebra", "Zebra", "\x01", "\x7f\x7f", "ümlaut", "日本語テキスト",
    ]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    ks = [
        r["k"]
        for r in df.select(
            "s", string_order_key(F.col("s")).alias("k")
        ).orderBy("s").collect()
    ]
    assert all(ks[i] <= ks[i + 1] for i in range(len(ks) - 1))


def test_sub_key_with_string_tie_break_zipf_shape(spark):
    import random

    from deathmetal_datalake_spark.operators.ordering import string_order_key

    rng = random.Random(11)
    toks = [
        (
            "tok_" + "".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 10))),
            1 if rng.random() < 0.7 else rng.randint(1, 30),
        )
        for _ in range(2500)
    ]
    df = (
        spark.createDataFrame(toks, "token string, c long")
        .groupBy("token")
        .agg(F.max("c").alias("c"))
    )
    order = [F.desc("c"), F.asc("token")]
    got = two_phase_order(
        df, order, F.col("c"), key_desc=True, rank_col="r",
        num_partitions=8, sub_key=string_order_key(F.col("token")),
    ).select("token", "r")
    want = df.select("token", F.row_number().over(Window.orderBy(*order)).alias("r"))
    assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0


def test_sub_key_is_free_when_no_heavy_ties(spark):
    # Unique keys -> no raw boundary duplicates -> the sub action is
    # skipped and results match the plain path.
    df = spark.range(800).select(F.col("id"), (F.col("id") * 3).alias("k"))
    got = two_phase_order(
        df, [F.asc("k")], F.col("k"), rank_col="r",
        num_partitions=8, sub_key=F.col("id"),
    ).select("id", "r")
    plain = two_phase_order(
        df, [F.asc("k")], F.col("k"), rank_col="r", num_partitions=8
    ).select("id", "r")
    assert got.exceptAll(plain).count() + plain.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# grouped_quantiles_general: continuous-domain per-group selection with
# two bounded plan-time actions for ALL groups (round-9 continuation,
# NEXT #5).
# ---------------------------------------------------------------------------


def test_grouped_quantiles_general_matches_percentile_aggregate(spark):
    import random

    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )

    rng = random.Random(3)
    rows = []
    for _ in range(8000):
        g = rng.randint(0, 31)
        v = None if rng.random() < 0.01 else rng.gauss(g * 0.1, 1.0)
        rows.append((g, v))
    rows += [(100, None)] * 5 + [(101, 3.25)]  # all-NULL group, singleton
    df = spark.createDataFrame(rows, "g int, v double")
    fracs = [0.25, 0.5, 0.75, 0.9]
    got = grouped_quantiles_general(df, "g", F.col("v"), fracs, buckets=8)
    exp = (
        df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.25,0.5,0.75,0.9))").alias("qs"))
        .select("g", F.posexplode("qs").alias("i", "qe"))
        .filter(F.col("qe").isNotNull())
        .select(
            "g",
            F.element_at(F.lit(fracs), F.col("i") + 1).alias("frac"),
            "qe",
        )
    )
    j = got.join(exp, ["g", "frac"], "full").collect()
    assert all(r["q"] == r["qe"] for r in j), [
        r for r in j if r["q"] != r["qe"]
    ][:5]
    assert not [r for r in j if r["g"] == 100]  # all-NULL group: no rows
    assert all(r["q"] == 3.25 for r in j if r["g"] == 101)


def test_grouped_quantiles_general_empty_frame(spark):
    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )

    df = spark.createDataFrame([], "g int, v double")
    assert grouped_quantiles_general(df, "g", F.col("v"), [0.5]).count() == 0


# ---------------------------------------------------------------------------
# two_phase_order_multi: the fused multi-order form (round-10, NEXT #3)
# — bit-identical to serial two_phase_order calls, and its plan build
# pays at most TWO driver-side actions no matter how many specs.
# ---------------------------------------------------------------------------


def _actions_during(spark, fn):
    """Run fn() and return (result, #driver-side ACTIONS it
    triggered) — the action-count harness. Counts SQL executions, not
    Spark jobs: under AQE one .first()/.collect() action fans out into
    several jobs (one per query stage), so job counts over-report."""
    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsCount()
    out = fn()
    return out, store.executionsCount() - before


def test_multi_matches_serial_and_pays_two_actions(spark):
    from deathmetal_datalake_spark.operators.ordering import (
        OrderSpec,
        two_phase_order_multi,
    )

    df = _frame(spark).select(
        "id", "k", "v", ((F.col("id") * 13) % 7).alias("m")
    )
    specs = [
        OrderSpec(
            [F.asc("k"), F.asc("id")], F.col("k"),
            rank_col="rk", sub_key=F.col("id"),
        ),
        OrderSpec(
            [F.desc("m"), F.asc("id")], F.col("m"), key_desc=True,
            rank_col="rm", cumsum=("v", "cm"), sub_key=F.col("id"),
        ),
        OrderSpec(
            [F.desc("v"), F.asc("id")], F.col("v"), key_desc=True,
            rank_col="rv", sub_key=F.col("id"),
        ),
    ]
    fused, n_jobs = _actions_during(
        spark,
        lambda: two_phase_order_multi(
            df, specs, n_total_col="n", num_partitions=8
        ),
    )
    # Two batched actions regardless of spec count (boundaries + heavy
    # sub-boundaries; k and m are tie-heavy so the sub action fires).
    assert n_jobs <= 2, n_jobs
    serial = df
    for s in specs:
        serial = two_phase_order(
            serial, s.order_by, s.key, key_desc=s.key_desc,
            rank_col=s.rank_col, cumsum=s.cumsum, sub_key=s.sub_key,
            num_partitions=8,
        )
    n = df.count()
    cols = ["id", "rk", "rm", "cm", "rv"]
    # Collected-set comparison (not exceptAll): unioning the fused and
    # serial plans into one query re-triggers the Catalyst self-join
    # attribute-dedup binding bug the fused form itself avoids.
    a = {tuple(r) for r in fused.select(*cols).collect()}
    b = {tuple(r) for r in serial.select(*cols).collect()}
    assert a == b
    assert fused.select("n").distinct().collect()[0][0] == n


def test_rfm_quintiles_plan_build_pays_two_actions(spark):
    from deathmetal_datalake_spark.plans.events import events_rfm_quintiles
    from deathmetal_datalake_spark.plans.registry import release_caches

    try:
        _, n_jobs = _actions_during(
            spark,
            lambda: events_rfm_quintiles(spark, "/root/testdata/sf0.001"),
        )
    finally:
        release_caches()
    assert n_jobs <= 2, n_jobs


def test_grouped_quantiles_general_tie_heavy_matches_lowcard(spark):
    # Round-10 NEXT #4: one dominant value per group (the shape whose
    # collapsed boundaries used to pin a single task) must produce
    # bit-identical results to the lowcard form and the percentile
    # aggregate — heavy runs are answered from boundary literals, and
    # NO window partition contains the heavy mass.
    import random

    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
        grouped_quantiles_lowcard,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(6000):
        g = rng.randint(0, 5)
        r = rng.random()
        if r < 0.85:
            v = float(g)              # dominant value: 85% of the group
        elif r < 0.9:
            v = None
        else:
            v = float(rng.randint(0, 20))
        rows.append((g, v))
    rows += [(9, 4.0)] * 50           # a group that is ONE value entirely
    df = spark.createDataFrame(rows, "g int, v double")
    fracs = [0.1, 0.25, 0.5, 0.75, 0.9]
    gen = {
        (r["g"], r["frac"]): r["q"]
        for r in grouped_quantiles_general(
            df, "g", F.col("v"), fracs, buckets=8
        ).collect()
    }
    low = {
        (r["g"], r["frac"]): r["q"]
        for r in grouped_quantiles_lowcard(df, "g", F.col("v"), fracs).collect()
    }
    assert gen == low
    want_rows = df.groupBy("g").agg(
        *[
            F.expr(f"percentile(v, {f})").alias(f"p{i}")
            for i, f in enumerate(fracs)
        ]
    ).collect()
    want = {
        (r["g"], f): r[f"p{i}"]
        for r in want_rows
        for i, f in enumerate(fracs)
        if r[f"p{i}"] is not None
    }
    assert gen == want


def test_grouped_quantiles_general_empty_frame_keeps_group_type(spark):
    # ADVICE r9: the empty-frame early return used to hardcode the
    # group column as DOUBLE; a STRING-grouped caller unioning an empty
    # result hit a schema mismatch.
    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )

    df = spark.createDataFrame([], "g string, v double")
    out = grouped_quantiles_general(df, "g", F.col("v"), [0.5])
    assert out.schema["g"].dataType.simpleString() == "string"
    assert out.count() == 0


def test_cumsum_tuple_of_pairs_is_multi_pair(spark):
    # Round-12 ADVICE: the multi-pair dispatch keyed on tuple-ness, so
    # a TUPLE of pairs (("a","x"), ("b","y")) silently read as one
    # (value_col, out_col) pair. Detection is now structural: exactly
    # two strings = single pair; anything else iterates as pairs.
    from deathmetal_datalake_spark.operators.ordering import (
        OrderSpec,
        two_phase_order_multi,
    )

    df = _frame(spark).select(
        "id", "k", "v", (F.col("v") * 2).alias("w")
    )
    spec_tuple = OrderSpec(
        [F.asc("k"), F.asc("id")], F.col("k"),
        cumsum=(("v", "cv"), ("w", "cw")), sub_key=F.col("id"),
    )
    spec_list = OrderSpec(
        [F.asc("k"), F.asc("id")], F.col("k"),
        cumsum=[("v", "cv"), ("w", "cw")], sub_key=F.col("id"),
    )
    a = {
        tuple(r)
        for r in two_phase_order_multi(df, [spec_tuple], num_partitions=8)
        .select("id", "cv", "cw")
        .collect()
    }
    b = {
        tuple(r)
        for r in two_phase_order_multi(df, [spec_list], num_partitions=8)
        .select("id", "cv", "cw")
        .collect()
    }
    assert a == b
    # Both running sums materialized, with the w=2v relation holding
    # row-for-row — the old dispatch would have bound wrong columns.
    assert a and all(cw == 2 * cv for _, cv, cw in a)
    # Malformed forms raise instead of mis-binding columns.
    import pytest as _pytest

    bad = OrderSpec(
        [F.asc("k"), F.asc("id")], F.col("k"),
        cumsum=("v", 5), sub_key=F.col("id"),
    )
    with _pytest.raises(TypeError, match="cumsum"):
        two_phase_order_multi(df, [bad], num_partitions=8)
