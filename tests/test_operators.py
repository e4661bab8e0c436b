"""Unit tests per operator inventory row (SURVEY.md §5 test plan #1),
plus hypothesis property checks on the pure-python name normalizer."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.cleaning import (
    clean_none_rows,
    drop_embedded_header_rows,
    extract_first_year,
    lenient_cast,
    pipe_to_comma,
    validate_columns,
)
from deathmetal_datalake_spark.operators.columns import normalize_and_dedupe, normalize_column_names
from deathmetal_datalake_spark.operators.topk import top_n_per_group


# ---- P1: column-name normalize + dedupe (flows/bronze.py:30-40) ----


def test_normalize_and_dedupe_exact_semantics():
    # strip → lower → spaces→underscores; dupes suffixed _2, _3 in order.
    assert normalize_and_dedupe([" Id ", "Name", "Formed In", "name", "NAME "]) == [
        "id",
        "name",
        "formed_in",
        "name_2",
        "name_3",
    ]


@given(st.lists(st.text(min_size=0, max_size=20), max_size=10))
@settings(max_examples=200, deadline=None)
def test_normalize_and_dedupe_properties(names):
    out = normalize_and_dedupe(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out), "output names are unique"


def test_normalize_column_names_spark(spark):
    df = spark.createDataFrame([(1, 2, 3)], [" Id ", "Formed In", "id"])
    assert normalize_column_names(df).columns == ["id", "formed_in", "id_2"]


# ---- P7 + F1: lenient cast & start_year extraction (flows/silver.py:86,91-94) ----


def test_lenient_cast_and_extract_first_year(spark):
    df = spark.createDataFrame(
        [("N/A", "Mid 1990s"), ("1987", "1987-1993, 1997-"), ("x", "unknown")],
        ["formed_in", "active"],
    )
    rows = df.select(
        lenient_cast("formed_in", "long").alias("f"),
        extract_first_year("active").alias("y"),
    ).collect()
    assert [(r["f"], r["y"]) for r in rows] == [(None, 1990), (1987, 1987), (None, None)]


# ---- P11: embedded header filter (flows/silver.py:108) ----


def test_drop_embedded_header_rows(spark):
    df = spark.createDataFrame([("1",), ("id",), ("2",)], ["id"])
    assert drop_embedded_header_rows(df, "id").count() == 2


# ---- P10: literal 'None' cleanup, null-propagating != (main.py:86) ----


def test_clean_none_rows_drops_nulls_too(spark):
    df = spark.createDataFrame([("a",), ("None",), (None,)], ["name"])
    assert [r["name"] for r in clean_none_rows(df, "name").collect()] == ["a"]


# ---- F2: pipe → comma (flows/silver.py:113) ----


def test_pipe_to_comma(spark):
    df = spark.createDataFrame([("a|b|c",)], ["content"])
    assert df.select(pipe_to_comma("content").alias("c")).first()["c"] == "a,b,c"


# ---- schema presence validation (flows/silver.py:48-52) ----


def test_validate_columns_raises(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError, match="missing columns"):
        validate_columns(df, ["id", "title"], "albums")


# ---- O5: deterministic top-N per group ----


def test_top_n_per_group_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("a", 3, 10), ("b", 4, 5)],
        ["g", "id", "score"],
    )
    top = top_n_per_group(df, ["g"], [F.desc("score"), F.asc("id")], n=2)
    got = sorted((r["g"], r["id"]) for r in top.collect())
    assert got == [("a", 1), ("a", 2), ("b", 4)], "ties broken by id, stable"


# ---- S2 chunker: lossless round-trip property ----


@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.text(st.characters(codec="ascii", exclude_characters='",\n\r'), max_size=12)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=64, max_value=512),
)
@settings(max_examples=25, deadline=None)
def test_chunker_roundtrip_property(tmp_path_factory, rows, max_bytes):
    import csv as _csv
    from pathlib import Path

    from deathmetal_datalake_spark.streaming.landing import chunk_csv

    tmp = tmp_path_factory.mktemp("chunkprop")
    src = tmp / "data.csv"
    with open(src, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["id", "val"])
        w.writerows(rows)
    chunks = chunk_csv(str(src), str(tmp / "out"), max_bytes=max_bytes)
    rebuilt = []
    for c in chunks:
        lines = Path(c).read_text().splitlines()
        assert lines[0] == "id,val"
        rebuilt.extend(lines[1:])
    original = Path(src).read_text().splitlines()[1:]
    assert rebuilt == original, "chunking must be lossless and ordered"


# ---- the portable 60-bit hash: Spark ≡ DuckDB on arbitrary strings ----


@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20, unique=True))
@settings(max_examples=10, deadline=None)
def test_hash60_cross_engine_property(spark, strings):
    import duckdb

    from deathmetal_datalake_spark.plans.registry import hash60, sql_hash60

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", hash60("s").alias("h")).collect()}
    con = duckdb.connect()
    want = {}
    for s in strings:
        want[s] = con.execute(f"SELECT {sql_hash60('?')}", [s]).fetchone()[0]
    con.close()
    assert got == want


# ---- connected components: long-chain convergence + loud cap ----


def test_min_label_propagation_long_chain(spark):
    from deathmetal_datalake_spark.plans.dedup import min_label_propagation

    # Path graph 0-1-...-19: diameter 19 exceeds the old silent
    # 15-iteration cap (labels advance one hop per round). Every node
    # must end labeled 0, plus an isolated second component.
    n = 20
    nodes = spark.createDataFrame([(i,) for i in range(n)] + [(100,), (101,)], ["node"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["a", "b"]
    )
    labels = {r["node"]: r["label"] for r in min_label_propagation(nodes, edges).collect()}
    assert all(labels[i] == 0 for i in range(n))
    assert labels[100] == 100 and labels[101] == 100


def test_min_label_propagation_raises_on_cap(spark):
    from deathmetal_datalake_spark.plans.dedup import min_label_propagation

    nodes = spark.createDataFrame([(i,) for i in range(20)], ["node"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(19)], ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(nodes, edges, max_iters=2)


# ---- data-quality expectations engine ----


def test_run_expectations_null_and_unique_semantics(spark):
    from deathmetal_datalake_spark.operators.quality import (
        expect_between,
        expect_in_set,
        expect_not_null,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -1.0), (2, None, None), (3, "z", 50.0)],
        "k long, s string, v double",
    )
    rules = [
        expect_not_null("s"),
        expect_in_set("s", ["a", "b"]),   # NULL passes; 'z' violates
        expect_between("v", 0.0, 10.0),   # NULL passes; -1 and 50 violate
    ]
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["pass"])
        for r in run_expectations(df, rules, unique_key="k").collect()
    }
    assert got["s_not_null"] == (4, 1, False)
    assert got["s_in_set"] == (4, 1, False)
    assert got["v_between"] == (4, 2, False)
    assert got["k_unique"] == (4, 1, False)  # key 1 appears twice
