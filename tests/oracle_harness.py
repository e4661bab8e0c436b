"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, normalize
(sort columns by name, sort rows), and compare values exactly.

Exact comparison is deliberate — the driver compares value *hashes*, so
any numeric daylight between Spark and DuckDB is a failure there too.
The catalog's decimal-sum/rounding conventions (plans.registry) exist
precisely to make exact equality achievable.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from deathmetal_datalake_spark.sources.tables import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def compare_query(spark, name: str, query_fn, oracle: str | None, sf_dir: str) -> dict:
    """Returns a report dict; 'match' is True when rows+schema+values agree.

    Releases any session caches the query registered once its result is
    collected — the harness runs the whole catalog in one session, and
    without this each dedup-family invocation would pin a cached
    minhash/shingle subplan in executor storage for the session's life.
    """
    from deathmetal_datalake_spark.plans.registry import release_caches

    try:
        sdf = query_fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        release_caches()

    report = {"name": name, "spark_rows": len(s_rows), "match": None}
    if oracle is None:
        report["match"] = "rows-only"
        return report

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    finally:
        con.close()

    report["oracle_rows"] = len(d_rows)
    if sorted(s_cols) != sorted(d_cols):
        report["match"] = False
        report["why"] = f"columns differ: spark={sorted(s_cols)} oracle={sorted(d_cols)}"
        return report
    ns, nd = _normalize(s_cols, s_rows), _normalize(d_cols, d_rows)
    if len(ns) != len(nd):
        report["match"] = False
        report["why"] = f"row counts differ: spark={len(ns)} oracle={len(nd)}"
        return report
    for i, (a, b) in enumerate(zip(ns, nd)):
        if a != b:
            report["match"] = False
            report["why"] = f"first diff at sorted row {i}: spark={a!r} oracle={b!r}"
            return report
    report["match"] = True
    return report
