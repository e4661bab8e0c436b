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


# Oracle output types the driver's value-hasher represents identically
# to Spark's collect() output. HUGEINT (un-CAST integer SUMs) and raw
# DECIMAL outputs are deliberately NOT here: values can be bit-equal
# while the typed representations hash differently — exactly the
# round-6 driver failures. Arrays of allowed types are allowed.
ALLOWED_ORACLE_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


def oracle_type_violations(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """DuckDB result-column types of `sql` outside ALLOWED_ORACLE_TYPES
    (array element types are unwrapped). Planning-only: the query is
    not executed."""
    out = []
    for t in con.sql(sql).types:
        s = str(t)
        elem = s[:-2] if s.endswith("[]") else s
        if elem not in ALLOWED_ORACLE_TYPES:
            out.append(s)
    return out


def _norm_value(v):
    # Type-strict on purpose: the driver hashes typed representations,
    # so a Decimal must NOT compare equal to the float of the same
    # value, nor an int to a float (Python's 1 == 1.0 would otherwise
    # hide exactly the daylight the driver sees). Every non-null value
    # is tagged with a coarse type class.
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        if v == 0.0:
            return ("float", 0.0)  # collapse -0.0
        return ("float", v)
    if isinstance(v, datetime.datetime):  # before date: datetime is a date
        return ("timestamp", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    if isinstance(v, list):
        return ("list", tuple(_norm_value(x) for x in v))
    return (type(v).__name__, v)


def _normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


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
        offenders = oracle_type_violations(con, oracle)
        if offenders:
            report["match"] = False
            report["why"] = (
                f"oracle emits hasher-unsafe types {offenders}; "
                "CAST to one of "
                f"{sorted(ALLOWED_ORACLE_TYPES)} (VARCHAR round-trip for decimals)"
            )
            return report
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
