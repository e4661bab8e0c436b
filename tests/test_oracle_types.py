"""Catalog-wide oracle output-type invariant.

The driver's correctness gate hashes *typed* result values, so an
oracle whose DuckDB result types differ from what Spark collect()
produces can hash-mismatch even when every value is bit-equal. The
round-6 driver sample caught exactly this: three oracles with un-CAST
integer SUMs (DuckDB HUGEINT) and one with raw DECIMAL outputs. This
test closes the class: every registered oracle's DuckDB result types
must be in tests.oracle_harness.ALLOWED_ORACLE_TYPES (or arrays
thereof). Planning-only — no oracle is executed — so the whole catalog
scans in seconds.

Conventions when this test flags a new oracle:
  - integer SUM / conditional-count → CAST(... AS BIGINT)
  - decimal outputs → VARCHAR round-trip (CAST(decimal AS VARCHAR));
    NOT a direct DOUBLE cast when the magnitude can cross 2^53
    (plans/registry.py sql_dsum note).
"""

from __future__ import annotations

from deathmetal_datalake_spark.plans import ORACLES
from tests.oracle_harness import duckdb_connection, oracle_type_violations

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_emits_hasher_safe_types():
    con = duckdb_connection(SF_DIR)
    try:
        offenders = {}
        for name, sql in ORACLES.items():
            if sql is None:
                continue
            bad = oracle_type_violations(con, sql)
            if bad:
                offenders[name] = bad
    finally:
        con.close()
    assert not offenders, (
        "oracles emitting hasher-unsafe DuckDB types (CAST integer sums "
        f"AS BIGINT; VARCHAR round-trip decimals): {offenders}"
    )


def test_violation_detector_catches_hugeint_and_decimal():
    con = duckdb_connection(SF_DIR)
    try:
        # Un-CAST integer SUM → HUGEINT: the exact round-6 failure shape.
        assert oracle_type_violations(
            con, "SELECT SUM(o_orderkey) AS s FROM orders"
        ) == ["HUGEINT"]
        # Raw decimal output.
        assert oracle_type_violations(
            con, "SELECT CAST(1.5 AS DECIMAL(12,2)) AS d"
        ) == ["DECIMAL(12,2)"]
        # Array element types are unwrapped.
        assert oracle_type_violations(
            con, "SELECT [CAST(1.5 AS DECIMAL(12,2))] AS d"
        ) == ["DECIMAL(12,2)[]"]
        # The safe shapes pass.
        assert (
            oracle_type_violations(
                con,
                "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s, "
                "CAST(CAST(1.5 AS DECIMAL(12,2)) AS VARCHAR) AS d FROM orders",
            )
            == []
        )
    finally:
        con.close()
