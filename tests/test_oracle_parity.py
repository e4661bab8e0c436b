"""Driver-gate replica: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast path; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from deathmetal_datalake_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    report = compare_query(spark, name, QUERIES[name], ORACLES.get(name), SF_SMOKE)
    if report["match"] == "rows-only":
        assert report["spark_rows"] >= 0
    else:
        assert report["match"] is True, report.get("why", report)
