"""Driver-checked data-quality gate over ``orders``: the declarative
expectations engine (``operators/quality.py``) evaluated end-to-end.
The rule set includes one expectation that genuinely FAILS on the data
(priority limited to 1-3) so the violations path is exercised by the
gate, not just the all-green path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deathmetal_datalake_spark.operators.quality import (
    expect_between,
    expect_in_set,
    expect_matches,
    expect_not_null,
    run_expectations,
)
from deathmetal_datalake_spark.plans.registry import register
from deathmetal_datalake_spark.sources.tables import load_table

_PRICE_LO, _PRICE_HI = 0.0, 1_000_000.0

_DQ_SQL = f"""
SELECT 'o_orderkey_not_null' AS rule, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
FROM orders
UNION ALL
SELECT 'o_orderstatus_in_set', COUNT(*),
       CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P') OR o_orderstatus IS NULL)
                     THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P') OR o_orderstatus IS NULL)
                THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_totalprice_between', COUNT(*),
       CAST(SUM(CASE WHEN NOT ((o_totalprice >= {_PRICE_LO} AND o_totalprice <= {_PRICE_HI})
                               OR o_totalprice IS NULL) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT ((o_totalprice >= {_PRICE_LO} AND o_totalprice <= {_PRICE_HI})
                          OR o_totalprice IS NULL) THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderpriority_matches', COUNT(*),
       CAST(SUM(CASE WHEN NOT (regexp_matches(o_orderpriority, '^[1-3]-')
                               OR o_orderpriority IS NULL) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (regexp_matches(o_orderpriority, '^[1-3]-')
                          OR o_orderpriority IS NULL) THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderkey_unique', CAST(SUM(c) AS BIGINT), CAST(SUM(c - 1) AS BIGINT),
       SUM(c - 1) = 0
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
"""


@register("dq_expectations_orders", oracle=_DQ_SQL)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        expect_not_null("o_orderkey"),
        expect_in_set("o_orderstatus", ["F", "O", "P"]),
        expect_between("o_totalprice", _PRICE_LO, _PRICE_HI),
        expect_matches("o_orderpriority", "^[1-3]-"),
    ]
    return run_expectations(orders, rules, unique_key="o_orderkey")
