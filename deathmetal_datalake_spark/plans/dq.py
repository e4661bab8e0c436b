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


# ---------------------------------------------------------------------------
# Corpus DQ gate: the same declarative engine over ``documents`` — the
# between-zone contract a training-data pipeline enforces before any
# dedup/quality stage trusts the columns it reads. Includes a
# cross-column invariant (the stored n_chars must equal the actual
# text length — the kind of drift a lossy re-ingest introduces) and a
# deliberately failing bound (n_chars <= 500) so the violations path
# is exercised here too.
# ---------------------------------------------------------------------------

_DOC_LEN_HI = 500

_DQ_DOCS_SQL = f"""
SELECT 'doc_id_not_null' AS rule, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0 AS pass
FROM documents
UNION ALL
SELECT 'lang_in_set', COUNT(*),
       CAST(SUM(CASE WHEN NOT (lang IN ('de','en','es','fr','zh') OR lang IS NULL)
                     THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (lang IN ('de','en','es','fr','zh') OR lang IS NULL)
                THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'n_chars_matches_text', COUNT(*),
       CAST(SUM(CASE WHEN NOT (n_chars = LENGTH(text)) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (n_chars = LENGTH(text)) THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'text_not_blank', COUNT(*),
       CAST(SUM(CASE WHEN NOT (TRIM(text) <> '') THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (TRIM(text) <> '') THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'n_chars_between', COUNT(*),
       CAST(SUM(CASE WHEN NOT ((n_chars >= 0 AND n_chars <= {_DOC_LEN_HI})
                               OR n_chars IS NULL) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT ((n_chars >= 0 AND n_chars <= {_DOC_LEN_HI})
                          OR n_chars IS NULL) THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'doc_id_unique', CAST(SUM(c) AS BIGINT), CAST(SUM(c - 1) AS BIGINT),
       SUM(c - 1) = 0
FROM (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id)
"""


@register("dq_expectations_documents", oracle=_DQ_DOCS_SQL)
def dq_expectations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.operators.quality import expect_expr

    docs = load_table(spark, sf_dir, "documents")
    rules = [
        expect_not_null("doc_id"),
        expect_in_set("lang", ["de", "en", "es", "fr", "zh"]),
        expect_expr("n_chars_matches_text", F.col("n_chars") == F.length("text")),
        expect_expr("text_not_blank", F.trim(F.col("text")) != ""),
        expect_between("n_chars", 0, _DOC_LEN_HI),
    ]
    return run_expectations(docs, rules, unique_key="doc_id")
