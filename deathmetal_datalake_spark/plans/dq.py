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


# ---------------------------------------------------------------------------
# Freshness monitoring — the first page of every pipeline dashboard:
# per event type, the newest event's age against the corpus watermark
# (max ts overall) and a staleness flag at a declared SLA. Exact
# integer second arithmetic; the corpus watermark is a 1-row broadcast
# frame (whitelisted scalar-frame pattern). One scan, two bounded
# aggregates — at 100 TB this reads a partition-pruned tail, not
# history, when the events table is date-partitioned (the catalog's
# partitioned write demonstrates that layout).
# ---------------------------------------------------------------------------

_FRESH_SLA_S = 3600  # 1-hour staleness SLA per event type

_FRESH_SQL = f"""
WITH e AS (
    SELECT event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
per_type AS (
    SELECT event_type, MAX(sec) AS newest_sec, COUNT(*) AS n_events
    FROM e GROUP BY event_type
),
wm AS (SELECT MAX(sec) AS watermark_sec FROM e)
SELECT p.event_type,
       CAST(p.n_events AS BIGINT) AS n_events,
       make_timestamp(p.newest_sec * 1000000) AS newest_ts,
       CAST(w.watermark_sec - p.newest_sec AS BIGINT) AS lag_seconds,
       (w.watermark_sec - p.newest_sec) > {_FRESH_SLA_S} AS is_stale
FROM per_type p CROSS JOIN wm w
"""


@register("dq_freshness_events", oracle=_FRESH_SQL)
def dq_freshness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    per_type = e.groupBy("event_type").agg(
        F.max("sec").alias("newest_sec"), F.count(F.lit(1)).alias("n_events")
    )
    wm = e.agg(F.max("sec").alias("watermark_sec"))
    return per_type.crossJoin(broadcast(wm)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.expr(
            "timestampadd(SECOND, newest_sec, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("newest_ts"),
        (F.col("watermark_sec") - F.col("newest_sec")).cast("long").alias("lag_seconds"),
        ((F.col("watermark_sec") - F.col("newest_sec")) > _FRESH_SLA_S).alias(
            "is_stale"
        ),
    )


# ---------------------------------------------------------------------------
# Column-level profile — the dataset-card table a data catalog renders
# for every table: per column, null count, exact distinct count, and
# min/max rendered as strings (so one frame covers heterogeneous
# types). Column-stacked form (one row per column) because that is the
# shape profile STORES have (Datahub/Amundsen column stats). Exact
# distincts are per-column aggregates over one cached scan; at 100 TB
# the same frame is built from approx_count_distinct — the documented
# trade events_approx_distinct_* quantifies.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders"""
    for c in _PROFILE_COLS
)


@register("dq_column_profile_orders", oracle=_PROFILE_SQL)
def dq_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.plans.registry import session_cache

    orders = session_cache(
        load_table(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    )
    frames = []
    for c in _PROFILE_COLS:
        frames.append(
            orders.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# k-anonymity audit — the privacy gate a training-data pipeline runs
# before releasing user-derived tables: group sizes over a declared
# quasi-identifier set, the table's k (smallest group), and the
# re-identification risk mass (rows in groups below the policy
# threshold). One aggregate over the QI key, one bounded summary —
# the QI-group frame is the only shuffle, and |QI groups| << rows at
# any scale (here 5 segments x 25 nations).
# ---------------------------------------------------------------------------

_KANON_THRESHOLD = 10  # groups smaller than this are at-risk

_KANON_SQL = f"""
WITH groups AS (
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
    FROM customer
    GROUP BY 1, 2
)
SELECT CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       CAST(COUNT(*) AS BIGINT) AS n_qi_groups,
       CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN sz < {_KANON_THRESHOLD} THEN sz ELSE 0 END) AS BIGINT)
           AS n_rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN sz < {_KANON_THRESHOLD} THEN sz ELSE 0 END)
                  AS DOUBLE) / SUM(sz), 6) AS at_risk_share
FROM groups
"""


@register("dq_k_anonymity_customer", oracle=_KANON_SQL)
def dq_k_anonymity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    risk = F.sum(
        F.when(F.col("sz") < _KANON_THRESHOLD, F.col("sz")).otherwise(F.lit(0))
    )
    return groups.agg(
        F.min("sz").cast("long").alias("k_anonymity"),
        F.count(F.lit(1)).cast("long").alias("n_qi_groups"),
        F.sum("sz").cast("long").alias("n_rows"),
        risk.cast("long").alias("n_rows_at_risk"),
        F.round(risk.cast("double") / F.sum("sz"), 6).alias("at_risk_share"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit — orphan foreign keys across the star
# schema (the DQ gate before any join-based mart is trusted): child
# rows whose FK has no parent, per declared relationship. Each check
# is one LEFT ANTI join on the key — the exact shape the gate costs at
# 100 TB (broadcast for small parents, shuffle otherwise, chosen by
# AQE) — folded to a bounded per-relationship summary.
# ---------------------------------------------------------------------------

_RI_SQL = """
SELECT 'orders.o_custkey -> customer' AS relationship,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child_rows,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
           AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_suppkey -> supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
ORDER BY relationship
"""


@register("dq_referential_integrity", oracle=_RI_SQL)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    checks = [
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    out = None
    for name, child, fk, parent, pk in checks:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias(fk))
        orphans = c.select(fk).join(p, fk, "left_anti")
        row = c.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        ).select(F.lit(name).alias("relationship"), "n_child_rows", "n_orphans")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


# ---------------------------------------------------------------------------
# Distribution-drift audit (total-variation distance) — the monitoring
# check between a reference window and the current one, on fixed price
# bins so shares are exact count ratios. TV = Σ|p_ref − p_cur|/2 needs
# no logarithms (PSI's ln() is not correctly rounded across engines —
# the repo-wide transcendental ban), and fixed bins mean the whole
# audit is two bounded aggregates however large the windows are.
# ---------------------------------------------------------------------------

_DRIFT_CUTOFF = "1998-01-01 00:00:00"
_DRIFT_BIN = 50_000  # o_totalprice in [1k, 500k): 10 fixed bins

_DRIFT_SQL = f"""
WITH binned AS (
    SELECT CAST(FLOOR(o_totalprice / {_DRIFT_BIN}) AS BIGINT) AS bin,
           CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_CUTOFF}' THEN 0 ELSE 1 END AS era
    FROM orders
),
tot AS (
    SELECT CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
           CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
    FROM binned
)
SELECT b.bin,
       CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_bin,
       CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur_bin,
       ROUND(CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(t.n_ref), 6) AS share_ref,
       ROUND(CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(t.n_cur), 6) AS share_cur,
       ROUND(ABS(CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / MAX(t.n_ref)
                 - CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / MAX(t.n_cur)), 6) AS abs_share_diff
FROM binned b CROSS JOIN tot t
GROUP BY b.bin
ORDER BY b.bin
"""


@register("dq_distribution_drift_orders", oracle=_DRIFT_SQL)
def dq_distribution_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    orders = load_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.floor(F.col("o_totalprice") / _DRIFT_BIN).cast("long").alias("bin"),
        F.when(
            F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{_DRIFT_CUTOFF}'"), 0
        )
        .otherwise(1)
        .alias("era"),
    )
    tot = binned.agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ref_bin"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_cur_bin"),
    )
    # NULLIF: an entirely-one-era table (a fresh feed with no reference
    # window, or a frozen reference with no current rows) zeroes one
    # denominator — Spark's default ANSI mode would abort the audit
    # where the oracle yields NULL shares (round-8 degenerate-orders
    # find).
    share_ref = F.col("n_ref_bin").cast("double") / F.nullif(
        F.col("n_ref"), F.lit(0)
    )
    share_cur = F.col("n_cur_bin").cast("double") / F.nullif(
        F.col("n_cur"), F.lit(0)
    )
    return (
        per_bin.crossJoin(broadcast(tot))
        .select(
            "bin",
            "n_ref_bin",
            "n_cur_bin",
            F.round(share_ref, 6).alias("share_ref"),
            F.round(share_cur, 6).alias("share_cur"),
            F.round(F.abs(share_ref - share_cur), 6).alias("abs_share_diff"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — the classic synthetic-data / fraud smell
# test: the leading digit of a naturally-occurring amount column should
# follow log10(1+1/d); a flat or spiked distribution flags generated or
# truncated data. The expected shares are COMPILE-TIME constants (both
# engines receive the identical literal), so no transcendental is ever
# evaluated in-engine — the repo-wide ln() ban holds. One scan, one
# 9-group aggregate: bounded output at any scale.
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, rounded to 10 decimals at authoring time.
_BENFORD_EXPECTED = {
    1: 0.3010299957,
    2: 0.1760912591,
    3: 0.1249387366,
    4: 0.0969100130,
    5: 0.0791812460,
    6: 0.0669467896,
    7: 0.0579919470,
    8: 0.0511525224,
    9: 0.0457574906,
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {v!r}" for d, v in _BENFORD_EXPECTED.items()
) + " END"

_BENFORD_SQL = f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS BIGINT) AS first_digit
    FROM orders
    WHERE o_totalprice >= 1
),
counts AS (
    SELECT first_digit, COUNT(*) AS n FROM digits GROUP BY first_digit
),
tot AS (SELECT SUM(n) AS total FROM counts)
SELECT c.first_digit,
       CAST(c.n AS BIGINT) AS n_orders,
       ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS observed_share,
       CAST({_BENFORD_CASE} AS DOUBLE) AS expected_share,
       ROUND(ABS(CAST(c.n AS DOUBLE) / t.total
                 - CAST({_BENFORD_CASE} AS DOUBLE)), 6) AS abs_deviation
FROM counts c CROSS JOIN tot t
ORDER BY c.first_digit
"""


@register("dq_benford_first_digit", oracle=_BENFORD_SQL)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    expected = F.coalesce(
        *[
            F.when(F.col("first_digit") == d, F.lit(v))
            for d, v in _BENFORD_EXPECTED.items()
        ]
    )
    obs = F.col("n").cast("double") / F.col("total")
    return (
        counts.crossJoin(broadcast(tot))
        .select(
            "first_digit",
            F.col("n").cast("long").alias("n_orders"),
            F.round(obs, 6).alias("observed_share"),
            expected.alias("expected_share"),
            F.round(F.abs(obs - expected), 6).alias("abs_deviation"),
        )
        .orderBy("first_digit")
    )


# ---------------------------------------------------------------------------
# Candidate-key uniqueness discovery — the profiling pass that tells a
# catalog which column sets actually identify rows (and how close the
# near-keys are): per declared candidate set, exact distinct-combination
# count vs row count. Each check is one distinct-aggregate over its key
# columns — the same shuffle a dedup on that key would pay, folded to a
# one-row summary, so the audit is join-free and bounded-output at any
# scale.
# ---------------------------------------------------------------------------

_CK_SETS = [
    ("o_orderkey", ["o_orderkey"]),
    ("o_custkey", ["o_custkey"]),
    ("o_custkey+o_orderdate", ["o_custkey", "o_orderdate"]),
    ("o_orderstatus+o_orderpriority", ["o_orderstatus", "o_orderpriority"]),
]

_CK_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS candidate_key,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {", ".join(cols)} FROM orders))
           AS n_distinct,
       (SELECT COUNT(*) FROM orders)
         - (SELECT COUNT(*) FROM (SELECT DISTINCT {", ".join(cols)} FROM orders))
           AS n_duplicate_rows,
       (SELECT COUNT(*) FROM (SELECT DISTINCT {", ".join(cols)} FROM orders))
         = (SELECT COUNT(*) FROM orders) AS is_unique_key,
       ROUND(CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {", ".join(cols)}
                                         FROM orders)) AS DOUBLE)
             / (SELECT COUNT(*) FROM orders), 6) AS uniqueness_ratio"""
    for name, cols in _CK_SETS
) + "\nORDER BY candidate_key"


@register("dq_candidate_key_uniqueness", oracle=_CK_SQL)
def dq_candidate_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.plans.registry import session_cache

    orders = session_cache(load_table(spark, sf_dir, "orders"))
    n_rows = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    out = None
    for name, cols in _CK_SETS:
        nd = (
            orders.select(*cols)
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        row = (
            n_rows.crossJoin(nd)
            .select(
                F.lit(name).alias("candidate_key"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                (F.col("n_rows") - F.col("n_distinct"))
                .cast("long")
                .alias("n_duplicate_rows"),
                (F.col("n_distinct") == F.col("n_rows")).alias("is_unique_key"),
                F.round(
                    F.col("n_distinct").cast("double") / F.col("n_rows"), 6
                ).alias("uniqueness_ratio"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate_key")


# ---------------------------------------------------------------------------
# Candidate-key audit, multi-table + approximate mode (round 9 — the r8
# verdict's "generalize beyond orders"): a CONFIG-DRIVEN audit across
# the star schema, and for each declared key set BOTH the exact
# distinct count and a portable KMV estimate (the 100 TB mode — one
# bounded top-k per key instead of a full distinct shuffle), with their
# relative error reported so the approx mode's accuracy is itself
# driver-audited (the events_sampled_quantile_error pattern).
#
# KMV, not HLL: native HLL estimates differ across engines, so they can
# never be value-checked; KMV over the shared 60-bit md5 hash is
# bit-identical in both (see events_approx_distinct_users). The top-k
# smallest hashes come from orderBy().limit(k) — TakeOrderedAndProject,
# a per-partition heap + driver merge of k rows, never a global sort.
# ---------------------------------------------------------------------------

_CKM_K = 256
_CKM_SETS = [
    # (table, key name, key columns) — add rows here to widen the audit.
    ("customer", "c_custkey", ["c_custkey"]),
    ("events", "event_id", ["event_id"]),
    ("lineitem", "l_orderkey", ["l_orderkey"]),
    ("lineitem", "l_orderkey+l_linenumber", ["l_orderkey", "l_linenumber"]),
    ("orders", "o_custkey+o_orderdate", ["o_custkey", "o_orderdate"]),
    ("orders", "o_orderkey", ["o_orderkey"]),
    ("part", "p_partkey", ["p_partkey"]),
]


def _ckm_entry_sql(table: str, name: str, cols: list[str]) -> str:
    from deathmetal_datalake_spark.plans.registry import sql_hash60

    key_list = ", ".join(cols)
    concat = "concat_ws('|', " + ", ".join(f"CAST({c} AS VARCHAR)" for c in cols) + ")"
    hv = sql_hash60(concat)
    return f"""SELECT '{table}' AS table_name,
       '{name}' AS candidate_key,
       CAST(nr.n_rows AS BIGINT) AS n_rows,
       CAST(d.n_distinct AS BIGINT) AS n_distinct,
       CAST(CASE WHEN t.cnt < {_CKM_K} THEN t.cnt
                 ELSE ROUND({_CKM_K - 1}.0 * {1 << 60}.0 / t.kth, 0)
            END AS BIGINT) AS n_distinct_kmv,
       d.n_distinct = nr.n_rows AS is_unique_key,
       ROUND(CAST(d.n_distinct AS DOUBLE) / nr.n_rows, 6) AS uniqueness_ratio,
       ROUND((CAST(CASE WHEN t.cnt < {_CKM_K} THEN t.cnt
                        ELSE ROUND({_CKM_K - 1}.0 * {1 << 60}.0 / t.kth, 0)
                   END AS DOUBLE) - d.n_distinct) / d.n_distinct, 6)
           AS kmv_rel_error
FROM (SELECT COUNT(*) AS n_rows FROM {table}) nr,
     (SELECT COUNT(*) AS n_distinct
      FROM (SELECT DISTINCT {key_list} FROM {table})) d,
     (SELECT COUNT(*) AS cnt, MAX(hv) AS kth
      FROM (SELECT hv FROM (SELECT DISTINCT {hv} AS hv FROM {table})
            ORDER BY hv LIMIT {_CKM_K})) t"""


_CKM_SQL = (
    "\nUNION ALL\n".join(_ckm_entry_sql(t, n, c) for t, n, c in _CKM_SETS)
    + "\nORDER BY table_name, candidate_key"
)


@register("dq_candidate_key_multitable", oracle=_CKM_SQL)
def dq_candidate_key_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.plans.registry import hash60

    tables: dict[str, DataFrame] = {}
    n_rows: dict[str, DataFrame] = {}
    for t in {t for t, _, _ in _CKM_SETS}:
        tables[t] = load_table(spark, sf_dir, t)
        n_rows[t] = tables[t].agg(F.count(F.lit(1)).alias("n_rows"))

    out = None
    for table, name, cols in _CKM_SETS:
        df = tables[table]
        nd = (
            df.select(*cols)
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        hv = hash60(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
        kmv = (
            df.select(hv.alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(_CKM_K)
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("hv").alias("kth"))
        )
        est = F.when(F.col("cnt") < _CKM_K, F.col("cnt").cast("double")).otherwise(
            F.round(
                F.lit(float(_CKM_K - 1) * float(1 << 60))
                / F.col("kth").cast("double"),
                0,
            )
        )
        row = (
            n_rows[table]
            .crossJoin(nd)
            .crossJoin(kmv)
            .select(
                F.lit(table).alias("table_name"),
                F.lit(name).alias("candidate_key"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                est.cast("long").alias("n_distinct_kmv"),
                (F.col("n_distinct") == F.col("n_rows")).alias("is_unique_key"),
                F.round(
                    F.col("n_distinct").cast("double") / F.col("n_rows"), 6
                ).alias("uniqueness_ratio"),
                F.round(
                    (est - F.col("n_distinct"))
                    / F.nullif(F.col("n_distinct").cast("double"), F.lit(0.0)),
                    6,
                ).alias("kmv_rel_error"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name", "candidate_key")


# ---------------------------------------------------------------------------
# Document↔embedding coverage (round 9) — the pipeline-completeness
# check every retrieval corpus needs before serving: which documents
# lack an embedding row, which embeddings are orphaned (no document),
# and the id-space agreement rate. Two anti-join counts + one inner
# count over pruned single-column scans — join-key-only shuffles,
# bounded one-row output.
# ---------------------------------------------------------------------------

_EMB_COVERAGE_SQL = """
SELECT
  (SELECT COUNT(*) FROM documents) AS n_docs,
  (SELECT COUNT(*) FROM embeddings) AS n_embeddings,
  (SELECT COUNT(*) FROM documents d
   JOIN embeddings e ON e.vec_id = d.doc_id) AS n_covered,
  (SELECT COUNT(*) FROM documents d
   WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
      AS n_docs_unembedded,
  (SELECT COUNT(*) FROM embeddings e
   WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
      AS n_orphan_embeddings,
  ROUND((SELECT COUNT(*) FROM documents d
         JOIN embeddings e ON e.vec_id = d.doc_id)
        / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE), 6)
      AS coverage_rate
"""


@register("dq_embedding_coverage", oracle=_EMB_COVERAGE_SQL)
def dq_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    embs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_emb = embs.agg(F.count(F.lit(1)).alias("n_embeddings"))
    covered = (
        docs.join(embs, docs["doc_id"] == embs["vec_id"])
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    unemb = (
        docs.join(embs, docs["doc_id"] == embs["vec_id"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_docs_unembedded"))
    )
    orphan = (
        embs.join(docs, embs["vec_id"] == docs["doc_id"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan_embeddings"))
    )
    return (
        n_docs.crossJoin(broadcast(n_emb))
        .crossJoin(broadcast(covered))
        .crossJoin(broadcast(unemb))
        .crossJoin(broadcast(orphan))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_embeddings").cast("long").alias("n_embeddings"),
            F.col("n_covered").cast("long").alias("n_covered"),
            F.col("n_docs_unembedded").cast("long").alias("n_docs_unembedded"),
            F.col("n_orphan_embeddings").cast("long").alias("n_orphan_embeddings"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_docs"), 6
            ).alias("coverage_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Robust price-outlier audit (round-9 continuation) — the
# median/MAD-based anomaly screen a curation pipeline runs before
# trusting a numeric column: per order priority, the median price, the
# median absolute deviation, and how many orders sit more than K MADs
# from the median (fat-finger entries, unit mix-ups). Mean/stddev
# screens drown in the very outliers they hunt; median/MAD do not.
# Prices are CONTINUOUS-domain, so both exact-selection passes run on
# operators/ordering.grouped_quantiles_general (two bounded plan-time
# actions per pass for ALL groups; no per-group full-column buffers,
# no single-task sorts). K follows the classic 3-sigma-equivalent
# 1.4826-scaled convention, folded into one literal.
# ---------------------------------------------------------------------------

_PRICE_MAD_K = 4.4478  # 3 * 1.4826 (MAD -> sigma consistency factor)

_PRICE_ROBUST_SQL = f"""
WITH med AS (
    SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med_price
    FROM orders GROUP BY 1
),
dev AS (
    SELECT o.o_orderpriority, o.o_totalprice, m.med_price,
           ABS(o.o_totalprice - m.med_price) AS absdev
    FROM orders o JOIN med m USING (o_orderpriority)
),
mad AS (
    SELECT o_orderpriority, quantile_cont(absdev, 0.5) AS mad_price
    FROM dev GROUP BY 1
)
SELECT d.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(d.med_price, 6) AS med_price,
       ROUND(a.mad_price, 6) AS mad_price,
       CAST(SUM(CASE WHEN d.absdev > {_PRICE_MAD_K} * a.mad_price
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN d.absdev > {_PRICE_MAD_K} * a.mad_price
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS outlier_rate
FROM dev d JOIN mad a USING (o_orderpriority)
GROUP BY d.o_orderpriority, d.med_price, a.mad_price
ORDER BY priority
"""


@register("dq_price_robust_outliers", oracle=_PRICE_ROBUST_SQL)
def dq_price_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    orders = session_cache(
        load_table(spark, sf_dir, "orders").select(
            "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
        )
    )
    med = grouped_quantiles_general(
        orders, "o_orderpriority", F.col("price"), [0.5]
    ).select("o_orderpriority", F.col("q").alias("med_price"))
    dev = session_cache(
        orders.join(broadcast(med), "o_orderpriority").withColumn(
            "absdev", F.abs(F.col("price") - F.col("med_price"))
        )
    )
    mad = grouped_quantiles_general(
        dev, "o_orderpriority", F.col("absdev"), [0.5]
    ).select("o_orderpriority", F.col("q").alias("mad_price"))
    is_out = F.col("absdev") > F.lit(float(_PRICE_MAD_K)) * F.col("mad_price")
    return (
        dev.join(broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med_price", "mad_price")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            "n_orders",
            F.round("med_price", 6).alias("med_price"),
            F.round("mad_price", 6).alias("mad_price"),
            "n_outliers",
            "outlier_rate",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Daily-volume anomaly screen (round-9 continuation) — the freshness
# sibling every ingestion pipeline needs: per event type, compare each
# day's event count against that type's MEDIAN daily volume and flag
# days more than K MADs away (collector outages, bot floods, replayed
# backfills). Median/MAD instead of mean/stddev: a single outage day
# drags a stddev threshold toward itself; it cannot move a median.
# Counts are integers, so the interpolated median/MAD are exact halves
# and every comparison below is bit-deterministic cross-engine WITHOUT
# rounding tricks. Third consumer of grouped_quantiles_general (two
# bounded plan-time actions for all types per pass).
# ---------------------------------------------------------------------------

_DAILY_MAD_K = 3.0

_DAILY_ANOMALY_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT event_type, quantile_cont(c, 0.5) AS med_c FROM daily GROUP BY 1
),
dev AS (
    SELECT d.event_type, d.c, m.med_c, ABS(d.c - m.med_c) AS absdev
    FROM daily d JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(absdev, 0.5) AS mad_c FROM dev GROUP BY 1
)
SELECT v.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(v.med_c, 6) AS med_daily,
       ROUND(a.mad_c, 6) AS mad_daily,
       CAST(SUM(CASE WHEN v.absdev > {_DAILY_MAD_K} * a.mad_c
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_days
FROM dev v JOIN mad a USING (event_type)
GROUP BY v.event_type, v.med_c, a.mad_c
ORDER BY v.event_type
"""


@register("dq_daily_volume_anomaly", oracle=_DAILY_ANOMALY_SQL)
def dq_daily_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import (
        grouped_quantiles_general,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    daily = session_cache(
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    med = grouped_quantiles_general(
        daily, "event_type", F.col("c"), [0.5]
    ).select("event_type", F.col("q").alias("med_c"))
    dev = session_cache(
        daily.join(broadcast(med), "event_type").withColumn(
            "absdev", F.abs(F.col("c") - F.col("med_c"))
        )
    )
    mad = grouped_quantiles_general(
        dev, "event_type", F.col("absdev"), [0.5]
    ).select("event_type", F.col("q").alias("mad_c"))
    is_anom = F.col("absdev") > F.lit(float(_DAILY_MAD_K)) * F.col("mad_c")
    return (
        dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med_c", "mad_c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.when(is_anom, 1).otherwise(0))
            .cast("long")
            .alias("n_anomalous_days"),
        )
        .select(
            "event_type",
            "n_days",
            F.round("med_c", 6).alias("med_daily"),
            F.round("mad_c", 6).alias("mad_daily"),
            "n_anomalous_days",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# l-diversity audit (round-9 continuation) — k-anonymity's necessary
# complement: a QI group can be large (k-safe) yet expose everyone in
# it when they all share one SENSITIVE value (homogeneity attack).
# Same quasi-identifiers as dq_k_anonymity_customer
# (c_mktsegment × c_nationkey); the sensitive attribute is the
# account-balance band (floor(acctbal/1000) — the monetary fact a
# re-identification would leak). Distinct l-diversity only: the
# entropy variant needs ln(), which never crosses the engine boundary
# here. One combinable aggregate — the same 100 TB shape as the
# k-anonymity audit.
# ---------------------------------------------------------------------------

_LDIV_THRESHOLD = 3  # groups with fewer distinct sensitive values are at risk

_LDIV_SQL = f"""
WITH groups AS (
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS sz,
           COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)) AS l
    FROM customer
    GROUP BY 1, 2
)
SELECT CAST(MIN(l) AS BIGINT) AS l_diversity,
       CAST(COUNT(*) AS BIGINT) AS n_qi_groups,
       CAST(SUM(CASE WHEN l < {_LDIV_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_below_l,
       CAST(SUM(CASE WHEN l < {_LDIV_THRESHOLD} THEN sz ELSE 0 END) AS BIGINT)
           AS n_rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN l < {_LDIV_THRESHOLD} THEN sz ELSE 0 END)
                  AS DOUBLE) / SUM(sz), 6) AS at_risk_share
FROM groups
"""


@register("dq_l_diversity_customer", oracle=_LDIV_SQL)
def dq_l_diversity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    band = F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    groups = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct(band).alias("l"),
        )
    )
    below = F.col("l") < _LDIV_THRESHOLD
    return groups.agg(
        F.min("l").cast("long").alias("l_diversity"),
        F.count(F.lit(1)).cast("long").alias("n_qi_groups"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias("n_groups_below_l"),
        F.sum(F.when(below, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(below, F.col("sz")).otherwise(0)).cast("double")
            / F.sum("sz"),
            6,
        ).alias("at_risk_share"),
    )


# ---------------------------------------------------------------------------
# Chi-square drift on event values (round-9 continuation) — the
# classic two-sample distribution test between the first and second
# half of the observation window, per event type: values bucketed into
# fixed bands, expected counts from the pooled distribution, and the
# chi-square statistic Σ (observed − expected)²/expected summed over
# (band × era) cells. Everything is a ratio of integers — no ln() (a
# PSI would need it), so the statistic is engine-exact without
# rounding tricks beyond the final display ROUND. Complements
# dq_distribution_drift_orders (share deltas on orders) with the
# actual test statistic on events. One pass to band + era, one
# combinable aggregate, bounded band×type cells.
# ---------------------------------------------------------------------------

_CHI2_SQL = """
WITH bounds AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
binned AS (
    SELECT event_type,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era,
           LEAST(CAST(FLOOR(value / 20.0) AS BIGINT), 5) AS band
    FROM events, bounds
    WHERE value IS NOT NULL AND value >= 0
),
cells AS (
    SELECT event_type, era, band, COUNT(*) AS o FROM binned GROUP BY 1, 2, 3
),
era_tot AS (
    SELECT event_type, era, SUM(o) AS n_era FROM cells GROUP BY 1, 2
),
band_tot AS (
    SELECT event_type, band, SUM(o) AS n_band FROM cells GROUP BY 1, 2
),
typ_tot AS (
    SELECT event_type, SUM(o) AS n FROM cells GROUP BY 1
),
grid AS (
    SELECT b.event_type, e.era, b.band,
           COALESCE(c.o, 0) AS o,
           CAST(e.n_era AS DOUBLE) * b.n_band / t.n AS exp_c
    FROM band_tot b
    JOIN era_tot e USING (event_type)
    JOIN typ_tot t USING (event_type)
    LEFT JOIN cells c
           ON c.event_type = b.event_type AND c.band = b.band AND c.era = e.era
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(CAST(SUM(CAST((o - exp_c) * (o - exp_c) / exp_c
                              AS DECIMAL(25,12))) AS VARCHAR) AS DOUBLE), 6)
           AS chi_square
FROM grid JOIN typ_tot USING (event_type)
GROUP BY event_type
ORDER BY event_type
"""


@register("dq_chisquare_value_drift", oracle=_CHI2_SQL)
def dq_chisquare_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    binned = (
        ev.filter(F.col("value").isNotNull() & (F.col("value") >= 0))
        .crossJoin(broadcast(bounds))
        .select(
            "event_type",
            F.when(
                F.col("sec") * 2 <= F.col("lo") + F.col("hi"), F.lit(0)
            ).otherwise(F.lit(1)).alias("era"),
            F.least(
                F.floor(F.col("value") / 20.0).cast("long"), F.lit(5).cast("long")
            ).alias("band"),
        )
    )
    cells = session_cache(
        binned.groupBy("event_type", "era", "band").agg(
            F.count(F.lit(1)).alias("o")
        )
    )
    era_tot = cells.groupBy("event_type", "era").agg(F.sum("o").alias("n_era"))
    band_tot = cells.groupBy("event_type", "band").agg(
        F.sum("o").alias("n_band")
    )
    typ_tot = cells.groupBy("event_type").agg(F.sum("o").alias("n"))
    grid = (
        band_tot.join(era_tot, "event_type")
        .join(typ_tot, "event_type")
        .join(cells, ["event_type", "band", "era"], "left")
        .select(
            "event_type",
            "era",
            "band",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("n_era").cast("double") * F.col("n_band") / F.col("n")).alias(
                "exp_c"
            ),
            "n",
        )
    )
    diff = F.col("o") - F.col("exp_c")
    return (
        grid.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            # each term's quotient is one deterministic IEEE divide,
            # then the DECIMAL cast makes the sum associative
            # (partition-order-free) before the VARCHAR double crossing
            F.round(
                F.sum(
                    (diff * diff / F.col("exp_c")).cast("decimal(25,12)")
                )
                .cast("string")
                .cast("double"),
                6,
            ).alias("chi_square"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Config-driven column profile across the star schema (round-9
# continuation) — the multitable generalization of
# dq_column_profile_orders, the same pattern the candidate-key audit
# followed when it went config-driven: ONE declared table→columns map
# drives both engines, so adding a table to the catalog is a one-line
# config change, not a new query. Output is column-stacked
# (table, column) rows — the shape profile stores ingest. Exact
# distincts per column over one cached scan per table; the 100 TB
# variant swaps in approx_count_distinct (the documented
# events_approx_distinct_* trade).
# ---------------------------------------------------------------------------

_PROFILE_TABLES: dict[str, list[str]] = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"],
    "documents": ["doc_id", "lang", "source", "n_chars"],
    "events": ["event_id", "user_id", "event_type", "value"],
}

# DOUBLE columns cross engines as strings via a fixed-precision
# DECIMAL(24,6) cast (both engines render identical full-scale digits);
# a raw double->VARCHAR differs between Spark's Java repr and DuckDB's
# formatter once values leave the plain range (scientific notation
# below 1e-3 / at 1e7) — ADVICE r9. Data values are exact 2-decimal, so
# ROUND(x,6) loses nothing.
_PROFILE_DOUBLE_COLS = {"c_acctbal", "s_acctbal", "p_retailprice", "value"}


def _mt_render_sql(c: str) -> str:
    if c in _PROFILE_DOUBLE_COLS:
        return f"CAST(CAST(ROUND({{agg}}({c}), 6) AS DECIMAL(24,6)) AS VARCHAR)"
    return f"CAST({{agg}}({c}) AS VARCHAR)"


_PROFILE_MT_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{c}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_mt_render_sql(c).format(agg="MIN")} AS min_value,
       {_mt_render_sql(c).format(agg="MAX")} AS max_value
FROM {t}"""
    for t, cols in _PROFILE_TABLES.items()
    for c in cols
) + "\nORDER BY table_name, column_name"


def _mt_render(col, c: str):
    from pyspark.sql import functions as F

    if c in _PROFILE_DOUBLE_COLS:
        return F.round(col, 6).cast("decimal(24,6)").cast("string")
    return col.cast("string")


@register("dq_column_profile_multitable", oracle=_PROFILE_MT_SQL)
def dq_column_profile_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.plans.registry import session_cache

    frames = []
    for t, cols in _PROFILE_TABLES.items():
        tbl = session_cache(load_table(spark, sf_dir, t).select(*cols))
        for c in cols:
            frames.append(
                tbl.agg(
                    F.lit(t).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long")
                    .alias("n_nulls"),
                    F.countDistinct(c).cast("long").alias("n_distinct"),
                    _mt_render(F.min(c), c).alias("min_value"),
                    _mt_render(F.max(c), c).alias("max_value"),
                )
            )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# Category-set drift (round-9 continuation) — the schema-on-read
# failure mode distribution drift misses entirely: a NEW category
# value appearing (or an old one vanishing) between the first and
# second half of the observation window. Pure set algebra on bounded
# category frames: counts of new / vanished / stable values per
# categorical column, with the concrete values list_agg'd
# (sorted, so the rendering is deterministic) for the report.
# ---------------------------------------------------------------------------

_SETDRIFT_SQL = """
WITH bounds AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT event_type,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, bounds
),
sets AS (
    SELECT event_type,
           MAX(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS in_ref,
           MAX(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS in_cur
    FROM tagged GROUP BY event_type
)
SELECT CAST(SUM(CASE WHEN in_ref = 1 AND in_cur = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stable,
       CAST(SUM(CASE WHEN in_ref = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN in_cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_vanished,
       COALESCE(string_agg(CASE WHEN in_ref = 0 THEN event_type END, ','
                           ORDER BY event_type), '') AS new_values,
       COALESCE(string_agg(CASE WHEN in_cur = 0 THEN event_type END, ','
                           ORDER BY event_type), '') AS vanished_values
FROM sets
"""


@register("dq_category_set_drift", oracle=_SETDRIFT_SQL)
def dq_category_set_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    sets = (
        ev.crossJoin(broadcast(bounds))
        .select(
            "event_type",
            F.when(
                F.col("sec") * 2 <= F.col("lo") + F.col("hi"), F.lit(0)
            ).otherwise(F.lit(1)).alias("era"),
        )
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("era") == 0, 1).otherwise(0)).alias("in_ref"),
            F.max(F.when(F.col("era") == 1, 1).otherwise(0)).alias("in_cur"),
        )
    )
    new_vals = F.array_join(
        F.array_sort(
            F.collect_list(F.when(F.col("in_ref") == 0, F.col("event_type")))
        ),
        ",",
    )
    gone_vals = F.array_join(
        F.array_sort(
            F.collect_list(F.when(F.col("in_cur") == 0, F.col("event_type")))
        ),
        ",",
    )
    return sets.agg(
        F.sum(F.when((F.col("in_ref") == 1) & (F.col("in_cur") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_stable"),
        F.sum(F.when(F.col("in_ref") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("in_cur") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_vanished"),
        new_vals.alias("new_values"),
        gone_vals.alias("vanished_values"),
    )


# ---------------------------------------------------------------------------
# Cross-table cardinality ratios (round-9 continuation) — the sanity
# panel a warehouse checks after every load: fact-per-dimension ratios
# (orders per customer, lines per order, parts per supplier-nation…)
# drifting outside expectation catches partial loads and fan-out bugs
# before any query does. Config-driven pairs; counts are one
# aggregate per table, the ratio one IEEE divide.
# ---------------------------------------------------------------------------

_RATIO_PAIRS = [
    ("orders", "customer"),
    ("lineitem", "orders"),
    ("lineitem", "part"),
    ("lineitem", "supplier"),
    ("customer", "nation"),
]

_RATIO_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{num}/{den}' AS pair,
       (SELECT COUNT(*) FROM {num}) AS n_fact,
       (SELECT COUNT(*) FROM {den}) AS n_dim,
       ROUND((SELECT COUNT(*) FROM {num}) * 1.0
             / NULLIF((SELECT COUNT(*) FROM {den}), 0), 6) AS ratio"""
    for num, den in _RATIO_PAIRS
) + "\nORDER BY pair"


@register("dq_cardinality_ratios", oracle=_RATIO_SQL)
def dq_cardinality_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    counts = {
        t: load_table(spark, sf_dir, t).count()
        for t in sorted({t for pair in _RATIO_PAIRS for t in pair})
    }
    rows = []
    for num, den in _RATIO_PAIRS:
        nf, nd = counts[num], counts[den]
        rows.append(
            (f"{num}/{den}", nf, nd, round(nf * 1.0 / nd, 6) if nd else None)
        )
    return (
        spark.createDataFrame(
            rows, "pair string, n_fact long, n_dim long, ratio double"
        )
        .orderBy("pair")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U value drift (round 10) — the NONPARAMETRIC two-sample
# drift test the chi-square binning misses: did the VALUE DISTRIBUTION
# shift between the observation window's first and second half,
# without assuming any distribution or bin layout? Rank-sum math is
# done entirely on integers: per DISTINCT value the tie group's rank
# contribution is n_a(v) * (2*cum_before + cnt + 1) (doubled ranks, so
# tie-averaged ranks of .5 stay integral), accumulated in DECIMAL(38,0)
# / HUGEINT (products reach N^2). The z-score uses the tie-corrected
# variance; every double is derived from the same exact integers via
# the VARCHAR-parse crossing, so ROUND(z, 6) agrees bit-for-bit.
# 100 TB: the distinct-value frame is data-proportional, so its running
# count uses the two-phase distributed cumsum — no single-task sort.
# ---------------------------------------------------------------------------

_MWU_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT value,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, b WHERE value IS NOT NULL
),
g AS (
    SELECT value,
           SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS na,
           SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS nb,
           COUNT(*) AS cnt
    FROM tagged GROUP BY value
),
o AS (
    SELECT na, nb, cnt,
           COALESCE(SUM(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM g
),
s AS (
    SELECT SUM(CAST(na AS HUGEINT)) AS n_a,
           SUM(CAST(nb AS HUGEINT)) AS n_b,
           SUM(CAST(na AS HUGEINT) * (2 * CAST(cb AS HUGEINT)
                                      + CAST(cnt AS HUGEINT) + 1)) AS r2a,
           SUM(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
               - CAST(cnt AS HUGEINT)) AS tie3
    FROM o
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(CAST(r2a - n_a * (n_a + 1) AS VARCHAR) AS DOUBLE) AS u2_a,
       ROUND(
         (CAST(CAST(r2a - n_a * (n_a + 1) AS VARCHAR) AS DOUBLE)
          - CAST(CAST(n_a * n_b AS VARCHAR) AS DOUBLE))
         / (2.0 * SQRT(
             (CAST(CAST(n_a AS VARCHAR) AS DOUBLE)
              * CAST(CAST(n_b AS VARCHAR) AS DOUBLE) / 12.0)
             * ((CAST(CAST(n_a + n_b AS VARCHAR) AS DOUBLE) + 1.0)
                - CAST(CAST(tie3 AS VARCHAR) AS DOUBLE)
                  / (CAST(CAST(n_a + n_b AS VARCHAR) AS DOUBLE)
                     * (CAST(CAST(n_a + n_b AS VARCHAR) AS DOUBLE) - 1.0))))),
         6) AS z_score
FROM s
"""


@register("dq_mannwhitney_value_drift", oracle=_MWU_SQL)
def dq_mannwhitney_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    ).filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    tagged = ev.crossJoin(broadcast(bounds)).select(
        "value",
        F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = tagged.groupBy("value").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("nb"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # Distinct-value frame is data-proportional: distributed running
    # count (two-phase), never a single-task ORDER BY window.
    o = two_phase_order(
        g, [F.asc("value")], F.col("value"), cumsum=("cnt", "cum_incl")
    ).select(
        "na", "nb", "cnt", (F.col("cum_incl") - F.col("cnt")).alias("cb")
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = o.agg(
        F.sum(d19("na")).alias("n_a"),
        F.sum(d19("nb")).alias("n_b"),
        F.sum(
            d19("na") * (F.lit(2).cast("decimal(19,0)") * d19("cb") + d19("cnt") + 1)
        ).alias("r2a"),
        F.sum(d19("cnt") * d19("cnt") * d19("cnt") - d19("cnt")).alias("tie3"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    u2 = dd(F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1))
    na, nb = dd(F.col("n_a")), dd(F.col("n_b"))
    nn = dd(F.col("n_a") + F.col("n_b"))
    tie = dd(F.col("tie3"))
    var = (na * nb / F.lit(12.0)) * (
        (nn + F.lit(1.0)) - tie / (nn * (nn - F.lit(1.0)))
    )
    z = (u2 - dd(F.col("n_a") * F.col("n_b"))) / (F.lit(2.0) * F.sqrt(var))
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.alias("u2_a"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample drift (round 10) — the companion to the
# Mann-Whitney test: D = sup |F_a(v) - F_b(v)| catches SHAPE changes a
# rank-sum misses (equal medians, different spread). Exactness trick:
# the supremum is taken over the INTEGER quantity
# |n_b * cumA(v) - n_a * cumB(v)| (cross-multiplied ECDFs, HUGEINT /
# DECIMAL(38,0) — products reach N^2), so the argmax and the tie-break
# (smallest value attaining it) are exact; only the final division
# becomes a rounded double via the VARCHAR crossing. 100 TB: running
# ECDF counts over the data-proportional distinct-value frame use the
# fused two-phase cumsum (one boundary action for both eras' sums).
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT value,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, b WHERE value IS NOT NULL
),
g AS (
    SELECT value,
           SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS ca,
           SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS cb
    FROM tagged GROUP BY value
),
o AS (
    SELECT value,
           SUM(ca) OVER (ORDER BY value) AS cuma,
           SUM(cb) OVER (ORDER BY value) AS cumb
    FROM g
),
t AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM g),
d AS (
    SELECT value,
           ABS(CAST(t.n_b AS HUGEINT) * CAST(cuma AS HUGEINT)
               - CAST(t.n_a AS HUGEINT) * CAST(cumb AS HUGEINT)) AS dn
    FROM o, t
),
m AS (SELECT MAX(dn) AS dmax FROM d)
SELECT CAST(t.n_a AS BIGINT) AS n_a,
       CAST(t.n_b AS BIGINT) AS n_b,
       ROUND(CAST(CAST(m.dmax AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(t.n_a AS VARCHAR) AS DOUBLE)
                * CAST(CAST(t.n_b AS VARCHAR) AS DOUBLE)), 6) AS d_stat,
       (SELECT MIN(value) FROM d WHERE d.dn = m.dmax) AS ks_at_value
FROM t, m
"""


@register("dq_ks_two_sample_drift", oracle=_KS_SQL)
def dq_ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import (
        OrderSpec,
        two_phase_order_multi,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    ).filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    tagged = ev.crossJoin(broadcast(bounds)).select(
        "value",
        F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = session_cache(
        tagged.groupBy("value").agg(
            F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    # BOTH running ECDF counts share ONE total order, so they ride one
    # spec with a multi-pair cumsum (one bucket tag, one totals
    # aggregate, one offsets frame, one local window — the Jonckheere
    # shape), instead of running the whole per-spec machinery twice
    # for two identical orders.
    o = two_phase_order_multi(
        g,
        [
            OrderSpec(
                [F.asc("value")],
                F.col("value"),
                cumsum=[("ca", "cuma"), ("cb", "cumb")],
            )
        ],
    )
    t = g.agg(
        F.sum("ca").cast("decimal(19,0)").alias("n_a"),
        F.sum("cb").cast("decimal(19,0)").alias("n_b"),
    )
    d = o.crossJoin(broadcast(t)).select(
        "value",
        F.abs(
            F.col("n_b") * F.col("cuma").cast("decimal(19,0)")
            - F.col("n_a") * F.col("cumb").cast("decimal(19,0)")
        ).alias("dn"),
    )
    # One aggregate yields BOTH the supremum and its argmin tie-break:
    # max(struct(dn, -value)) is lexicographic — max dn first, then max
    # of -value = MIN(value) among the rows attaining it (value is a
    # non-NULL double here; -(-v) round-trips every finite v, and
    # -(-0.0) = 0.0 matches the input). Replaces the cached d frame +
    # separate max action + argmax equi-join (three plans over the
    # pair frame) with one pass.
    mx = d.agg(
        F.max(
            F.struct(F.col("dn"), (-F.col("value")).alias("negv"))
        ).alias("mx")
    )
    dd = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    # Final row assembled from the AGGREGATE frames (t/mx each always
    # yield exactly one row) — never limit(1) over the data frame, which
    # returns 0 rows on an empty events table while the oracle's
    # scalar-subquery form returns one NULL-fielded row (r10 ADVICE).
    return t.crossJoin(broadcast(mx)).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(dd("mx.dn") / (dd("n_a") * dd("n_b")), 6).alias("d_stat"),
        (-F.col("mx.negv")).alias("ks_at_value"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta effect size (round 11) — the EFFECT-SIZE companion to
# the Mann-Whitney/KS drift pair: those answer "did the distribution
# shift?", this answers "by how much?" on the ordinal dominance scale
# delta = (#(a>b) - #(a<b)) / (n_a*n_b) in [-1, 1], robust to any
# monotone transform of value. Exactness: per distinct value v the
# era-0 items dominate exactly cum_b_before(v) era-1 items, so
# gt = sum_v na(v)*cumb(v) is a pure-integer DECIMAL(38,0)/HUGEINT
# aggregate (products reach N^2), lt falls out as n_a*n_b - gt - ties,
# and only the final ratio becomes a rounded double via the VARCHAR
# crossing. 100 TB: the distinct-value frame is data-proportional —
# running era-1 count via the two-phase distributed cumsum.
# ---------------------------------------------------------------------------

_CLIFFS_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT value,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, b WHERE value IS NOT NULL
),
g AS (
    SELECT value,
           SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS na,
           SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS nb
    FROM tagged GROUP BY value
),
o AS (
    SELECT na, nb,
           COALESCE(SUM(nb) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbb
    FROM g
),
s AS (
    SELECT SUM(CAST(na AS HUGEINT)) AS n_a,
           SUM(CAST(nb AS HUGEINT)) AS n_b,
           SUM(CAST(na AS HUGEINT) * CAST(cbb AS HUGEINT)) AS gt,
           SUM(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)) AS ties
    FROM o
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(CAST(gt AS VARCHAR) AS DOUBLE) AS gt_pairs,
       CAST(CAST(n_a * n_b - gt - ties AS VARCHAR) AS DOUBLE) AS lt_pairs,
       CASE WHEN COALESCE(n_a, 0) = 0 OR COALESCE(n_b, 0) = 0 THEN NULL
            ELSE ROUND((2.0 * CAST(CAST(gt AS VARCHAR) AS DOUBLE)
                        + CAST(CAST(ties AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(n_a * n_b AS VARCHAR) AS DOUBLE))
                       / CAST(CAST(n_a * n_b AS VARCHAR) AS DOUBLE), 6)
       END AS cliffs_delta
FROM s
"""


@register("dq_cliffs_delta_effect_size", oracle=_CLIFFS_SQL)
def dq_cliffs_delta_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    ).filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    tagged = ev.crossJoin(broadcast(bounds)).select(
        "value",
        F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = tagged.groupBy("value").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("nb"),
    )
    o = two_phase_order(
        g, [F.asc("value")], F.col("value"), cumsum=("nb", "cum_incl")
    ).select("na", "nb", (F.col("cum_incl") - F.col("nb")).alias("cbb"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = o.agg(
        F.sum(d19("na")).alias("n_a"),
        F.sum(d19("nb")).alias("n_b"),
        F.sum(d19("na") * d19("cbb")).alias("gt"),
        F.sum(d19("na") * d19("nb")).alias("ties"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    na, nb = F.col("n_a"), F.col("n_b")
    gt, ties = F.col("gt"), F.col("ties")
    delta = (
        F.lit(2.0) * dd(gt) + dd(ties) - dd(na * nb)
    ) / dd(na * nb)
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        dd(gt).alias("gt_pairs"),
        dd(na * nb - gt - ties).alias("lt_pairs"),
        F.when(
            (F.coalesce(na, F.lit(0).cast("decimal(19,0)")) == 0)
            | (F.coalesce(nb, F.lit(0).cast("decimal(19,0)")) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(delta, 6))
        .alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank sums by event type (round 11) — the K-GROUP
# generalization of the Mann-Whitney pair: are the value distributions
# of the event types exchangeable, reported as per-type rank-sum
# deviations? All types are ranked JOINTLY with tie-averaged ranks via
# the doubled-rank trick (2*cum_before + cnt + 1 per distinct-value tie
# group), so R_j = sum over the type's values of its members' averaged
# ranks is exact (DECIMAL(38,0)/HUGEINT — rank sums reach N^2); the
# per-type z-score uses the finite-population variance
# n_j(N-n_j)(N+1)/12 with the tie-correction factor
# (1 - sum(t^3-t)/(N^3-N)), every double derived from the same exact
# integers via the VARCHAR crossing. 100 TB: distinct values get the
# two-phase cumsum; the (value x type) frame joins to it on value (hash
# join); the final frame is event_type-bounded.
# ---------------------------------------------------------------------------

_KRUSKAL_SQL = """
WITH v AS (
    SELECT value, event_type FROM events WHERE value IS NOT NULL
),
g AS (SELECT value, COUNT(*) AS cnt FROM v GROUP BY value),
o AS (
    SELECT value, cnt,
           COALESCE(SUM(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM g
),
t AS (
    SELECT SUM(CAST(cnt AS HUGEINT)) AS n,
           SUM(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
               * CAST(cnt AS HUGEINT) - CAST(cnt AS HUGEINT)) AS tie3
    FROM g
),
gt AS (
    SELECT event_type, value, COUNT(*) AS cj FROM v GROUP BY 1, 2
),
r AS (
    SELECT event_type,
           SUM(CAST(cj AS HUGEINT)) AS nj,
           SUM(CAST(cj AS HUGEINT) * (2 * CAST(o.cb AS HUGEINT)
                                      + CAST(o.cnt AS HUGEINT) + 1)) AS r2
    FROM gt JOIN o ON gt.value = o.value GROUP BY event_type
)
SELECT event_type,
       CAST(nj AS BIGINT) AS n_j,
       CAST(CAST(r2 AS VARCHAR) AS DOUBLE) / 2.0 AS rank_sum,
       ROUND(CAST(CAST(nj AS VARCHAR) AS DOUBLE)
             * (CAST(CAST(t.n AS VARCHAR) AS DOUBLE) + 1.0) / 2.0, 6)
           AS expected_rank_sum,
       CASE WHEN t.n <= 1 OR nj = t.n
                 OR t.tie3 = t.n * t.n * t.n - t.n THEN NULL
            ELSE ROUND(
              (CAST(CAST(r2 AS VARCHAR) AS DOUBLE) / 2.0
               - CAST(CAST(nj AS VARCHAR) AS DOUBLE)
                 * (CAST(CAST(t.n AS VARCHAR) AS DOUBLE) + 1.0) / 2.0)
              / SQRT(CAST(CAST(nj AS VARCHAR) AS DOUBLE)
                     * (CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                        - CAST(CAST(nj AS VARCHAR) AS DOUBLE))
                     * (CAST(CAST(t.n AS VARCHAR) AS DOUBLE) + 1.0) / 12.0
                     * (1.0 - CAST(CAST(t.tie3 AS VARCHAR) AS DOUBLE)
                        / (CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                           * CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                           * CAST(CAST(t.n AS VARCHAR) AS DOUBLE)
                           - CAST(CAST(t.n AS VARCHAR) AS DOUBLE)))),
              6)
       END AS z_score
FROM r, t ORDER BY event_type
"""


@register("dq_kruskal_wallis_rank_sums", oracle=_KRUSKAL_SQL)
def dq_kruskal_wallis_rank_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order
    from deathmetal_datalake_spark.plans.registry import session_cache

    v = load_table(spark, sf_dir, "events").select(
        "value", "event_type"
    ).filter(F.col("value").isNotNull())
    g = session_cache(
        v.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    )
    o = two_phase_order(
        g, [F.asc("value")], F.col("value"), cumsum=("cnt", "cum_incl")
    ).select("value", "cnt", (F.col("cum_incl") - F.col("cnt")).alias("cb"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    t = g.agg(
        F.sum(d19("cnt")).alias("n"),
        F.sum(d19("cnt") * d19("cnt") * d19("cnt") - d19("cnt")).alias("tie3"),
    )
    gt = v.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cj"))
    r = (
        gt.join(o, "value")
        .groupBy("event_type")
        .agg(
            F.sum(d19("cj")).alias("nj"),
            F.sum(
                d19("cj")
                * (F.lit(2).cast("decimal(19,0)") * d19("cb") + d19("cnt") + 1)
            ).alias("r2"),
        )
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    n, tie3, nj, r2 = F.col("n"), F.col("tie3"), F.col("nj"), F.col("r2")
    rank_sum = dd(r2) / F.lit(2.0)
    expected = dd(nj) * (dd(n) + F.lit(1.0)) / F.lit(2.0)
    z = (rank_sum - expected) / F.sqrt(
        dd(nj) * (dd(n) - dd(nj)) * (dd(n) + F.lit(1.0)) / F.lit(12.0)
        * (
            F.lit(1.0)
            - dd(tie3) / (dd(n) * dd(n) * dd(n) - dd(n))
        )
    )
    return (
        r.crossJoin(broadcast(t))
        .select(
            "event_type",
            nj.cast("long").alias("n_j"),
            rank_sum.alias("rank_sum"),
            F.round(expected, 6).alias("expected_rank_sum"),
            F.when(
                (n <= 1) | (nj == n) | (tie3 == n * n * n - n),
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(z, 6))
            .alias("z_score"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth mover's) value drift (round 11) — the METRIC
# companion to KS: KS reports the worst single ECDF gap, W1 integrates
# |F_a - F_b| over the value axis, so it weighs HOW FAR mass moved, not
# just whether it did. Exactness: over the distinct-value support,
# W1 = sum_v |n_b*cumA(v) - n_a*cumB(v)| * gap(v) / (n_a*n_b) where
# gap(v) is the distance to the next distinct value in CENTS (values
# are exact 2-decimal; the decimal cast recovers them identically on
# both engines) — the weighted sum is pure DECIMAL(38,0)/HUGEINT
# integer math (terms reach N^2 * gap_cents), and only the final
# normalization becomes a rounded double via the VARCHAR crossing.
# 100 TB: both ECDF running counts come from ONE fused two-phase pass;
# the next-value lookup is an equi-join on the global rank, never a
# LEAD over an unpartitioned window.
# ---------------------------------------------------------------------------

_WASSERSTEIN_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT CAST(value AS DECIMAL(18,2)) AS v,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, b WHERE value IS NOT NULL
),
g AS (
    SELECT v,
           SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS na,
           SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS nb
    FROM tagged GROUP BY v
),
o AS (
    SELECT v,
           SUM(na) OVER (ORDER BY v) AS cuma,
           SUM(nb) OVER (ORDER BY v) AS cumb,
           LEAD(v) OVER (ORDER BY v) AS nextv
    FROM g
),
t AS (SELECT SUM(CAST(na AS HUGEINT)) AS n_a, SUM(CAST(nb AS HUGEINT)) AS n_b
      FROM g),
s AS (
    SELECT SUM(ABS(t.n_b * CAST(cuma AS HUGEINT)
                   - t.n_a * CAST(cumb AS HUGEINT))
               * CAST(CAST((nextv - v) * 100 AS BIGINT) AS HUGEINT)) AS num
    FROM o, t WHERE nextv IS NOT NULL
)
SELECT CAST(t.n_a AS BIGINT) AS n_a,
       CAST(t.n_b AS BIGINT) AS n_b,
       CASE WHEN COALESCE(t.n_a, 0) = 0 OR COALESCE(t.n_b, 0) = 0 THEN NULL
            ELSE ROUND(CAST(CAST(COALESCE(s.num, 0) AS VARCHAR) AS DOUBLE)
                       / (100.0 * CAST(CAST(t.n_a AS VARCHAR) AS DOUBLE)
                          * CAST(CAST(t.n_b AS VARCHAR) AS DOUBLE)), 6)
       END AS w1_distance
FROM t, s
"""


@register("dq_wasserstein_value_drift", oracle=_WASSERSTEIN_SQL)
def dq_wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import (
        OrderSpec,
        two_phase_order_multi,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    ).filter(F.col("value").isNotNull())
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    tagged = ev.crossJoin(broadcast(bounds)).select(
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = session_cache(
        tagged.groupBy("v").agg(
            F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("nb"),
        )
    )
    # Both ECDFs + the global rank share ONE total order, so they ride
    # one spec with a multi-pair cumsum (one bucket tag, one totals
    # aggregate, one offsets frame, one local window — the Jonckheere
    # shape), instead of running the per-spec machinery twice for two
    # identical orders.
    o = session_cache(
        two_phase_order_multi(
            g,
            [
                OrderSpec(
                    [F.asc("v")], F.col("v"), rank_col="rk",
                    cumsum=[("na", "cuma"), ("nb", "cumb")],
                )
            ],
        )
    )
    t = g.agg(
        F.sum(F.col("na").cast("decimal(19,0)")).alias("n_a"),
        F.sum(F.col("nb").cast("decimal(19,0)")).alias("n_b"),
    )
    nxt = o.select((F.col("rk") - 1).alias("rk"), F.col("v").alias("nextv"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    terms = (
        o.join(nxt, "rk")
        .crossJoin(broadcast(t))
        .select(
            (
                F.abs(
                    F.col("n_b") * d19("cuma") - F.col("n_a") * d19("cumb")
                )
                * ((F.col("nextv") - F.col("v")) * 100).cast("decimal(19,0)")
            ).alias("term")
        )
    )
    s = terms.agg(F.sum("term").alias("num"))
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    na, nb = F.col("n_a"), F.col("n_b")
    zero = F.lit(0).cast("decimal(19,0)")
    w1 = dd(F.coalesce(F.col("num"), F.lit(0).cast("decimal(38,0)"))) / (
        F.lit(100.0) * dd(na) * dd(nb)
    )
    return t.crossJoin(broadcast(s)).select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when(
            (F.coalesce(na, zero) == 0) | (F.coalesce(nb, zero) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(w1, 6))
        .alias("w1_distance"),
    )


# ---------------------------------------------------------------------------
# Total-variation drift over the event-type mix (round 11) — the
# HISTOGRAM-distance member of the drift family: KS/W1 compare the
# value axis, TV compares the categorical composition: did the MIX of
# event types shift between eras? TV = max over event sets of
# |P_a - P_b| = (1/2) sum_types |na_i*N_b - nb_i*N_a| / (N_a*N_b), an
# exact DECIMAL(38,0)/HUGEINT integer sum (cross-products reach N^2)
# with one rounded double at the end via the VARCHAR crossing. 100 TB:
# one hash aggregate over the enum-bounded type frame; the final row
# assembles from always-one-row aggregate frames.
# ---------------------------------------------------------------------------

_TV_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
tagged AS (
    SELECT event_type,
           CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 2
                     <= lo + hi THEN 0 ELSE 1 END AS era
    FROM events, b
),
g AS (
    SELECT event_type,
           SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS na,
           SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS nb
    FROM tagged GROUP BY event_type
),
t AS (SELECT SUM(CAST(na AS HUGEINT)) AS n_a, SUM(CAST(nb AS HUGEINT)) AS n_b,
             COUNT(*) AS n_types
      FROM g),
s AS (
    SELECT SUM(ABS(CAST(na AS HUGEINT) * t.n_b
                   - CAST(nb AS HUGEINT) * t.n_a)) AS num
    FROM g, t
)
SELECT CAST(t.n_a AS BIGINT) AS n_a,
       CAST(t.n_b AS BIGINT) AS n_b,
       CAST(t.n_types AS BIGINT) AS n_types,
       CASE WHEN COALESCE(t.n_a, 0) = 0 OR COALESCE(t.n_b, 0) = 0 THEN NULL
            ELSE ROUND(CAST(CAST(s.num AS VARCHAR) AS DOUBLE)
                       / (2.0 * CAST(CAST(t.n_a AS VARCHAR) AS DOUBLE)
                          * CAST(CAST(t.n_b AS VARCHAR) AS DOUBLE)), 6)
       END AS tv_distance
FROM t, s
"""


@register("dq_total_variation_drift", oracle=_TV_SQL)
def dq_total_variation_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    tagged = ev.crossJoin(broadcast(bounds)).select(
        "event_type",
        F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("era"),
    )
    g = session_cache(
        tagged.groupBy("event_type").agg(
            F.sum(F.when(F.col("era") == 0, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("era") == 1, 1).otherwise(0)).alias("nb"),
        )
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    t = g.agg(
        F.sum(d19("na")).alias("n_a"),
        F.sum(d19("nb")).alias("n_b"),
        F.count(F.lit(1)).alias("n_types"),
    )
    s = (
        g.crossJoin(broadcast(t))
        .select(
            F.abs(
                d19("na") * F.col("n_b") - d19("nb") * F.col("n_a")
            ).alias("term")
        )
        .agg(F.sum("term").alias("num"))
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    na, nb = F.col("n_a"), F.col("n_b")
    zero = F.lit(0).cast("decimal(19,0)")
    return t.crossJoin(broadcast(s)).select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.col("n_types").cast("long").alias("n_types"),
        F.when(
            (F.coalesce(na, zero) == 0) | (F.coalesce(nb, zero) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                dd(F.col("num")) / (F.lit(2.0) * dd(na) * dd(nb)), 6
            )
        )
        .alias("tv_distance"),
    )


# ---------------------------------------------------------------------------
# Hash-collision audit (round 11) — the integrity check every
# hash-keyed dedup pipeline owes its users: does the 60-bit content
# hash ever map two DIFFERENT texts to one key (a false-positive
# "duplicate" that would silently delete a unique document)? The query
# counts hash groups whose distinct-text count exceeds 1 — expected 0
# at any realistic corpus size (birthday bound ~N^2/2^61) — plus the
# group-size profile that makes the bound checkable. 100 TB: two hash
# aggregates, no window.
# ---------------------------------------------------------------------------

from deathmetal_datalake_spark.plans.registry import sql_hash60 as _sql_hash60

_HASH_COLLISION_SQL = f"""
WITH d AS (
    SELECT {_sql_hash60("COALESCE(text, '')")} AS ch, COALESCE(text, '') AS t
    FROM documents
),
g AS (
    SELECT ch, COUNT(*) AS n_docs, COUNT(DISTINCT t) AS n_texts
    FROM d GROUP BY ch
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
       CAST(SUM(CASE WHEN n_texts > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_collisions,
       CAST(MAX(n_docs) AS BIGINT) AS max_group_size,
       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_doc_hashes
FROM g
"""


@register("dq_hash_collision_audit", oracle=_HASH_COLLISION_SQL)
def dq_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.plans.registry import hash60

    d = load_table(spark, sf_dir, "documents").select(
        hash60(F.coalesce(F.col("text"), F.lit(""))).alias("ch"),
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
    )
    g = d.groupBy("ch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("t").alias("n_texts"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        F.sum(F.when(F.col("n_texts") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_collisions"),
        F.max("n_docs").cast("long").alias("max_group_size"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_multi_doc_hashes"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence of event_type x day-of-week (round 12), with
# Cramér's V — the categorical-association audit behind "is traffic
# mix weekday-dependent?" (and the template for any two bounded-
# cardinality columns). Exactness: each cell's deviation is kept as
# the exact 128-bit integer obs*N - row_tot*col_tot (products reach
# N^2 — DECIMAL(38,0)/HUGEINT); the per-cell contribution
# (num^2/(N*row*col)) crosses to double via the exact VARCHAR parse
# and ONE identical IEEE expression, then rounds to a 6-dp integer in
# MICRO units so the chi-square total is an exact integer sum (never
# an order-dependent float sum). 100 TB: one hash aggregate to
# K x 7 cells, bounded-frame broadcasts only, one 1-row reduce.
# ---------------------------------------------------------------------------

_CHI2_SQL = """
WITH cells AS (
    SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS wd,
           COUNT(*) AS obs
    FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, SUM(obs) AS row_tot FROM cells GROUP BY 1),
ct AS (SELECT wd, SUM(obs) AS col_tot FROM cells GROUP BY 1),
nt AS (SELECT SUM(obs) AS n FROM cells),
contrib AS (
    SELECT c.event_type, c.wd,
           CAST(ROUND(
               (CAST(CAST(CAST(c.obs AS HUGEINT) * n.n
                          - r.row_tot * ct.col_tot AS VARCHAR) AS DOUBLE)
                * CAST(CAST(CAST(c.obs AS HUGEINT) * n.n
                            - r.row_tot * ct.col_tot AS VARCHAR) AS DOUBLE))
               / (CAST(CAST(n.n AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(r.row_tot AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(ct.col_tot AS VARCHAR) AS DOUBLE))
               * 1000000.0) AS BIGINT) AS micro
    FROM cells c
    JOIN rt r USING (event_type)
    JOIN ct USING (wd)
    CROSS JOIN nt n
),
s AS (
    SELECT (SELECT COUNT(*) FROM rt) AS n_types,
           (SELECT COUNT(*) FROM ct) AS n_days,
           (SELECT COALESCE(n, 0) FROM nt) AS n_events,
           (SELECT COUNT(*) FROM cells) AS n_cells,
           (SELECT SUM(micro) FROM contrib) AS chi2_micro
)
SELECT CAST(n_types AS BIGINT) AS n_types,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_cells AS BIGINT) AS n_cells,
       ROUND(CAST(COALESCE(chi2_micro, 0) AS DOUBLE) / 1000000.0, 6) AS chi2,
       CASE WHEN n_events = 0 OR n_types < 2 OR n_days < 2 THEN NULL
            ELSE ROUND(SQRT((CAST(COALESCE(chi2_micro, 0) AS DOUBLE) / 1000000.0)
                            / (CAST(n_events AS DOUBLE)
                               * CAST(LEAST(n_types - 1, n_days - 1) AS DOUBLE))), 6)
       END AS cramers_v
FROM s
"""


@register("dq_chi2_type_dow_independence", oracle=_CHI2_SQL)
def dq_chi2_type_dow_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    # Spark dayofweek == DuckDB dayofweek + 1 (Sun=1 vs Sun=0).
    cells = session_cache(
        load_table(spark, sf_dir, "events")
        .select(
            "event_type", (F.dayofweek(F.col("ts")) - 1).alias("wd")
        )
        .groupBy("event_type", "wd")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rt = cells.groupBy("event_type").agg(F.sum(d38(F.col("obs"))).alias("row_tot"))
    ct = cells.groupBy("wd").agg(F.sum(d38(F.col("obs"))).alias("col_tot"))
    nt = cells.agg(F.sum(d38(F.col("obs"))).alias("n"))
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    num = dd(
        (d38(F.col("obs")) * F.col("n") - F.col("row_tot") * F.col("col_tot"))
        .cast("decimal(38,0)")
    )
    micro = (
        F.round(
            num
            * num
            / (dd(F.col("n")) * dd(F.col("row_tot")) * dd(F.col("col_tot")))
            * F.lit(1000000.0)
        )
    ).cast("long")
    contrib = (
        cells.join(broadcast(rt), "event_type")  # [enum] per-type totals
        .join(broadcast(ct), "wd")  # [enum] 7-row dow totals
        .crossJoin(broadcast(nt))  # [1row] grand total
        .select(micro.alias("micro"))
    )
    s = (
        contrib.agg(F.sum("micro").alias("chi2_micro"))
        .crossJoin(broadcast(rt.agg(F.count(F.lit(1)).alias("n_types"))))
        .crossJoin(broadcast(ct.agg(F.count(F.lit(1)).alias("n_days"))))
        .crossJoin(
            broadcast(
                nt.select(
                    F.coalesce(F.col("n"), F.lit(0).cast("decimal(38,0)"))
                    .cast("long")
                    .alias("n_events")
                )
            )
        )
        .crossJoin(broadcast(cells.agg(F.count(F.lit(1)).alias("n_cells"))))
    )
    chi2z = F.coalesce(F.col("chi2_micro"), F.lit(0)).cast("double") / F.lit(
        1000000.0
    )
    return s.select(
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.round(chi2z, 6).alias("chi2"),
        F.when(
            (F.col("n_events") == 0)
            | (F.col("n_types") < 2)
            | (F.col("n_days") < 2),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.sqrt(
                    chi2z
                    / (
                        F.col("n_events").cast("double")
                        * F.least(
                            F.col("n_types") - 1, F.col("n_days") - 1
                        ).cast("double")
                    )
                ),
                6,
            )
        )
        .alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Price-ending uniformity (round 12) — the last-two-cent-digits audit
# behind fraud screens and psychological-pricing detection: synthetic
# or rounded data piles onto .00/.99 endings, organic data is near
# uniform over the 100 endings. The chi-square against uniform needs
# NO per-cell float sum: the expected count is N/100 for every cell,
# so chi2 = sum((100*obs - N)^2) / (100*N) — ONE ratio of exact
# 128-bit integers, crossing to double once. 100 TB: one hash
# aggregate to <=100 cells, one 1-row reduce.
# ---------------------------------------------------------------------------

_ENDING_SQL = """
WITH c AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 100
               AS ending
    FROM orders
),
obs AS (SELECT ending, COUNT(*) AS n FROM c GROUP BY ending),
t AS (SELECT SUM(n) AS total, COUNT(*) AS n_endings FROM obs),
num AS (
    SELECT SUM(CAST(100 * o.n - t.total AS HUGEINT)
               * CAST(100 * o.n - t.total AS HUGEINT)) AS sq
    FROM obs o, t
),
m AS (
    SELECT ending AS mode_ending, n AS mode_n FROM obs
    ORDER BY n DESC, ending ASC LIMIT 1
)
SELECT CAST(t.total AS BIGINT) AS n_orders,
       CAST(t.n_endings AS BIGINT) AS n_distinct_endings,
       CASE WHEN t.total = 0 THEN NULL
            ELSE ROUND(CAST(CAST(num.sq AS VARCHAR) AS DOUBLE)
                       / (100.0 * CAST(CAST(t.total AS VARCHAR) AS DOUBLE)), 6)
       END AS chi2_uniform,
       CAST(m.mode_ending AS BIGINT) AS mode_ending,
       CASE WHEN t.total = 0 THEN NULL
            ELSE ROUND(CAST(m.mode_n AS DOUBLE) / t.total, 6)
       END AS mode_share
FROM t, num, m
"""


@register("dq_price_ending_uniformity", oracle=_ENDING_SQL)
def dq_price_ending_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    obs = session_cache(
        load_table(spark, sf_dir, "orders")
        .select(
            (
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                )
                % 100
            ).alias("ending")
        )
        .groupBy("ending")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = obs.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_endings")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (
        obs.crossJoin(broadcast(t))  # [1row] totals
        .select(
            (d38(F.lit(100) * F.col("n") - F.col("total"))
             * d38(F.lit(100) * F.col("n") - F.col("total"))).alias("sq")
        )
        .agg(F.sum("sq").alias("sq"))
    )
    m = obs.orderBy(F.desc("n"), F.asc("ending")).limit(1).select(
        F.col("ending").alias("mode_ending"), F.col("n").alias("mode_n")
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        t.crossJoin(broadcast(num))  # [1row] numerator
        .crossJoin(broadcast(m))  # [topk] 1-row mode
        .select(
            F.col("total").cast("long").alias("n_orders"),
            F.col("n_endings").cast("long").alias("n_distinct_endings"),
            F.when(F.col("total") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    dd(F.col("sq")) / (F.lit(100.0) * dd(F.col("total"))), 6
                )
            )
            .alias("chi2_uniform"),
            F.col("mode_ending").cast("long").alias("mode_ending"),
            F.when(F.col("total") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(F.col("mode_n").cast("double") / F.col("total"), 6)
            )
            .alias("mode_share"),
        )
    )


# ---------------------------------------------------------------------------
# Filter-rule agreement: Cohen's kappa + McNemar (round 12) — the
# classifier-pair audit every curation pipeline needs before swapping
# one quality filter for another: do rule A (chars >= 200) and rule B
# (>= 40 whitespace tokens) agree beyond chance, and is their
# DISAGREEMENT symmetric? Kappa = (p_o - p_e) / (1 - p_e) from the
# 2x2 confusion counts; McNemar's chi2 = (b - c)^2 / (b + c) on the
# discordant cells decides whether switching rules shifts the pass
# rate. Every input is an integer count, so both statistics are one
# rational apiece — the only float ops are identical IEEE divides.
# 100 TB: one map-only pass over documents (two CASE flags), one
# 1-row reduce. Degenerate guards: pe = 1 (perfect chance agreement)
# and b + c = 0 (no discordance) -> NULL.
# ---------------------------------------------------------------------------

_KAPPA_CHARS = 200
_KAPPA_TOKENS = 40

_KAPPA_SQL = rf"""
WITH flags AS (
    SELECT CASE WHEN LENGTH(text) >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS a,
           CASE WHEN len(string_split_regex(TRIM(text), '\s+'))
                     >= {_KAPPA_TOKENS} THEN 1 ELSE 0 END AS b
    FROM documents
    WHERE text IS NOT NULL AND TRIM(text) <> ''
),
cm AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(CAST(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END AS HUGEINT)) AS n11,
           SUM(CAST(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END AS HUGEINT)) AS n10,
           SUM(CAST(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END AS HUGEINT)) AS n01,
           SUM(CAST(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END AS HUGEINT)) AS n00
    FROM flags
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(n11 AS BIGINT) AS n_both_pass,
       CAST(n10 AS BIGINT) AS n_only_chars,
       CAST(n01 AS BIGINT) AS n_only_tokens,
       CAST(n00 AS BIGINT) AS n_both_fail,
       CASE WHEN n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0
            THEN NULL
            ELSE ROUND(
                CAST(CAST(n * (n11 + n00)
                          - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                     AS VARCHAR) AS DOUBLE)
                / CAST(CAST(n * n
                            - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                       AS VARCHAR) AS DOUBLE), 6)
       END AS cohen_kappa,
       CASE WHEN n10 + n01 = 0 THEN NULL
            ELSE ROUND(
                CAST(CAST((n10 - n01) * (n10 - n01) AS VARCHAR) AS DOUBLE)
                / CAST(CAST(n10 + n01 AS VARCHAR) AS DOUBLE), 6)
       END AS mcnemar_chi2
FROM cm
"""


@register("dq_rule_agreement_kappa", oracle=_KAPPA_SQL)
def dq_rule_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    flags = docs.select(
        F.when(F.length("text") >= _KAPPA_CHARS, 1).otherwise(0).alias("a"),
        F.when(
            F.size(F.split(F.trim(F.col("text")), r"\s+")) >= _KAPPA_TOKENS, 1
        )
        .otherwise(0)
        .alias("b"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cm = flags.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(
            d38(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        ).alias("n11"),
        F.sum(
            d38(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        ).alias("n10"),
        F.sum(
            d38(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        ).alias("n01"),
        F.sum(
            d38(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        ).alias("n00"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    pe_num = (
        (d38(F.col("n11")) + F.col("n10")) * (d38(F.col("n11")) + F.col("n01"))
        + (d38(F.col("n01")) + F.col("n00"))
        * (d38(F.col("n10")) + F.col("n00"))
    ).cast("decimal(38,0)")
    kap_den = (d38(F.col("n")) * F.col("n") - pe_num).cast("decimal(38,0)")
    kap_num = (
        d38(F.col("n")) * (d38(F.col("n11")) + F.col("n00")) - pe_num
    ).cast("decimal(38,0)")
    disc = (d38(F.col("n10")) + F.col("n01")).cast("decimal(38,0)")
    mc_num = (
        (d38(F.col("n10")) - F.col("n01"))
        * (d38(F.col("n10")) - F.col("n01"))
    ).cast("decimal(38,0)")
    return cm.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n11").cast("long").alias("n_both_pass"),
        F.col("n10").cast("long").alias("n_only_chars"),
        F.col("n01").cast("long").alias("n_only_tokens"),
        F.col("n00").cast("long").alias("n_both_fail"),
        F.when(kap_den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dd(kap_num) / dd(kap_den), 6))
        .alias("cohen_kappa"),
        F.when(disc == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dd(mc_num) / dd(disc), 6))
        .alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# PSI + Jensen-Shannon drift (round 13) — the two industry-standard
# distribution-shift scores side by side over fixed price bands
# (20k-wide, capped at 20 — never data-proportional), early era
# (< 1995) vs late. PSI sums (p-q)ln(p/q) over bands BOTH eras
# populate (its textbook zero-bin blind spot, surfaced here as
# n_onesided_bands instead of hidden by an epsilon); JSD is finite by
# construction and covers every band. Determinism: each band's term is
# rounded to integer MICROS before the sum (the chi2/Cramér pattern) —
# the cross-engine float sum is over exact longs, with ONE final
# divide. 100 TB: one hash aggregate to <=20 cells, one 1-row reduce.
# ---------------------------------------------------------------------------

_PSI_BAND_W = 20_000.0
_PSI_BANDS = 19  # LEAST cap -> bands 0..19
_PSI_PIVOT = "1998-01-01"

_PSI_JSD_SQL = f"""
WITH c AS (
    SELECT LEAST(CAST(FLOOR(o_totalprice / {_PSI_BAND_W}) AS BIGINT),
                 {_PSI_BANDS}) AS band,
           CASE WHEN o_orderdate < DATE '{_PSI_PIVOT}' THEN 1 ELSE 0 END AS a
    FROM orders
),
cells AS (
    SELECT band, SUM(a) AS na, SUM(1 - a) AS nb FROM c GROUP BY band
),
t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM cells),
terms AS (
    SELECT
        CASE WHEN na > 0 AND nb > 0 THEN
            CAST(ROUND((CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)
                       * LN((CAST(na AS DOUBLE) / ta)
                            / (CAST(nb AS DOUBLE) / tb))
                       * 1000000) AS BIGINT)
        ELSE 0 END AS psi_u,
        CAST(ROUND((
            CASE WHEN na > 0 THEN (CAST(na AS DOUBLE) / ta)
                * LOG2(2.0 * (CAST(na AS DOUBLE) / ta)
                       / (CAST(na AS DOUBLE) / ta + CAST(nb AS DOUBLE) / tb))
            ELSE 0.0 END
          + CASE WHEN nb > 0 THEN (CAST(nb AS DOUBLE) / tb)
                * LOG2(2.0 * (CAST(nb AS DOUBLE) / tb)
                       / (CAST(na AS DOUBLE) / ta + CAST(nb AS DOUBLE) / tb))
            ELSE 0.0 END) * 500000) AS BIGINT) AS jsd_u,
        CASE WHEN na = 0 OR nb = 0 THEN 1 ELSE 0 END AS one_sided
    FROM cells, t
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_bands,
       CAST(SUM(one_sided) AS BIGINT) AS n_onesided_bands,
       CASE WHEN (SELECT ta FROM t) = 0 OR (SELECT tb FROM t) = 0
            THEN NULL ELSE ROUND(SUM(psi_u) / 1000000.0, 6) END AS psi,
       CASE WHEN (SELECT ta FROM t) = 0 OR (SELECT tb FROM t) = 0
            THEN NULL ELSE ROUND(SUM(jsd_u) / 1000000.0, 6) END AS jsd_bits
FROM terms
"""


@register("dq_psi_jsd_price_drift", oracle=_PSI_JSD_SQL)
def dq_psi_jsd_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    orders = load_table(spark, sf_dir, "orders")
    band = F.least(
        F.floor(F.col("o_totalprice") / F.lit(_PSI_BAND_W)).cast("long"),
        F.lit(_PSI_BANDS).cast("long"),
    )
    is_a = F.col("o_orderdate") < F.lit(_PSI_PIVOT).cast("date")
    cells = orders.groupBy(band.alias("band")).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(is_a, 0).otherwise(1)).cast("long").alias("nb"),
    )
    t = cells.agg(
        F.sum("na").cast("long").alias("ta"),
        F.sum("nb").cast("long").alias("tb"),
    )
    # try_divide: ANSI-mode sessions (the driver contract) raise on a
    # zero divisor even for doubles; a one-era frame must flow to the
    # NULL-guarded output instead.
    p = F.try_divide(F.col("na").cast("double"), F.col("ta"))
    q = F.try_divide(F.col("nb").cast("double"), F.col("tb"))
    psi_u = (
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.round((p - q) * F.log(p / q) * F.lit(1000000.0)),
        )
        .otherwise(0)
        .cast("long")
    )
    jsd_u = (
        F.round(
            (
                F.when(
                    F.col("na") > 0, p * F.log2(F.lit(2.0) * p / (p + q))
                ).otherwise(0.0)
                + F.when(
                    F.col("nb") > 0, q * F.log2(F.lit(2.0) * q / (p + q))
                ).otherwise(0.0)
            )
            * F.lit(500000.0)
        )
    ).cast("long")
    one_sided = F.when((F.col("na") == 0) | (F.col("nb") == 0), 1).otherwise(0)
    terms = cells.crossJoin(broadcast(t)).select(  # [1row] era totals
        psi_u.alias("psi_u"), jsd_u.alias("jsd_u"), one_sided.alias("os"),
        F.col("ta"), F.col("tb"),
    )
    degenerate = (F.min("ta") == 0) | (F.min("tb") == 0)
    out = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_bands"),
        F.sum("os").cast("long").alias("n_onesided_bands"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(F.sum("psi_u") / F.lit(1000000.0), 6))
        .alias("psi"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(F.sum("jsd_u") / F.lit(1000000.0), 6))
        .alias("jsd_bits"),
    )
    return out


# ---------------------------------------------------------------------------
# Key-space gap audit (round 13) — sequence-completeness DQ for a
# surrogate-key column: how much of [min,max] is unoccupied, where the
# largest hole is, and how many gap sites exist. Wholesale-missing id
# ranges are the classic symptom of a dropped ingest partition. The
# successor join rides the two-phase distributed rank (rank is unique,
# so the rank -> rank+1 equi-join is LINEAR — no window over the whole
# key space in one task). 100 TB: distinct + two-phase rank + one
# shuffle equi-join on rank.
# ---------------------------------------------------------------------------

_GAP_SQL = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
g AS (
    SELECT k, LEAD(k) OVER (ORDER BY k) - k AS gap FROM k
),
s AS (
    SELECT COUNT(*) AS n_keys, MIN(k) AS min_key, MAX(k) AS max_key
    FROM k
)
SELECT CAST(s.n_keys AS BIGINT) AS n_keys,
       CAST(s.min_key AS BIGINT) AS min_key,
       CAST(s.max_key AS BIGINT) AS max_key,
       CAST(s.max_key - s.min_key + 1 - s.n_keys AS BIGINT) AS n_missing,
       CAST((SELECT MAX(gap) FROM g) AS BIGINT) AS max_gap,
       CAST((SELECT SUM(CASE WHEN gap > 1 THEN 1 ELSE 0 END) FROM g)
           AS BIGINT) AS n_gap_sites
FROM s
"""


@register("dq_orderkey_gap_audit", oracle=_GAP_SQL)
def dq_orderkey_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    keys = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    ranked = two_phase_order(
        keys,
        [F.asc("k")],
        F.col("k"),
        rank_col="rk",
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    nxt = ranked.select(
        (F.col("rk") - 1).alias("rk"), F.col("k").alias("k_next")
    )
    gaps = ranked.join(nxt, "rk").select(
        (F.col("k_next") - F.col("k")).alias("gap")
    )
    gstats = gaps.agg(
        F.max("gap").cast("long").alias("max_gap"),
        F.sum(F.when(F.col("gap") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_gap_sites"),
    )
    s = keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
    )
    return s.crossJoin(broadcast(gstats)).select(  # [1row] gap stats
        "n_keys",
        "min_key",
        "max_key",
        (F.col("max_key") - F.col("min_key") + 1 - F.col("n_keys"))
        .cast("long")
        .alias("n_missing"),
        "max_gap",
        "n_gap_sites",
    )
