"""Advanced relational coverage: more TPC-H shapes, cube/grouping,
richer window frames, JSON maps, n-gram frequencies, scalar subqueries.

Extends the reference surface (SURVEY.md §7.3 M4 "the fuller relational
surface the driver's oracle can check"). Same determinism conventions as
plans.registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from deathmetal_datalake_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from deathmetal_datalake_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# TPC-H q10: top-20 customers by returned-item revenue.
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c_custkey AS cust_id,
       c_name AS cust_name,
       n_name AS nation_name,
       {revenue}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY cust_id, cust_name, nation_name
ORDER BY revenue DESC, cust_id ASC
LIMIT 20
""".format(revenue=sql_dsum("l_extendedprice * (1 - l_discount)", "revenue"))


@register("tpch_q10_returned_items", oracle=_Q10_SQL)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    dates_ok = (
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'")
    ) & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-07-01 00:00:00'"))
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(dates_ok), li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("cust_id"))
        .limit(20)
        .select("cust_id", "cust_name", "nation_name", "revenue")
    )


# ---------------------------------------------------------------------------
# q12-shape: late shipments per order priority (90-day SLA).
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_late,
       {late_value}
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY priority
""".format(late_value=sql_dsum("l_extendedprice", "late_value"))


@register("late_shipments_by_priority", oracle=_Q12_SQL)
def late_shipments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_late"), dsum("l_extendedprice", "late_value")
    )


# ---------------------------------------------------------------------------
# q14-shape: promo revenue share (two exact decimal sums, one division).
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
"""


@register("promo_revenue_share", oracle=_Q14_SQL)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    joined = li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    ).join(part, li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("decimal(18,6)"))
    ).cast("double")
    total = F.sum(disc).cast("double")
    return joined.agg(F.round(100.0 * promo / total, 6).alias("promo_revenue_pct"))


# ---------------------------------------------------------------------------
# Brand sales: fact⨝dim aggregation with distinct counting.
# ---------------------------------------------------------------------------


@register(
    "brand_sales_stats",
    oracle="""
SELECT p_brand AS brand,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {qty},
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY brand
""".format(qty=sql_dsum("l_quantity", "total_qty")),
)
def brand_sales_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            dsum("l_quantity", "total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE over two dims (beyond the reference's flat group-bys).
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       {total}
FROM orders
GROUP BY CUBE (status, priority)
""".format(total=sql_dsum("o_totalprice", "total_price"))


@register("cube_orders_status_priority", oracle=_CUBE_SQL)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .cube("status", "priority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


# ---------------------------------------------------------------------------
# Window functions: dense_rank + ntile, moving average, first/last frames.
# ---------------------------------------------------------------------------

_RANKS_SQL = """
WITH stats AS (
    SELECT c_custkey AS cust_id,
           n_name AS nation_name,
           {avg_price}
    FROM orders JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY cust_id, nation_name
)
SELECT cust_id, nation_name, avg_price,
       DENSE_RANK() OVER (PARTITION BY nation_name ORDER BY avg_price DESC, cust_id ASC) AS drank,
       NTILE(4) OVER (PARTITION BY nation_name ORDER BY avg_price DESC, cust_id ASC) AS quartile
FROM stats
""".format(avg_price=sql_davg("o_totalprice", "avg_price"))


@register("window_dense_rank_ntile", oracle=_RANKS_SQL)
def window_dense_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).join(
        broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    )
    stats = joined.groupBy(
        F.col("c_custkey").alias("cust_id"), F.col("n_name").alias("nation_name")
    ).agg(davg("o_totalprice", "avg_price"))
    w = Window.partitionBy("nation_name").orderBy(F.desc("avg_price"), F.asc("cust_id"))
    return stats.select(
        "cust_id",
        "nation_name",
        "avg_price",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_MOVING_SQL = """
SELECT event_id,
       user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 6) AS moving_avg_3
FROM events
"""


@register("window_moving_average", oracle=_MOVING_SQL)
def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("moving_avg_3"),
    )


_FIRST_LAST_SQL = """
SELECT o_orderkey AS order_id,
       o_custkey AS cust_id,
       FIRST_VALUE(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS first_price,
       LAST_VALUE(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_price
FROM orders
"""


@register("window_first_last", oracle=_FIRST_LAST_SQL)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("cust_id"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


# ---------------------------------------------------------------------------
# Set op: UNION (dedup) across two projections.
# ---------------------------------------------------------------------------


@register(
    "setop_union_key_space",
    oracle="""
SELECT c_custkey AS key_id, 'customer' AS src FROM customer WHERE c_acctbal > 0
UNION
SELECT o_custkey AS key_id, 'orders' AS src FROM orders WHERE o_orderstatus = 'O'
""",
)
def setop_union_key_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("key_id"), F.lit("customer").alias("src")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key_id"), F.lit("orders").alias("src")
    )
    return a.union(b).dropDuplicates()


# ---------------------------------------------------------------------------
# JSON → MapType: explode keys of the props document.
# ---------------------------------------------------------------------------

_JSON_MAP_SQL = """
WITH kv AS (
    SELECT UNNEST(json_keys(props)) AS prop_key, props FROM events
)
SELECT prop_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS sum_int_value
FROM kv GROUP BY prop_key
"""


@register("events_props_map_explode", oracle=_JSON_MAP_SQL)
def events_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exploded = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("prop_key", "v")
    )
    return exploded.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("v").alias("sum_int_value")
    )


# ---------------------------------------------------------------------------
# N-gram frequency: global top-20 word bigrams over documents.
# ---------------------------------------------------------------------------

_BIGRAM_SQL = r"""
WITH tok AS (
    SELECT string_split_regex(LOWER(TRIM(text)), '\s+') AS toks FROM documents
),
grams AS (
    SELECT UNNEST(list_transform(
        range(1, LENGTH(toks)),
        i -> toks[i] || ' ' || toks[i+1]
    )) AS bigram
    FROM tok
)
SELECT bigram, COUNT(*) AS freq
FROM grams GROUP BY bigram
ORDER BY freq DESC, bigram ASC
LIMIT 20
"""


@register("text_top_bigrams", oracle=_BIGRAM_SQL)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # Single-token docs contribute no bigrams: unguarded, Spark
    # sequence(1, 0) descends and element_at(toks, 0) aborts the job
    # (round-8 degenerate-corpus find — the r7 bigram-lift guard was
    # missing here). DuckDB's end-exclusive range() is already empty.
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Scalar subquery: customers above the (deterministic) global mean.
# ---------------------------------------------------------------------------

_ABOVE_AVG_SQL = """
SELECT c_custkey AS cust_id, c_acctbal AS acctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) FROM customer
)
"""


@register("subquery_above_avg_balance", oracle=_ABOVE_AVG_SQL)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    mean = customer.agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_bal"
        )
    )
    return (
        customer.crossJoin(broadcast(mean))
        .filter(F.col("c_acctbal") > F.col("mean_bal"))
        .select(F.col("c_custkey").alias("cust_id"), F.col("c_acctbal").alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Histogram: document length distribution in 200-char buckets.
# ---------------------------------------------------------------------------


@register(
    "doc_length_histogram",
    oracle="""
SELECT CAST(FLOOR(LENGTH(text) / 200) * 200 AS BIGINT) AS bucket_start,
       COUNT(*) AS n_docs
FROM documents GROUP BY bucket_start
""",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.floor(F.length("text") / 200) * 200).cast("long")
    return docs.groupBy(bucket.alias("bucket_start")).agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# TPC-H q4: priority checking via correlated EXISTS (late lineitems).
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority AS priority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY priority
"""


@register("tpch_q4_priority_checking", oracle=_Q4_SQL)
def tpch_q4_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    in_range = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
    )
    # Correlated EXISTS with an extra predicate = left_semi on a
    # two-condition join (equi key + range) — Catalyst plans the range
    # part as a join residual.
    matched = in_range.join(
        li,
        (in_range.o_orderkey == li.l_orderkey) & (li.l_shipdate > in_range.o_orderdate),
        "left_semi",
    )
    return matched.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# TPC-H q13: customer order-count distribution (histogram of counts).
# ---------------------------------------------------------------------------

_Q13_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", oracle=_Q13_SQL)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H q18: large-volume customers (HAVING over a grouped sum, joined
# back to the parents).
# ---------------------------------------------------------------------------

_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 250
)
SELECT c_custkey AS cust_id,
       c_name AS cust_name,
       o_orderkey AS order_id,
       o_totalprice AS total_price,
       {qty}
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON lineitem.l_orderkey = o_orderkey
GROUP BY cust_id, cust_name, order_id, total_price
ORDER BY total_price DESC, order_id ASC
LIMIT 50
""".format(qty=sql_dsum("l_quantity", "total_qty"))


@register("tpch_q18_large_volume", oracle=_Q18_SQL)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(li.alias("li2"), F.col("li2.l_orderkey") == orders.o_orderkey)
    )
    return (
        joined.groupBy(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
        )
        .agg(dsum(F.col("li2.l_quantity"), "total_qty"))
        .orderBy(F.desc("total_price"), F.asc("order_id"))
        .limit(50)
        .select("cust_id", "cust_name", "order_id", "total_price", "total_qty")
    )


# ---------------------------------------------------------------------------
# TPC-H q7: volume between two trading nations, split by year.
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, {revenue}
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
""".format(revenue=sql_dsum("volume", "revenue"))


@register("tpch_q7_nation_volume", oracle=_Q7_SQL)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    joined = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            ((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
        )
    )
    return joined.groupBy(
        F.col("n1.n_name").alias("supp_nation"),
        F.col("n2.n_name").alias("cust_nation"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


# ---------------------------------------------------------------------------
# TPC-H q15: top supplier(s) by revenue — view + max-match (subquery
# against an aggregate, exact decimal so the max comparison is safe).
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue_view AS (
    SELECT l_suppkey AS supplier_no, {rev}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY supplier_no
)
SELECT s_suppkey AS supp_id, s_name AS supp_name, total_revenue
FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue_view)
""".format(rev=sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue"))


@register("tpch_q15_top_supplier", oracle=_Q15_SQL)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select(
            F.col("s_suppkey").alias("supp_id"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q19: discounted revenue under OR-of-ANDs predicates (tests
# complex predicate pushdown / CNF handling).
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT {revenue}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""".format(revenue=sql_dsum("l_extendedprice * (1 - l_discount)", "revenue"))


@register("tpch_q19_discounted_revenue", oracle=_Q19_SQL)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (independent marginals in one pass — distinct
# from rollup/cube above).
# ---------------------------------------------------------------------------

_GSETS_SQL = """
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       {total}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""".format(total=sql_dsum("o_totalprice", "total_price"))


@register("grouping_sets_marginals", oracle=_GSETS_SQL)
def grouping_sets_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Spark 4 DataFrame.groupingSets — no temp view, no session-state
    # mutation (a shared catalog name would collide across sessions).
    renamed = orders.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return renamed.groupingSets(
        [[F.col("status")], [F.col("priority")]], "status", "priority"
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))


# ---------------------------------------------------------------------------
# Distribution-rank battery: percent_rank / cume_dist / nth_value — the
# remaining analytic window functions. All outputs are ratios of exact
# integers ((rank-1)/(n-1), peers/n), so double division is
# bit-identical across engines; nth_value uses the default frame pinned
# explicitly to RANGE UNBOUNDED PRECEDING..CURRENT ROW in both.
# ---------------------------------------------------------------------------

_PCTRANK_SQL = """
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       NTH_VALUE(o_orderkey, 2) OVER (
           PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


@register("window_rank_battery", oracle=_PCTRANK_SQL)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_rows).alias("second_cheapest"),
    )
