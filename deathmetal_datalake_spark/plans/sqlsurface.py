"""Wider SQL-surface coverage: pivot, percentiles, correlation from
exact sums, ordered array/string aggregation.

Determinism notes: percentiles interpolate over sorted values (no
summation — engine-independent); correlation is assembled in plain
double arithmetic from exact DECIMAL sums rather than calling corr()
(whose streaming accumulation is engine/order-dependent); ordered
collects fix the element order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.registry import register
from deathmetal_datalake_spark.sources.tables import load_table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_PIVOT_SQL = """
SELECT o_orderstatus AS status,
       {cols}
FROM orders
GROUP BY status
""".format(
    cols=",\n       ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS p{i + 1}"
        for i, p in enumerate(_PRIORITIES)
    )
)


@register("pivot_status_by_priority", oracle=_PIVOT_SQL)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    # pivot leaves NULL for absent cells; the CASE-sum oracle yields 0.
    renamed = pivoted.select(
        "status",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
            for i, p in enumerate(_PRIORITIES)
        ],
    )
    return renamed


_PCT_SQL = """
SELECT o_orderstatus AS status,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
FROM orders GROUP BY status
"""


@register("percentile_prices_by_status", oracle=_PCT_SQL)
def percentile_prices_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed exact per-group quantiles (round 9): the grouped
    # percentile() aggregate buffers each status's ENTIRE price column
    # in one task at the final merge — the few-huge-groups twin of the
    # unpartitioned-window class. Status is a bounded enum (3 values),
    # so exact_grouped_quantiles runs one two-phase selection per group.
    from deathmetal_datalake_spark.operators.ordering import exact_grouped_quantiles
    from deathmetal_datalake_spark.plans.registry import session_cache

    orders = session_cache(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderstatus").alias("status"), "o_totalprice"
        )
    )
    qs = exact_grouped_quantiles(
        orders, "status", F.col("o_totalprice"), [0.25, 0.50, 0.90]
    )
    return qs.groupBy("status").agg(
        *[
            F.round(F.max(F.when(F.col("frac") == f, F.col("q"))), 4).alias(a)
            for f, a in [(0.25, "p25"), (0.50, "p50"), (0.90, "p90")]
        ]
    )


# Pearson correlation assembled from exact decimal sums (deterministic
# across engines, unlike built-in corr()'s streaming accumulation).
_CORR_SQL = """
WITH sums AS (
    SELECT l_returnflag AS flag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy
    FROM lineitem GROUP BY flag
)
SELECT flag,
       n,
       ROUND((n * sxy - sx * sy) /
             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS qty_price_corr
FROM sums
"""


@register("corr_qty_price_by_flag", oracle=_CORR_SQL)
def corr_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    sums = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(24,6)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(18,6)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,6)")).cast("double").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return sums.select("flag", "n", F.round(corr, 6).alias("qty_price_corr"))


_ARRAY_AGG_SQL = """
SELECT n_name AS nation_name,
       (list(c_name ORDER BY c_name))[1:3] AS top_names,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY nation_name
"""


@register("array_agg_first_names", oracle=_ARRAY_AGG_SQL)
def array_agg_first_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 9: collect_list-then-slice buffered EVERY name per nation
    # in one aggregation buffer (data-proportional per group). The
    # rn <= 3 window compiles to WindowGroupLimit — each map task
    # forwards at most 3 names per nation before the shuffle — then
    # the list aggregate sees ≤ 3 rows per group. Ties on equal names
    # need no tie-break: the top-3 MULTISET is value-determined.
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = customer.join(nation, customer.c_nationkey == nation.n_nationkey).select(
        F.col("n_name").alias("nation_name"), "c_name"
    )
    w = Window.partitionBy("nation_name").orderBy("c_name")
    top3 = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("nation_name")
        .agg(F.array_sort(F.collect_list("c_name")).alias("top_names"))
    )
    counts = joined.groupBy("nation_name").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return counts.join(top3, "nation_name").select(
        "nation_name", "top_names", "n_customers"
    )


_STRING_AGG_SQL = """
SELECT c_mktsegment AS segment,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY segment
"""


@register("string_agg_statuses", oracle=_STRING_AGG_SQL)
def string_agg_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses")
    )


# ---------------------------------------------------------------------------
# Scalar-function batteries: broad string and datetime surface, each
# function cross-checked against DuckDB (convention differences mapped
# explicitly, e.g. dayofweek bases).
# ---------------------------------------------------------------------------

_STRINGS_SQL = """
SELECT p_partkey AS part_id,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LPAD(p_brand, 12, '*') AS brand_padded,
       REVERSE(p_type) AS type_rev,
       REPLACE(p_name, ' ', '-') AS name_dashed,
       split_part(p_name, ' ', 1) AS first_word,
       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
       translate(p_brand, '#', '_') AS brand_t,
       CONCAT_WS('/', p_brand, p_type) AS brand_type
FROM part
"""


@register("string_functions_showcase", oracle=_STRINGS_SQL)
def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_id"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("name_dashed"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.translate("p_brand", "#", "_").alias("brand_t"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


_DATES_SQL = """
SELECT o_orderkey AS order_id,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(day(o_orderdate) AS BIGINT) AS o_day,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS o_dow,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS days_to_y2k
FROM orders
"""


@register("date_functions_showcase", oracle=_DATES_SQL)
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.year(d).cast("long").alias("o_year"),
        F.month(d).cast("long").alias("o_month"),
        F.dayofmonth(d).cast("long").alias("o_day"),
        # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6.
        F.dayofweek(d).cast("long").alias("o_dow"),
        F.quarter(d).cast("long").alias("o_quarter"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'"), d).cast("long").alias(
            "days_to_y2k"
        ),
    )


# ---------------------------------------------------------------------------
# Higher-order array functions over token arrays: sort, distinct,
# slice, filter, transform — the Catalyst lambda-expression surface,
# checked element-by-element (arrays compare as ordered tuples).
# ---------------------------------------------------------------------------

_ARRAY_SQL = r"""
WITH tok AS (
    SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
    FROM documents
)
SELECT doc_id,
       list_sort(list_distinct(toks)) AS sorted_vocab,
       toks[1:5] AS first5,
       list_filter(toks, t -> LENGTH(t) >= 6) AS long_tokens,
       list_transform(toks[1:5], t -> LENGTH(t)) AS first5_lens,
       CAST(LENGTH(list_distinct(toks)) AS BIGINT) AS n_distinct
FROM tok
"""


@register("array_function_battery", oracle=_ARRAY_SQL)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    first5 = F.slice(toks, 1, 5)
    return docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(toks)).alias("sorted_vocab"),
        first5.alias("first5"),
        F.filter(toks, lambda t: F.length(t) >= 6).alias("long_tokens"),
        F.transform(first5, lambda t: F.length(t).cast("long")).alias("first5_lens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# Map-typed column surface: JSON props → MapType, then key/value/size
# ops. DuckDB 1.0 has no JSON→MAP cast, so the oracle rebuilds the same
# views from json_keys (sorted) + per-key extraction.
# ---------------------------------------------------------------------------

_MAP_FN_SQL = """
WITH kv AS (
    SELECT event_id, json_keys(props) AS ks, props FROM events
)
SELECT event_id,
       list_sort(ks) AS keys_sorted,
       list_transform(list_sort(ks), k -> CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS values_by_key,
       CAST(LENGTH(ks) AS BIGINT) AS map_size
FROM kv
"""


@register("map_function_battery", oracle=_MAP_FN_SQL)
def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    keys_sorted = F.array_sort(F.map_keys(m))
    return ev.select(
        "event_id",
        keys_sorted.alias("keys_sorted"),
        F.transform(keys_sorted, lambda k: F.element_at(m, k)).alias("values_by_key"),
        F.size(F.map_keys(m)).cast("long").alias("map_size"),
    )


# ---------------------------------------------------------------------------
# Null-handling semantics: coalesce / nullif / null-safe equality.
# Spark's <=> is SQL's IS NOT DISTINCT FROM; the oracle spells it out.
# ---------------------------------------------------------------------------

_NULLS_SQL = """
WITH x AS (
    SELECT o_orderkey AS order_id,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           o_totalprice
    FROM orders
)
SELECT order_id,
       status_or_null,
       COALESCE(status_or_null, 'OPEN') AS status_filled,
       (status_or_null IS NOT DISTINCT FROM NULL) AS is_open,
       CASE WHEN status_or_null IS NULL THEN 0.0 ELSE o_totalprice END AS closed_value
FROM x
"""


@register("null_semantics_battery", oracle=_NULLS_SQL)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.sources.tables import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    x = orders.select(
        F.col("o_orderkey").alias("order_id"),
        status_or_null.alias("status_or_null"),
        "o_totalprice",
    )
    return x.select(
        "order_id",
        "status_or_null",
        F.coalesce("status_or_null", F.lit("OPEN")).alias("status_filled"),
        F.col("status_or_null").eqNullSafe(F.lit(None).cast("string")).alias("is_open"),
        F.when(F.col("status_or_null").isNull(), F.lit(0.0))
        .otherwise(F.col("o_totalprice"))
        .alias("closed_value"),
    )


# ---------------------------------------------------------------------------
# Bag-semantics set operations (ALL variants preserve duplicates) and
# explicit NULL ordering. Spark sorts NULLS FIRST ascending by default
# while DuckDB defaults NULLS LAST — the query pins NULLS FIRST on both
# sides, the portable form.
# ---------------------------------------------------------------------------

_SETOP_ALL_SQL = """
WITH a AS (SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT o_custkey AS cust_id FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'except_all' AS op, cust_id, COUNT(*) AS n FROM (
    SELECT cust_id FROM a EXCEPT ALL SELECT cust_id FROM b
) GROUP BY cust_id
UNION ALL
SELECT 'intersect_all' AS op, cust_id, COUNT(*) AS n FROM (
    SELECT cust_id FROM a INTERSECT ALL SELECT cust_id FROM b
) GROUP BY cust_id
"""


@register("setop_bag_semantics", oracle=_SETOP_ALL_SQL)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("cust_id")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("cust_id")
    )
    ex = (
        a.exceptAll(b)
        .groupBy("cust_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "cust_id", "n")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("cust_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "cust_id", "n")
    )
    return ex.unionAll(inter)


_NULL_ORDER_SQL = """
SELECT o_orderkey AS order_id,
       NULLIF(o_orderstatus, 'O') AS status_or_null
FROM orders
ORDER BY status_or_null ASC NULLS FIRST, order_id ASC
LIMIT 50
"""


@register("sort_nulls_first_limit", oracle=_NULL_ORDER_SQL)
def sort_nulls_first_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        )
        .orderBy(F.col("status_or_null").asc_nulls_first(), F.asc("order_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Unpivot (melt): wide per-status priority counts back to long form —
# the inverse of pivot_status_by_priority, via DataFrame.unpivot.
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
WITH wide AS (
    SELECT o_orderstatus AS status,
           {cols}
    FROM orders
    GROUP BY status
)
SELECT status, prio_col, n_orders FROM wide
UNPIVOT (n_orders FOR prio_col IN ({collist}))
""".format(
    cols=",\n           ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS p{i + 1}"
        for i, p in enumerate(_PRIORITIES)
    ),
    collist=", ".join(f"p{i + 1}" for i in range(len(_PRIORITIES))),
)


@register("unpivot_status_priorities", oracle=_UNPIVOT_SQL)
def unpivot_status_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_status_by_priority(spark, sf_dir)
    return wide.unpivot(
        ["status"],
        [f"p{i + 1}" for i in range(len(_PRIORITIES))],
        "prio_col",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: each BUILDING-segment customer joined to
# its own top-2 orders by price (LATERAL ... ORDER BY ... LIMIT with
# deterministic tie-breaks). Exercises Spark's lateral-join
# decorrelation — the correlated per-row LIMIT becomes a ranked window
# under the hood, but the USER-facing surface is the SQL-standard
# LATERAL, which the reference's Trino engine also speaks.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c,
LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 2
) t
"""


@register("lateral_top2_orders_per_customer", oracle=_LATERAL_SQL)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# One SQL text, two engines: date_trunc + INTERVAL month arithmetic and
# the DECIMAL-sum idiom are in the Spark∩DuckDB common dialect, so the
# oracle runs the identical string.
_RECURSIVE_SQL = """
WITH RECURSIVE bounds AS (
    SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
           CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
    FROM orders
),
spine(month, hi) AS (
    -- The upper bound rides ALONG the recursion as a column: a scalar
    -- subquery in the recursive WHERE would re-scan the fact table on
    -- EVERY iteration (measured 18 s vs 2 s at 10x).
    SELECT lo, hi FROM bounds
    UNION ALL
    SELECT CAST(month + INTERVAL 1 MONTH AS DATE), hi FROM spine
    WHERE month < hi
)
SELECT s.month,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST((o.o_totalprice) AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM spine s
LEFT JOIN orders o
  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.month
GROUP BY s.month
"""


@register("sql_recursive_month_spine", oracle=_RECURSIVE_SQL)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the month spine
    between the data's own min and max order months — variable length,
    derived from the data, which a static sequence() literal can't claim
    — then LEFT JOIN so empty months still appear with n_orders = 0.

    Scale shape: the recursion builds a ~tens-of-rows spine driver-side
    (bounded by the calendar span, not the data volume; Spark's
    cteRecursionLevelLimit defaults to 100 levels — set it higher for
    century spines), then one broadcast-able join against the fact
    table. The 100 TB cost is the scan, exactly as it should be."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)
