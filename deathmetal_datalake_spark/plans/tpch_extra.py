"""The remaining TPC-H query shapes: q2/q8/q9/q11/q16/q17/q20/q21/q22.

The driver's star schema has no ``partsupp``, ``c_phone``,
``l_commitdate``/``l_receiptdate`` columns, so the queries that
canonically need them (q2, q9, q11, q16, q20, q21, q22) are re-expressed
over the ``lineitem`` bridge with the *shape* preserved — correlated
scalar subquery with aggregate (q2, q17), two-level conditional share
(q8), computed-profit rollup (q9), nested-agg HAVING against a global
scalar (q11), NOT IN anti-subquery with COUNT DISTINCT (q16), nested IN
with agg-HAVING (q20), EXISTS/NOT EXISTS correlation on sibling rows
(q21), and scalar-subquery threshold + anti join (q22). Reference
parity: the reference's Trino layer exposes the same star schema for
ad-hoc SQL (``scripts/trino_create_tables.sql``), so these are the
query shapes its users run.

Determinism follows ``plans.registry``: decimal-cast sums, double
division only on identically-derived operands, unique tie-break keys on
every LIMIT.

Scale notes (100 TB): every aggregate here is a partial-agg shuffle on
a high-cardinality key; the only broadcasts are bounded dims
(nation/region) and 1-row scalar frames. q2/q17's per-part correlation
uses a window/self-agg on the partkey shuffle rather than a correlated
re-scan; q21 is expressed as one groupBy over lineitem plus joins,
not a per-row EXISTS probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from deathmetal_datalake_spark.plans.registry import (
    dsum,
    register,
    sql_dsum,
)
from deathmetal_datalake_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# q2: minimum-cost supplier per part (correlated scalar subquery w/ MIN).
# Cost proxy: the cheapest observed unit price of that (part, supplier)
# in lineitem. Double division is bit-identical across engines.
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH supply AS (
    SELECT l_partkey AS p, l_suppkey AS s,
           MIN(l_extendedprice / l_quantity) AS cost
    FROM lineitem GROUP BY p, s
),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT p_partkey AS part_id, p_type AS part_type, s_name AS supp_name,
       n_name AS nation_name, s_acctbal AS acctbal, cost AS min_cost
FROM part
JOIN supply ON supply.p = p_partkey
JOIN eu ON eu.s_suppkey = supply.s
WHERE p_size BETWEEN 10 AND 20
  AND cost = (
      SELECT MIN(s2.cost) FROM supply s2
      JOIN eu e2 ON e2.s_suppkey = s2.s
      WHERE s2.p = p_partkey
  )
ORDER BY acctbal DESC, part_id ASC, supp_name ASC
LIMIT 100
"""


@register("tpch_q2_min_cost_supplier", oracle=_Q2_SQL)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supply = li.groupBy(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    eu = (
        supplier.join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(broadcast(region.filter(F.col("r_name") == "EUROPE")),
              nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        part.filter(F.col("p_size").between(10, 20))
        .join(supply, supply.p == part.p_partkey)
        .join(eu, eu.s_suppkey == supply.s)
    )
    # The correlated MIN is a window over the partkey partition — one
    # shuffle, no re-scan of the subquery per outer row.
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mc", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("mc"))
        .select(
            F.col("p_partkey").alias("part_id"),
            F.col("p_type").alias("part_type"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            F.col("s_acctbal").alias("acctbal"),
            F.col("cost").alias("min_cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("part_id"), F.asc("supp_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q8: national market share — two-level aggregate, conditional share of
# an exact decimal sum, double division only at the end.
# ---------------------------------------------------------------------------

_Q8_SQL = """
WITH vol AS (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
)
SELECT o_year,
       ROUND(
         CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM vol GROUP BY o_year
"""


@register("tpch_q8_market_share", oracle=_Q8_SQL)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("n1.n_regionkey") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(n2), supplier.s_nationkey == F.col("n2.n_nationkey"))
        .join(part.filter(F.col("p_type") == "ECONOMY"), li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q9: profit by nation and year. Without ps_supplycost the cost leg is a
# deterministic retail-margin proxy: p_retailprice * l_quantity * 0.01
# (1 dp × integer-valued × 2 dp = exact at scale 6).
# ---------------------------------------------------------------------------

_Q9_SQL = """
SELECT n_name AS nation_name,
       EXTRACT(year FROM o_orderdate) AS o_year,
       {profit}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%gear%'
GROUP BY nation_name, o_year
""".format(
    profit=sql_dsum(
        "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01",
        "sum_profit",
    )
)


@register("tpch_q9_profit_by_nation", oracle=_Q9_SQL)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.01)
    return (
        li.join(part.filter(F.col("p_name").like("%gear%")), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
    )


# ---------------------------------------------------------------------------
# q11: important parts — nested-agg HAVING against a global scalar.
# Part value proxy: sum of l_extendedprice * l_quantity shipped by
# suppliers of the nation subset. The global total is the same exact
# decimal sum over the same base rows (never a sum of per-group doubles).
# ---------------------------------------------------------------------------

_Q11_SQL = """
WITH base AS (
    SELECT l_partkey, CAST(l_extendedprice * l_quantity AS DECIMAL(18,6)) AS v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
)
SELECT l_partkey AS part_id,
       CAST(SUM(v) AS DOUBLE) AS part_value
FROM base
GROUP BY part_id
HAVING CAST(SUM(v) AS DOUBLE) >
       (SELECT CAST(SUM(v) AS DOUBLE) FROM base) * 0.001
"""


@register("tpch_q11_important_parts", oracle=_Q11_SQL)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nations = ["NATION_1", "NATION_2", "NATION_3"]
    base = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(broadcast(nation.filter(F.col("n_name").isin(nations))),
              supplier.s_nationkey == nation.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)").alias("v"),
        )
    )
    per_part = base.groupBy(F.col("l_partkey").alias("part_id")).agg(
        F.sum("v").cast("double").alias("part_value")
    )
    total = base.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("part_id", "part_value")
    )


# ---------------------------------------------------------------------------
# q16: supplier counts per part attribute — NOT IN anti-subquery plus
# COUNT DISTINCT over the lineitem bridge.
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand AS brand, p_size AS size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (5, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY brand, size
"""


@register("tpch_q16_supplier_part_counts", oracle=_Q16_SQL)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts_ok = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([5, 10, 15, 20, 25, 30])
    )
    return (
        li.join(parts_ok, li.l_partkey == parts_ok.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue — correlated per-part average.
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH brand_li AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3'
),
pa AS (
    SELECT l_partkey AS p,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM brand_li GROUP BY p
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 4)
           AS avg_yearly
FROM brand_li JOIN pa ON pa.p = l_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


@register("tpch_q17_small_qty_revenue", oracle=_Q17_SQL)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_li = li.join(
        part.filter(F.col("p_brand") == "Brand#3"), li.l_partkey == part.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    # Correlated AVG as a window over the partkey partition: one shuffle.
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        brand_li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 4
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q20: part promotion — nested IN subquery with agg-HAVING: suppliers
# who moved real volume of the promoted parts in 1996.
# ---------------------------------------------------------------------------

_Q20_SQL = """
SELECT s_name AS supp_name, n_name AS nation_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey IN (0, 1)
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 60
  )
ORDER BY supp_name
"""


@register("tpch_q20_part_promotion", oracle=_Q20_SQL)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red = part.filter(F.col("p_name").like("%red%"))
    window_ok = (
        F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'")
    ) & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    movers = (
        li.filter(window_ok)
        .join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(broadcast(nation.filter(F.col("n_regionkey").isin([0, 1]))),
                      supplier.s_nationkey == nation.n_nationkey)
        .join(movers, supplier.s_suppkey == movers.l_suppkey, "left_semi")
        .select(F.col("s_name").alias("supp_name"), F.col("n_name").alias("nation_name"))
        .orderBy("supp_name")
    )


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — the EXISTS / NOT EXISTS
# sibling-row correlation, re-expressed as one aggregation over the
# order's lineitems (no per-row re-probe of the fact):  on finished
# multi-supplier orders, the supplier who alone shipped last.
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH last AS (
    SELECT l_orderkey, MAX(l_shipdate) AS maxship
    FROM lineitem GROUP BY l_orderkey
)
SELECT s_name AS supp_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN last ON last.l_orderkey = l1.l_orderkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate = maxship
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate = maxship
  )
GROUP BY supp_name
ORDER BY numwait DESC, supp_name ASC
LIMIT 100
"""


@register("tpch_q21_waiting_supplier", oracle=_Q21_SQL)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    # One shuffle of lineitem total: the per-order annotations (max
    # shipdate, distinct-supplier count) are windows over the orderkey
    # partition, and the follow-up groupBy reuses that partitioning —
    # measurably faster than the groupBy+re-join shape (one lineitem
    # shuffle instead of two; ~45% at sf0.1). Suppliers per order is
    # bounded (~4-7), so the collect_set window state is O(1) per row.
    w = Window.partitionBy("l_orderkey")
    ann = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("maxship", F.max("l_shipdate").over(w))
        .withColumn("nsupp", F.size(F.collect_set("l_suppkey").over(w)))
    )
    last_rows = (
        ann.filter(F.col("l_shipdate") == F.col("maxship"))
        .groupBy("l_orderkey", "nsupp")
        .agg(
            F.countDistinct("l_suppkey").alias("nlast"),
            F.max("l_suppkey").alias("last_supp"),
        )
    )
    waiting = (
        last_rows.filter((F.col("nsupp") > 1) & (F.col("nlast") == 1))
        .join(orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
              last_rows.l_orderkey == F.col("o_orderkey"), "left_semi")
    )
    return (
        waiting.join(supplier, waiting.last_supp == supplier.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supp_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q22: global sales opportunity — scalar-subquery threshold (average
# positive balance) + anti join on recent orders, grouped by segment.
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS ab
    FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment AS segment,
       COUNT(*) AS numcust,
       {total}
FROM customer, avg_bal
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c_acctbal > ab
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY segment
""".format(total=sql_dsum("c_acctbal", "totacctbal"))


@register("tpch_q22_sales_opportunity", oracle=_Q22_SQL)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)))
        .alias("ab")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'")
    ).select("o_custkey")
    return (
        customer.filter(
            F.col("c_mktsegment").isin(["AUTOMOBILE", "BUILDING", "MACHINERY"])
        )
        .crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q12: shipping-mode line counts — conditional two-bucket counts per
# categorical, gated on a lateness predicate. The driver schema has no
# l_shipmode/l_commitdate/l_receiptdate, so the shape is preserved with
# l_returnflag as the mode axis (restricted to two values, as the
# canonical query binds two modes) and "shipped more than 60 days after
# the order date" as the lateness condition (commit < receipt analog).
# Reference parity: scripts/trino_create_tables.sql exposes the same
# star schema for exactly this class of ad-hoc ops query.
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'N')
  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ship_class
ORDER BY ship_class
"""


@register("tpch_q12_shipmode_priority", oracle=_Q12_SQL)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # Both date bounds on l_shipdate push to the parquet scan; the
    # lateness predicate (column-vs-column) applies post-join. One
    # shuffle on orderkey, then a partial-agg shuffle on the 2-value
    # mode axis.
    lines = li.filter(
        F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    joined = lines.join(orders, lines.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# q14: promotion revenue share — conditional share of an exact decimal
# sum over a one-year ship window (p_type carries the promo axis
# directly in the driver schema; the canonical LIKE 'PROMO%' reduces to
# equality on its single-token types). Double division only at the end,
# per the q8 convention.
# ---------------------------------------------------------------------------

_Q14_SQL = """
WITH joined AS (
    SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
           p_type
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT ROUND(
         100.0 * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN volume
                                    ELSE CAST(0 AS DECIMAL(18,6)) END)
                      AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE), 6) AS promo_revenue_pct
FROM joined
"""
# Both decimal sums take the VARCHAR round-trip before the DOUBLE cast
# (registry.sql_dsum convention): DuckDB's direct decimal128 → double
# cast stops being correctly rounded once the unscaled sum crosses
# 2^53, which a year of lineitem revenue does at larger scales.


@register("tpch_q14_promo_effect", oracle=_Q14_SQL)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # part is scale-proportional: no pinned broadcast (AQE broadcasts it
    # at small SF, falls back to a shuffle join at the 100 TB point).
    vol = (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("volume"),
            "p_type",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return vol.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").like("PROMO%"), F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )
