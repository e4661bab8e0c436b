"""Event-stream analytics over the ``events`` table.

The reference's only streaming semantics are micro-batch buffering and
per-entity partitioning (SURVEY.md §2.7); watermarked event-time windows
are the mandated extension (§7.3 M4). These are the *batch* versions of
those windows — the Structured Streaming versions live in
``deathmetal_datalake_spark/streaming/`` and share the same window
logic; batch form keeps them DuckDB-oracle-checkable.

Timestamps: events.ts is parquet TIMESTAMP(NANOS); the loader rebuilds
it as TIMESTAMP_NTZ at micro precision, identical to DuckDB's
CAST(ts AS TIMESTAMP). All window arithmetic is tz-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.registry import (
    davg,
    dsum,
    hash60,
    register,
    session_cache,
    sql_davg,
    sql_dsum,
    sql_hash60,
)
from deathmetal_datalake_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Tumbling event-time window (5 minutes), aligned to the unix epoch —
# F.window() and the epoch-bucket arithmetic in DuckDB agree on
# boundaries.
# ---------------------------------------------------------------------------

_TUMBLING_SQL = """
SELECT make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 * 1000000 AS BIGINT)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sum_value},
       {avg_value}
FROM events
GROUP BY window_start, event_type
""".format(
    sum_value=sql_dsum("value", "sum_value"),
    avg_value=sql_davg("value", "avg_value"),
)


@register("events_tumbling_5min", oracle=_TUMBLING_SQL)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
            davg("value", "avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding window (10 min window, 5 min slide): each event lands in two
# buckets. Oracle replicates by unioning the two phase-shifted tumbling
# assignments.
# ---------------------------------------------------------------------------

_SLIDING_SQL = """
WITH assigned AS (
    SELECT make_timestamp(CAST((FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 300) - g.off) * 300 * 1000000 AS BIGINT)) AS window_start,
           value
    FROM events, (SELECT UNNEST([0, 1]) AS off) g
)
SELECT window_start,
       COUNT(*) AS n_events,
       {sum_value}
FROM assigned
GROUP BY window_start
""".format(sum_value=sql_dsum("value", "sum_value"))


@register("events_sliding_10min_5min", oracle=_SLIDING_SQL)
def events_sliding_10min_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Session windows (30-minute inactivity gap) per user. Spark's
# session_window ends at last_event + gap; we emit session_start,
# last_ts, and count, which the lag/cumsum oracle reproduces exactly.
# ---------------------------------------------------------------------------

_SESSION_SQL = """
WITH flagged AS (
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (
                    PARTITION BY user_id ORDER BY ts
                ) >= INTERVAL 30 MINUTE THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_no
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS last_ts,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
"""


@register("events_sessionization_30min", oracle=_SESSION_SQL)
def events_sessionization_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_ts", "n_events")
    )


# ---------------------------------------------------------------------------
# JSON props extraction (events.props is a JSON string → MapType path;
# FIXTURES.md §B).
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT CAST(props->>'k' AS BIGINT) AS k,
       COUNT(*) AS n_events,
       {sum_value}
FROM events
GROUP BY k
""".format(sum_value=sql_dsum("value", "sum_value"))


@register("events_json_props_agg", oracle=_JSON_SQL)
def events_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# Exact distinct + lag-delta window.
# ---------------------------------------------------------------------------


@register(
    "events_distinct_users_per_type",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def events_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


_LAG_SQL = """
SELECT event_id,
       user_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS value_delta,
       CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
FROM events
"""


_LAG_GAP_SQL = """
SELECT event_id,
       user_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS value_delta,
       date_diff('microsecond',
                 LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 CAST(ts AS TIMESTAMP)) AS gap_micros
FROM events
"""


@register("events_lag_delta", oracle=_LAG_GAP_SQL)
def events_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    with_prev = ev.withColumn("__prev", F.lag("ts").over(w)).withColumn(
        "__prev_value", F.lag("value").over(w)
    )
    return with_prev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.col("__prev_value"), 6).alias("value_delta"),
        # timestampdiff over TIMESTAMP_NTZ operands — timezone-free.
        F.expr("timestampdiff(MICROSECOND, __prev, ts)").alias("gap_micros"),
    )


@register(
    "events_lag_value_delta",
    oracle="""
SELECT event_id,
       user_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS value_delta
FROM events
""",
)
def events_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


# Approximate distinct via a PORTABLE KMV (k-minimum-values) sketch:
# native HLL implementations differ across engines (so Spark's builtin
# estimate can never be value-checked — events_approx_distinct_error
# pins its ±5% accuracy contract instead), but KMV over the engine's
# shared 60-bit md5 hash is bit-for-bit reproducible in SQL, making the
# ESTIMATE itself exactly oracle-checkable. Estimator: with k distinct
# minimum hash values and kth = the k-th smallest (uniform on [0, 2^60)),
# distinct ≈ (k-1) / (kth / 2^60); fewer than k distinct values
# degenerates to the exact count. Both branches are two IEEE double ops
# (one exactly-representable product, one division), so the rounded
# value is engine-identical — no float sums, no transcendentals.
#
# Scale shape: dropDuplicates(event_type, hv) partial-aggregates
# map-side, and Catalyst rewrites the rn<=k window into WindowGroupLimit
# (rank-limit pushdown), so each task forwards at most k hashes per
# group — the few-groups partitionBy never sees the full key stream.
_KMV_K = 128
_TWO_60 = float(1 << 60)

_APPROX_KMV_SQL = f"""
WITH h AS (
    SELECT DISTINCT event_type,
           {sql_hash60('CAST(user_id AS VARCHAR)')} AS hv
    FROM events
),
r AS (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
),
tk AS (
    SELECT event_type, COUNT(*) AS cnt, MAX(hv) AS kth
    FROM r WHERE rn <= {_KMV_K} GROUP BY event_type
)
SELECT event_type,
       CAST(CASE WHEN cnt < {_KMV_K} THEN cnt
                 ELSE ROUND({_KMV_K - 1}.0 * {1 << 60}.0 / kth, 0)
            END AS BIGINT) AS approx_users
FROM tk
"""


@register("events_approx_distinct_users", oracle=_APPROX_KMV_SQL)
def events_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", hash60(F.col("user_id").cast("string")).alias("hv")
    ).dropDuplicates(["event_type", "hv"])
    w = Window.partitionBy("event_type").orderBy("hv")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    agg = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("hv").alias("kth")
    )
    est = F.when(F.col("cnt") < _KMV_K, F.col("cnt").cast("double")).otherwise(
        F.round(
            F.lit(float(_KMV_K - 1) * _TWO_60) / F.col("kth").cast("double"), 0
        )
    )
    return agg.select("event_type", est.cast("long").alias("approx_users"))


# ---------------------------------------------------------------------------
# Interval join: view→purchase attribution (last view by the same user
# within the 30 minutes preceding each purchase). The equi part
# (user_id) carries the join; the time range is a join residual —
# the shape Spark executes as a sort-merge join with range condition,
# and Structured Streaming as a watermarked stream-stream join.
# ---------------------------------------------------------------------------

_ATTRIBUTION_SQL = """
WITH purchases AS (
    SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value
    FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
    FROM events WHERE event_type = 'view'
),
matched AS (
    SELECT p.purchase_id, p.user_id, p.value, v.view_id,
           ROW_NUMBER() OVER (
               PARTITION BY p.purchase_id ORDER BY v.vts DESC, v.view_id ASC
           ) AS rn
    FROM purchases p JOIN views v
      ON p.user_id = v.user_id
     AND v.vts <= p.pts
     AND v.vts > p.pts - INTERVAL 30 MINUTE
)
SELECT purchase_id, user_id, value, view_id AS attributed_view_id
FROM matched WHERE rn = 1
"""


@register("events_view_purchase_attribution", oracle=_ATTRIBUTION_SQL)
def events_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("pts"),
        F.col("value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("vts"),
    )
    joined = purchases.join(
        views,
        (purchases.user_id == views.v_user_id)
        & (views.vts <= purchases.pts)
        & (views.vts > purchases.pts - F.expr("INTERVAL 30 MINUTE")),
    )
    w = Window.partitionBy("purchase_id").orderBy(F.desc("vts"), F.asc("view_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "value", F.col("view_id").alias("attributed_view_id"))
    )


# ---------------------------------------------------------------------------
# Funnel: earliest view → first click after it → first purchase after
# that, per user. Sequential-dependency aggregation (each stage's
# filter depends on the previous stage's timestamp).
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS first_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.first_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.first_click
    GROUP BY e.user_id
)
SELECT v.user_id,
       v.first_view,
       c.first_click,
       p.first_purchase,
       (c.first_click IS NOT NULL AND p.first_purchase IS NOT NULL) AS funnel_complete
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


@register("events_funnel_view_click_purchase", oracle=_FUNNEL_SQL)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            (F.col("first_click").isNotNull() & F.col("first_purchase").isNotNull()).alias(
                "funnel_complete"
            ),
        )
    )


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the latest click at-or-before its
# timestamp, per user. Spark has no native ASOF JOIN; the scalable
# expression is the union-sort-carry trick — tag both sides, one window
# sort per user, carry the last click timestamp forward. One shuffle on
# user_id, no range explosion, no per-row probe: the shape that holds
# when both sides are billions of rows. (A DuckDB ASOF JOIN would be the
# oracle shortcut; the window formulation below pins identical
# tie-break semantics in both engines instead.)
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
    FROM events WHERE event_type IN ('click', 'purchase')
),
ann AS (
    SELECT user_id, ts, event_id, kind,
           MAX(CASE WHEN kind = 0 THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS asof_click_ts
    FROM tagged
)
SELECT event_id, user_id, ts AS purchase_ts, asof_click_ts
FROM ann WHERE kind = 1
"""


@register("events_asof_click_before_purchase", oracle=_ASOF_SQL)
def events_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin(["click", "purchase"])).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    # Clicks sort before purchases at equal ts (kind ASC), so a click at
    # exactly the purchase timestamp counts as "at-or-before"; event_id
    # makes the frame deterministic under full ties.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("kind"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ann = tagged.withColumn(
        "asof_click_ts",
        F.max(F.when(F.col("kind") == 0, F.col("ts"))).over(w),
    )
    return ann.filter(F.col("kind") == 1).select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), "asof_click_ts"
    )


# ---------------------------------------------------------------------------
# SCD-2 interval derivation: each user's event_type acts as a mutable
# attribute; collapse the event log into validity intervals
# [valid_from, valid_to) per state, NULL valid_to = current state. One
# window per user (lag to detect changes, lead to close intervals) —
# the standard change-data-capture → slowly-changing-dimension rollup.
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH changes AS (
    SELECT user_id, event_type AS state, ts,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_state,
           event_id
    FROM events
),
starts AS (
    SELECT user_id, state, ts AS valid_from, event_id
    FROM changes
    WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, event_id
       ) AS valid_to
FROM starts
"""


@register("events_user_state_scd2", oracle=_SCD2_SQL)
def events_user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(w_ev).alias("prev_state"),
    )
    starts = changes.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    ).select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    w_start = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return starts.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_start).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# Range join: classify facts into value bands from a bounded band
# dimension via a non-equi join. The band table is tiny by construction
# (bands are a config artifact), so the right plan is a broadcast
# nested-loop with the band predicate — no shuffle of the fact, and the
# fact side streams through whole-stage codegen.
# ---------------------------------------------------------------------------

_BANDS = [(0.0, 50.0, "low"), (50.0, 200.0, "mid"), (200.0, 1e9, "high")]

_RANGE_JOIN_SQL = """
WITH bands(lo, hi, band) AS (
    VALUES {values}
)
SELECT band,
       COUNT(*) AS n_events,
       {sum_value}
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
""".format(
    values=", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _BANDS),
    sum_value=sql_dsum("value", "sum_value"),
)


@register("events_value_band_rollup", oracle=_RANGE_JOIN_SQL)
def events_value_band_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, ["lo", "hi", "band"])
    from pyspark.sql.functions import broadcast

    joined = ev.join(
        broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous-aggregate rollup: one pass over the event
# stream producing three time granularities (5 min / 1 hour / 1 day)
# via GROUPING SETS — the multi-resolution rollup a time-series store
# materializes, computed as a single Expand + partial-agg shuffle
# rather than three scans.
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
WITH bucketed AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 * 1000000 AS BIGINT)) AS b5,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b1h,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS b1d,
           value
    FROM events
)
SELECT b5, b1h, b1d,
       COUNT(*) AS n_events,
       {sum_value}
FROM bucketed
GROUP BY GROUPING SETS ((b5), (b1h), (b1d))
""".format(sum_value=sql_dsum("value", "sum_value"))


@register("events_multi_granularity_rollup", oracle=_ROLLUP_SQL)
def events_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Only one F.window() is allowed per projection; hour/day buckets use
    # date_trunc, which agrees with DuckDB on naive timestamps.
    bucketed = ev.select(
        F.window("ts", "5 minutes").start.alias("b5"),
        F.date_trunc("hour", F.col("ts")).alias("b1h"),
        F.date_trunc("day", F.col("ts")).alias("b1d"),
        "value",
    )
    return bucketed.groupingSets(
        [[F.col("b5")], [F.col("b1h")], [F.col("b1d")]], "b5", "b1h", "b1d"
    ).agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))


# ---------------------------------------------------------------------------
# RANGE frame: trailing 1-hour per-user aggregate at every event —
# value-based window frames (vs the ROWS frames elsewhere). Both sides
# order by integer epoch seconds so the frame boundary arithmetic is
# identical; peers at the same timestamp are all included, which RANGE
# (unlike ROWS) defines unambiguously in both engines.
# ---------------------------------------------------------------------------

_RANGE_1H_SQL = """
WITH e AS (
    SELECT event_id, user_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec, value
    FROM events
)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
FROM e
WINDOW w AS (
    PARTITION BY user_id ORDER BY sec
    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
"""


@register("events_trailing_1h_range_frame", oracle=_RANGE_1H_SQL)
def events_trailing_1h_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Floor to whole epoch seconds tz-free (TIMESTAMP_NTZ has no direct
    # long cast); both engines then frame on identical integer values.
    e = ev.select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week; for each
# (cohort, week offset) the count of still-active users — the retention
# triangle every product-analytics stack computes. Two shuffles (first
# touch per user, distinct user-week activity) + one join on user_id;
# all date arithmetic is integer day counts, exact in both engines.
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS event_week
    FROM events
)
SELECT f.cohort_week,
       CAST(DATEDIFF('day', f.cohort_week, a.event_week) // 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN firsts f USING (user_id)
GROUP BY f.cohort_week, week_offset
"""


@register("events_cohort_retention", oracle=_COHORT_SQL)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("event_week")
    ).distinct()
    offset = F.floor(
        F.datediff(F.col("event_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Deterministic cardinality SKETCH with an exact oracle: hash-rate
# sampling (keep a user iff hash60(user) mod R == 0, estimate = sampled
# distinct × R) — the engine-portable complement to the HLL query
# above, which stays rows-only because HLL internals differ across
# engines. This sketch is (a) mergeable: the sampled-distinct sets
# union across partitions/days exactly like any distinct, and (b)
# bit-for-bit reproducible from SQL, so the driver gate can verify an
# *approximation* exactly — including its per-group relative error,
# since the exact distinct rides along in the same scan.
# Scale: the sampled distinct shuffles ~1/R of the key space; R trades
# accuracy for shuffle width with a closed-form error (~1/sqrt(n/R)).
# ---------------------------------------------------------------------------

_CARD_RATE = 16

_SAMPLED_CARD_SQL = f"""
WITH per_type AS (
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(DISTINCT CASE WHEN {sql_hash60("'card:' || CAST(user_id AS VARCHAR)")} % {_CARD_RATE} = 0
                               THEN user_id END) * {_CARD_RATE} AS est_users
    FROM events
    GROUP BY event_type
)
SELECT event_type, exact_users, CAST(est_users AS BIGINT) AS est_users,
       ROUND(ABS(CAST(est_users AS DOUBLE) - exact_users) / exact_users, 6) AS rel_err
FROM per_type
"""


@register("events_sampled_cardinality", oracle=_SAMPLED_CARD_SQL)
def events_sampled_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = hash60(F.concat(F.lit("card:"), F.col("user_id").cast("string")))
    sampled_user = F.when(h % _CARD_RATE == 0, F.col("user_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            (F.countDistinct(sampled_user) * _CARD_RATE).alias("est_users"),
        )
        .select(
            "event_type",
            "exact_users",
            "est_users",
            F.round(
                F.abs(F.col("est_users").cast("double") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# GAP-FILLED time series: 5-minute windows over the FULL [min, max]
# range with empty windows materialized as zero rows — the gap-filling
# every dashboard/forecasting consumer needs (a plain GROUP BY silently
# omits empty buckets). Spark-first shape: the window spine is ONE
# sequence() explode from a 1-row min/max aggregate (no recursion, no
# driver loop), left-joined to the per-window counts; at 100 TB the
# spine stays O(#windows) and the join is broadcast-able from either
# side. Oracle: DuckDB generate_series.
# ---------------------------------------------------------------------------

_GAPFILL_SQL = """
WITH bounds AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(MIN(CAST(ts AS TIMESTAMP))) / 300) * 300 * 1000000 AS BIGINT)) AS lo,
           make_timestamp(CAST(FLOOR(epoch(MAX(CAST(ts AS TIMESTAMP))) / 300) * 300 * 1000000 AS BIGINT)) AS hi
    FROM events
),
spine AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS window_start FROM bounds
),
agg AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 * 1000000 AS BIGINT)) AS window_start,
           COUNT(*) AS n_events
    FROM events GROUP BY window_start
)
SELECT s.window_start,
       COALESCE(a.n_events, 0) AS n_events,
       (a.window_start IS NULL) AS is_gap
FROM spine s LEFT JOIN agg a ON s.window_start = a.window_start
"""


@register("events_gap_filled_5min", oracle=_GAPFILL_SQL)
def events_gap_filled_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes").start
    bounds = ev.agg(
        F.min(win).alias("lo"), F.max(win).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
        ).alias("window_start")
    )
    agg = ev.groupBy(win.alias("window_start")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    a = agg.select(
        F.col("window_start").alias("a_ws"), F.col("n_events").alias("a_n")
    )
    return spine.join(a, spine["window_start"] == a["a_ws"], "left").select(
        "window_start",
        F.coalesce("a_n", F.lit(0)).alias("n_events"),
        F.col("a_ws").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# LOCF (last-observation-carried-forward) over the gap-filled series:
# empty windows inherit the most recent observed window aggregate — the
# standard imputation for downstream consumers that cannot handle holes
# (forecasting features, rate-of-change). One ordered window with
# IGNORE NULLS last_value; the spine keeps it O(#windows).
# ---------------------------------------------------------------------------

_LOCF_SQL = """
WITH bounds AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(MIN(CAST(ts AS TIMESTAMP))) / 300) * 300 * 1000000 AS BIGINT)) AS lo,
           make_timestamp(CAST(FLOOR(epoch(MAX(CAST(ts AS TIMESTAMP))) / 300) * 300 * 1000000 AS BIGINT)) AS hi
    FROM events
),
spine AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS window_start FROM bounds
),
agg AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 * 1000000 AS BIGINT)) AS window_start,
           {sum_value}
    FROM events GROUP BY window_start
),
joined AS (
    SELECT s.window_start, a.sum_value
    FROM spine s LEFT JOIN agg a ON s.window_start = a.window_start
)
SELECT window_start,
       sum_value,
       last_value(sum_value IGNORE NULLS) OVER (
           ORDER BY window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_value
FROM joined
""".format(sum_value=sql_dsum("value", "sum_value"))


@register("events_gap_filled_locf", oracle=_LOCF_SQL)
def events_gap_filled_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes").start
    bounds = ev.agg(F.min(win).alias("lo"), F.max(win).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))).alias(
            "window_start"
        )
    )
    agg = ev.groupBy(win.alias("a_ws")).agg(dsum("value", "a_sum"))
    joined = spine.join(agg, spine["window_start"] == F.col("a_ws"), "left")
    # Deliberately UN-partitioned window: the carry is a global ordered
    # scan of the SPINE, whose row count is #windows (time-range bound,
    # independent of data volume) — the one case a single-task window
    # is O(small) by construction. Per-key LOCF would partition by key.
    w = (
        Window.orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "window_start",
        F.col("a_sum").alias("sum_value"),
        F.last("a_sum", ignorenulls=True).over(w).alias("locf_value"),
    )


# ---------------------------------------------------------------------------
# PER-KEY LOCF: hourly per-user series over each user's OWN active
# range, gaps carried forward per user — the partitioned form of
# imputation (the global-spine variant above is the single-series
# case). The spine is row-local: one sequence() per user from a
# groupBy bounds aggregate, so spine size is Σ user-ranges and the
# carry window is PARTITIONED BY user — shuffle-parallel at any key
# cardinality, the shape per-entity feature pipelines need at 100 TB.
# ---------------------------------------------------------------------------

_LOCF_USER_SQL = """
WITH bounds AS (
    SELECT user_id,
           make_timestamp(CAST(FLOOR(epoch(MIN(CAST(ts AS TIMESTAMP))) / 3600) * 3600 * 1000000 AS BIGINT)) AS lo,
           make_timestamp(CAST(FLOOR(epoch(MAX(CAST(ts AS TIMESTAMP))) / 3600) * 3600 * 1000000 AS BIGINT)) AS hi
    FROM events GROUP BY user_id
),
spine AS (
    SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start
    FROM bounds
),
agg AS (
    SELECT user_id,
           make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 * 1000000 AS BIGINT)) AS window_start,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id, window_start
)
SELECT s.user_id, s.window_start,
       COALESCE(a.n_events, 0) AS n_events,
       last_value(a.n_events IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.window_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_events
FROM spine s LEFT JOIN agg a
  ON s.user_id = a.user_id AND s.window_start = a.window_start
"""


@register("events_per_user_locf_hourly", oracle=_LOCF_USER_SQL)
def events_per_user_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour").start
    bounds = ev.groupBy("user_id").agg(
        F.min(win).alias("lo"), F.max(win).alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "window_start"
        ),
    )
    agg = ev.groupBy(
        F.col("user_id").alias("a_uid"), win.alias("a_ws")
    ).agg(F.count(F.lit(1)).alias("a_n"))
    joined = spine.join(
        agg,
        (spine["user_id"] == F.col("a_uid")) & (spine["window_start"] == F.col("a_ws")),
        "left",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "window_start",
        F.coalesce("a_n", F.lit(0)).alias("n_events"),
        F.last("a_n", ignorenulls=True).over(w).alias("locf_events"),
    )


# ---------------------------------------------------------------------------
# Trailing z-score anomaly detection: each event's value scored against
# its user's previous 10 events (frame EXCLUDES the current row — the
# standard online-anomaly formulation: never score a point against
# itself). Cross-engine determinism: the frame's sum and sum-of-squares
# go through DECIMAL (exact for the 2-decimal fixture values), mean and
# variance are derived from those exact sums in double, and IEEE sqrt
# is correctly rounded — so the rounded z-scores match bit-for-bit.
# Scale shape: one shuffle on user_id, per-user frames stream in order;
# no self-join, no state beyond the 10-row frame.
# ---------------------------------------------------------------------------

_ZSCORE_MIN_N = 5

_ZSCORE_SQL = f"""
WITH framed AS (
    SELECT event_id, user_id, value,
           COUNT(*) OVER fr AS trail_n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER fr AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                OVER fr AS DOUBLE) AS s2
    FROM events
    WINDOW fr AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
    )
)
SELECT event_id, user_id, value, trail_n,
       ROUND(s1 / trail_n, 6) AS trail_mean,
       ROUND((value - s1 / trail_n)
             / sqrt((s2 - s1 * s1 / trail_n) / (trail_n - 1)), 6) AS zscore
FROM framed
WHERE trail_n >= {_ZSCORE_MIN_N} AND s2 - s1 * s1 / trail_n > 0
"""


@register("events_trailing_zscore", oracle=_ZSCORE_SQL)
def events_trailing_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    dec = F.col("value").cast("decimal(18,6)")
    framed = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(fr).alias("trail_n"),
        F.sum(dec).over(fr).cast("double").alias("s1"),
        F.sum(dec * dec).over(fr).cast("double").alias("s2"),
    )
    n = F.col("trail_n")
    mean = F.col("s1") / n
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
    return framed.filter(
        (n >= _ZSCORE_MIN_N) & (F.col("s2") - F.col("s1") * F.col("s1") / n > 0)
    ).select(
        "event_id",
        "user_id",
        "value",
        "trail_n",
        F.round(mean, 6).alias("trail_mean"),
        F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("zscore"),
    )


# Companion with an EXACT oracle: the HLL estimate itself is
# engine-specific (hence rows-only above), but its accuracy CONTRACT is
# checkable — per group, the rsd=0.01 estimate must land within ±5%
# (~5 sigma) of the exact count. The Spark side computes both the
# sketch and the exact distinct and emits the verdict; the oracle pins
# the exact count and a literal TRUE, so an out-of-band sketch fails
# the driver's hash gate. Same design as events_sampled_cardinality.
_APPROX_ERR_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
"""


@register("events_approx_distinct_error", oracle=_APPROX_ERR_SQL)
def events_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx_users") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Salted hot-key rollup: the skew-mitigation operator
# (operators/skew.salted_aggregate) as an oracle-checked catalog entry.
# A per-user rollup where one user holds a disproportionate share of a
# 100 TB fact would hot-spot a single reducer under a plain groupBy;
# the salted two-phase plan spreads each key over n_salts partial
# aggregates and merges — semantics IDENTICAL to the direct groupBy,
# which is exactly what the oracle pins (count is salt-invariant;
# the value sum goes through decimal so partial-merge order can't
# perturb the result).
# ---------------------------------------------------------------------------

_SALTED_SQL = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'total_value')},
       MAX(value) AS max_value
FROM events
GROUP BY user_id
"""


@register("events_salted_user_rollup", oracle=_SALTED_SQL)
def events_salted_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.operators.skew import salted_aggregate

    events = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,6)")
    )
    out = salted_aggregate(
        events,
        keys=["user_id"],
        aggs={
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value_dec"),
            "max_value": ("max", "value"),
        },
        n_salts=16,
    )
    return out.select(
        "user_id",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        "max_value",
    )


# ---------------------------------------------------------------------------
# Online EWMA smoothing (alpha = 1/2, 4-tap truncation): the standard
# per-entity exponential smoother for telemetry/anomaly baselines,
# expressed so both engines agree BIT-FOR-BIT: the weights 1, 0.5,
# 0.25, 0.125 are exact binary fractions, the taps go through
# DECIMAL(18,6) (values are 2-decimal, products at the 3-decimal
# weights stay within scale 6 — exact), and the final normalization is
# one double division of identical exact operands. Truncating the
# (infinite) EWMA recursion to 4 taps bounds per-row state, keeps the
# operator a pure window expression (no recursion), and renormalizes
# at sequence starts where fewer taps exist.
#
# Scale shape: one window over (user_id; ts) — the same single
# repartition-by-entity every per-user operator here shares; no second
# shuffle, no state beyond 3 lags.
# ---------------------------------------------------------------------------

_EWMA_SQL = """
WITH lagged AS (
    SELECT event_id, user_id, ts,
           CAST(value AS DECIMAL(18,6)) AS v0,
           LAG(CAST(value AS DECIMAL(18,6)), 1) OVER w AS v1,
           LAG(CAST(value AS DECIMAL(18,6)), 2) OVER w AS v2,
           LAG(CAST(value AS DECIMAL(18,6)), 3) OVER w AS v3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST((v0 + COALESCE(v1, 0) * 0.5 + COALESCE(v2, 0) * 0.25
             + COALESCE(v3, 0) * 0.125) AS DOUBLE)
       / CAST((1.0 + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                   + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                   + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END) AS DOUBLE)
           AS ewma_value
FROM lagged
"""


@register("events_ewma_smoothed", oracle=_EWMA_SQL)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    dec = F.col("value").cast("decimal(18,6)")
    lagged = ev.select(
        "event_id",
        "user_id",
        dec.alias("v0"),
        F.lag(dec, 1).over(w).alias("v1"),
        F.lag(dec, 2).over(w).alias("v2"),
        F.lag(dec, 3).over(w).alias("v3"),
    )
    num = (
        F.col("v0")
        + F.coalesce(F.col("v1"), F.lit(0).cast("decimal(18,6)")) * F.lit("0.5").cast("decimal(2,1)")
        + F.coalesce(F.col("v2"), F.lit(0).cast("decimal(18,6)")) * F.lit("0.25").cast("decimal(3,2)")
        + F.coalesce(F.col("v3"), F.lit(0).cast("decimal(18,6)")) * F.lit("0.125").cast("decimal(4,3)")
    )
    den = (
        F.lit(1.0)
        + F.when(F.col("v1").isNull(), 0.0).otherwise(0.5)
        + F.when(F.col("v2").isNull(), 0.0).otherwise(0.25)
        + F.when(F.col("v3").isNull(), 0.0).otherwise(0.125)
    )
    return lagged.select(
        "event_id",
        "user_id",
        (num.cast("double") / den.cast("double")).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch over per-user event frequencies: the mergeable
# FREQUENCY sketch (the KMV/HLL entries cover cardinality) — d=2 hash
# rows x w=1024 counters, engine-portable md5 positions, estimate =
# min over rows of the addressed counter. CMS guarantees
# estimate >= exact (collisions only ever ADD), and the query audits
# that contract exactly: per user, exact count, sketch estimate, and
# the (always non-negative) overestimate. At 100 TB the sketch build
# is one (row, position) rollup — 2,048 counters total regardless of
# key cardinality — and estimation is a broadcast join; this is the
# heavy-hitter / frequency-cap primitive that never shuffles the key
# space.
#
# The width is deliberately FIXED (unlike the auto-scaled jaccard DF
# cap / bloom m): CMS's guarantee is RELATIVE — overestimate <= (e/w)·N
# with probability 1-exp(-d) for total stream count N — so a fixed w
# keeps the same relative error at every scale by design; there is no
# pre-saturation blowup regime to guard against. Tightening absolute
# error is a caller-side ε choice (w = e/ε), not a corpus-size
# function.
# ---------------------------------------------------------------------------

_CMS_D = 2
_CMS_W = 1024

_CMS_POS = sql_hash60("CAST(user_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
_CMS_SQL = f"""
WITH cells AS (
    SELECT j, {_CMS_POS} % {_CMS_W} AS pos, COUNT(*) AS c
    FROM events, (VALUES (0), (1)) AS rows_(j)
    GROUP BY 1, 2
),
users AS (
    SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id
),
probes AS (
    SELECT u.user_id, u.n_exact, cl.c
    FROM (SELECT user_id, n_exact, j, {_CMS_POS} % {_CMS_W} AS pos
          FROM users, (VALUES (0), (1)) AS rows_(j)) u
    JOIN cells cl ON u.j = cl.j AND u.pos = cl.pos
)
SELECT user_id,
       n_exact,
       MIN(c) AS n_est,
       MIN(c) - n_exact AS overestimate
FROM probes
GROUP BY user_id, n_exact
"""


@register("events_countmin_user_freq", oracle=_CMS_SQL)
def events_countmin_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")

    def pos(j: int):
        return F.pmod(
            hash60(F.concat(F.col("user_id").cast("string"), F.lit(f":{j}"))),
            F.lit(_CMS_W),
        )

    # Sketch build: explode each event into its d cells, one tiny rollup.
    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), pos(j).alias("pos"))
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.j", "cell.pos")
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = users.select(
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), pos(j).alias("pos"))
                    for j in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("user_id", "n_exact", "cell.j", "cell.pos")
    est = probes.join(broadcast(cells), ["j", "pos"]).groupBy("user_id", "n_exact").agg(
        F.min("c").alias("n_est")
    )
    return est.select(
        "user_id",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Hash-sampled quantile audit (round 6) — the quantile sibling of
# events_sampled_cardinality: per event type, the EXACT p50/p90 of
# `value` against the p50/p90 of a DETERMINISTIC hash sample
# (hash60(event_id) % rate == 0 — reproducible in any engine, unlike
# random sampling or Spark's approx_percentile whose result depends on
# partitioning). Quantile = k-th smallest with k = ceil(p·n) (the
# discrete lower quantile): NO interpolation arithmetic, so both
# engines pick the identical stored 2-decimal value and equality is
# bit-exact.
#
# Scale role: the exact side is the AUDIT baseline (a per-group sort —
# affordable offline, not something you run on 100 TB hourly); the
# production path is the sampled side, whose input is rate× smaller.
# This op exists to CALIBRATE the rate: the emitted abs/rel errors are
# themselves oracle-checked, so a rate change that degrades quantile
# fidelity shows up as data, not vibes.
# ---------------------------------------------------------------------------

_QS_RATE = 4  # keep 1/4 of events — deterministic by event-id hash

_SAMPLED_QUANTILE_SQL = f"""
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
exact_q AS (
    SELECT event_type, MAX(n) AS n,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END) AS exact_p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END) AS exact_p90
    FROM ranked GROUP BY event_type
),
sranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
    WHERE {sql_hash60("'q:' || CAST(event_id AS VARCHAR)")} % {_QS_RATE} = 0
),
sample_q AS (
    SELECT event_type, MAX(n) AS n_sampled,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END) AS est_p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END) AS est_p90
    FROM sranked GROUP BY event_type
)
SELECT e.event_type,
       e.n, s.n_sampled,
       e.exact_p50, s.est_p50,
       ROUND(ABS(s.est_p50 - e.exact_p50), 6) AS abs_err_p50,
       e.exact_p90, s.est_p90,
       ROUND(ABS(s.est_p90 - e.exact_p90), 6) AS abs_err_p90
FROM exact_q e LEFT JOIN sample_q s USING (event_type)
"""


def _discrete_quantiles(ev: DataFrame, label_n: str, l50: str, l90: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
            F.col("value"),
        )
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias(label_n),
        pick(0.5).alias(l50),
        pick(0.9).alias(l90),
    )


@register("events_sampled_quantile_error", oracle=_SAMPLED_QUANTILE_SQL)
def events_sampled_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    exact = _discrete_quantiles(ev, "n", "exact_p50", "exact_p90")
    h = hash60(F.concat(F.lit("q:"), F.col("event_id").cast("string")))
    sample = _discrete_quantiles(
        ev.filter(h % _QS_RATE == 0), "n_sampled", "est_p50", "est_p90"
    )
    return exact.join(sample, "event_type", "left").select(
        "event_type",
        "n",
        "n_sampled",
        "exact_p50",
        "est_p50",
        F.round(F.abs(F.col("est_p50") - F.col("exact_p50")), 6).alias("abs_err_p50"),
        "exact_p90",
        "est_p90",
        F.round(F.abs(F.col("est_p90") - F.col("exact_p90")), 6).alias("abs_err_p90"),
    )


# ---------------------------------------------------------------------------
# Batch interval-overlap join via bin bucketing — the range-join
# pattern Spark lacks as a primitive: derive "hot" 30-minute view
# windows (count ≥ threshold), pad them ±5 minutes into real intervals
# that are NOT bin-aligned, then join purchase events falling inside
# any interval. A naive range join is a BroadcastNestedLoopJoin over
# points × intervals; the scalable form maps each interval to the 1–2
# fixed-width bins it touches (explode(sequence(...))) and each point
# to its bin, turning the join into an EQUI-join on bin plus a cheap
# residual range filter — the standard bin-bucketed range-join rewrite
# (cf. Databricks' range-join optimization). Oracle: the plain range
# predicate join, so the rewrite itself is correctness-checked.
#
# Scale notes (100 TB): the interval side grows with TIME SPAN, not
# event density (one row per 30-min window over the corpus's history —
# ~18k/year), so it stays broadcastable; the point scan is linear with
# an equi-join key, no shuffle of the big side beyond the final
# bounded-key aggregate. Residual comparisons are exact integer
# seconds in both engines.
# ---------------------------------------------------------------------------

_IVAL_WIN = 1800     # 30-minute hot windows
_IVAL_PAD = 300      # ±5-minute interval padding (breaks bin alignment)
_IVAL_MIN_VIEWS = 4  # hot threshold

_IVAL_SQL = f"""
WITH ev AS (
    SELECT event_type, user_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
hot AS (
    SELECT CAST(FLOOR(sec / {_IVAL_WIN}) * {_IVAL_WIN} AS BIGINT) AS wstart,
           COUNT(*) AS n_view
    FROM ev WHERE event_type = 'view'
    GROUP BY 1 HAVING COUNT(*) >= {_IVAL_MIN_VIEWS}
),
iv AS (
    SELECT wstart, n_view,
           wstart - {_IVAL_PAD} AS lo,
           wstart + {_IVAL_WIN} + {_IVAL_PAD} AS hi
    FROM hot
),
p AS (SELECT user_id, sec FROM ev WHERE event_type = 'purchase')
SELECT make_timestamp(wstart * 1000000) AS window_start,
       CAST(n_view AS BIGINT) AS n_view,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
FROM iv JOIN p ON p.sec >= iv.lo AND p.sec < iv.hi
GROUP BY wstart, n_view
"""


@register("events_interval_overlap_join", oracle=_IVAL_SQL)
def events_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    hot = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            (F.floor(F.col("sec") / _IVAL_WIN) * _IVAL_WIN).cast("long").alias("wstart")
        )
        .agg(F.count(F.lit(1)).alias("n_view"))
        .filter(F.col("n_view") >= _IVAL_MIN_VIEWS)
    )
    iv = hot.select(
        "wstart",
        "n_view",
        (F.col("wstart") - _IVAL_PAD).alias("lo"),
        (F.col("wstart") + _IVAL_WIN + _IVAL_PAD).alias("hi"),
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _IVAL_WIN).cast("long"),
                F.floor((F.col("hi") - 1) / _IVAL_WIN).cast("long"),
            )
        ),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "sec", F.floor(F.col("sec") / _IVAL_WIN).cast("long").alias("bin")
    )
    joined = p.join(
        broadcast(iv),
        (p["bin"] == iv["bin"]) & (F.col("sec") >= F.col("lo")) & (F.col("sec") < F.col("hi")),
    )
    return joined.groupBy("wstart", "n_view").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.countDistinct("user_id").cast("long").alias("n_buyers"),
    ).select(
        F.expr(
            "timestampadd(SECOND, wstart, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("window_start"),
        F.col("n_view").cast("long").alias("n_view"),
        "n_purchases",
        "n_buyers",
    )


# ---------------------------------------------------------------------------
# Session-relative feature extraction — the per-event features a
# behavioral model trains on: which session the event belongs to
# (30-minute inactivity gap, same rule as events_sessionization_30min),
# its position within the session, seconds since the session started,
# and the session's total length. Sessionization-as-aggregate answers
# "how many sessions"; this is the row-level twin that keeps every
# event and annotates it, the shape a feature store materializes.
#
# Scale notes: one shuffle on user_id; every window (lag, running
# session counter, min/count over session) shares the same
# partitioning, so Catalyst evaluates them in a single Window stage
# chain without re-shuffling. All arithmetic is exact integer seconds;
# ordering ties broken by the unique event_id.
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800

_SESSFEAT_SQL = f"""
WITH e AS (
    SELECT event_id, user_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
g AS (
    SELECT *, CASE WHEN LAG(sec) OVER w IS NULL
                     OR sec - LAG(sec) OVER w > {_SESSION_GAP_S}
                   THEN 1 ELSE 0 END AS is_start
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
s AS (
    SELECT *, SUM(is_start) OVER (
        PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_seq FROM g
)
SELECT event_id, user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id, session_seq ORDER BY sec, event_id
       ) AS BIGINT) AS pos_in_session,
       CAST(sec - MIN(sec) OVER (PARTITION BY user_id, session_seq) AS BIGINT)
           AS secs_into_session,
       CAST(COUNT(*) OVER (PARTITION BY user_id, session_seq) AS BIGINT)
           AS n_in_session
FROM s
"""


@register("events_session_features", oracle=_SESSFEAT_SQL)
def events_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = e.withColumn(
        "is_start",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > _SESSION_GAP_S),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy("sec", "event_id")
    wsa = Window.partitionBy("user_id", "session_seq")
    return s.select(
        "event_id",
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.row_number().over(ws).cast("long").alias("pos_in_session"),
        (F.col("sec") - F.min("sec").over(wsa)).cast("long").alias("secs_into_session"),
        F.count(F.lit(1)).over(wsa).cast("long").alias("n_in_session"),
    )


# ---------------------------------------------------------------------------
# Top-k per time window — the "trending items per hour" shape every
# analytics stack materializes: hourly counts per event type, ranked
# within the hour, top 3 kept. Spark rewrites the rank-filter into
# WindowGroupLimit, so each shuffle partition truncates to 3 rows
# before the final exchange — the plan property that makes per-window
# top-k safe at any cardinality of the ranked dimension.
# ---------------------------------------------------------------------------

_HOURLY_TOP_SQL = """
WITH h AS (
    SELECT make_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 * 1000000 AS BIGINT)) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
)
SELECT hour_start, event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY hour_start ORDER BY n_events DESC, event_type ASC
    ) AS rnk FROM h
) WHERE rnk <= 3
"""


@register("events_hourly_top_types", oracle=_HOURLY_TOP_SQL)
def events_hourly_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    w = Window.partitionBy("w").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        h.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_users",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Bitmap-rollup exact distinct counting — the roaring-bitmap pattern
# (Spark 3.5's bitmap_* functions): user ids are bucketed into 32k-bit
# bitmap segments, each (day, type, bucket) group ORs its members into
# one bitmap, and the distinct count is the SUM of per-bucket popcounts
# — exact, mergeable, and O(distinct/32768) state per group instead of
# a hash set per group. This is how exact distinct survives reaggregation
# at 100 TB: the per-bucket bitmaps are reusable partial state (a
# daily mart can OR them into weekly/monthly rollups without touching
# raw events — the property approx sketches give up exactness for).
# The oracle is plain COUNT(DISTINCT), so the bitmap algebra itself is
# correctness-gated.
# ---------------------------------------------------------------------------

_BITMAP_SQL = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
"""


@register("events_bitmap_distinct_rollup", oracle=_BITMAP_SQL)
def events_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    segs = ev.groupBy(
        "day",
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return segs.groupBy("day", "event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
        F.sum("n_ev").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Fixed-bin numeric histogram per event type — the profiling primitive
# every DQ/drift monitor computes: equal-width bins over a declared
# range with explicit under/overflow buckets. Bin assignment is
# floor((v - lo)/width) on doubles — subtraction and division are
# correctly rounded IEEE in both engines, and floor of the shared
# result is identical, so bin edges need no epsilon fudging. One
# map + one bounded (type × bins) aggregate.
# ---------------------------------------------------------------------------

_HIST_LO = 0.0
_HIST_HI = 100.0
_HIST_BINS = 20

_HIST_SQL = f"""
WITH binned AS (
    SELECT event_type,
           CASE WHEN value < {_HIST_LO} THEN -1
                WHEN value >= {_HIST_HI} THEN {_HIST_BINS}
                ELSE CAST(FLOOR((value - {_HIST_LO})
                     / (({_HIST_HI} - {_HIST_LO}) / {_HIST_BINS})) AS BIGINT)
           END AS bin,
           value
    FROM events
)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM binned GROUP BY event_type, bin
"""


@register("events_histogram_numeric", oracle=_HIST_SQL)
def events_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    bin_col = (
        F.when(F.col("value") < _HIST_LO, F.lit(-1))
        .when(F.col("value") >= _HIST_HI, F.lit(_HIST_BINS))
        .otherwise(F.floor((F.col("value") - _HIST_LO) / width))
        .cast("long")
    )
    return (
        ev.select("event_type", bin_col.alias("bin"), "value")
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Conversion-lag quantiles — time-to-convert from a user's FIRST view
# to their first subsequent purchase, summarized as the interpolated
# quartiles/p90 every growth dashboard reports. Two min-aggregates on
# user_id (same shuffle key) + one bounded join; the quantiles run on
# the per-user lag frame (≤ |users| rows), where the exact interpolated
# percentile is affordable at any event volume — the documented trade
# vs approx percentiles for unbounded keys
# (events_sampled_quantile_error).
# ---------------------------------------------------------------------------

_CONVLAG_SQL = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
fv AS (SELECT user_id, MIN(sec) AS v FROM e WHERE event_type = 'view' GROUP BY 1),
fp AS (
    SELECT e.user_id, MIN(e.sec) AS p
    FROM e JOIN fv USING (user_id)
    WHERE e.event_type = 'purchase' AND e.sec >= fv.v
    GROUP BY 1
),
lags AS (SELECT fp.p - fv.v AS lag_s FROM fv JOIN fp USING (user_id))
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(lag_s, 0.25), 6) AS p25_s,
       ROUND(quantile_cont(lag_s, 0.50), 6) AS p50_s,
       ROUND(quantile_cont(lag_s, 0.75), 6) AS p75_s,
       ROUND(quantile_cont(lag_s, 0.90), 6) AS p90_s
FROM lags
"""


@register("events_conversion_lag_quantiles", oracle=_CONVLAG_SQL)
def events_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("v"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("sec") >= F.col("v"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("p"))
    )
    # Distributed exact quantiles (round 9): percentile() buffers the
    # whole converted-user lag column in one aggregation buffer; the
    # two-phase selection computes bit-identical values scale-safely.
    # LEFT join keeps the aggregate's always-one-row semantics (an
    # empty lag frame yields NULL quantiles, n_converted = 0).
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import exact_global_quantiles
    from deathmetal_datalake_spark.plans.registry import session_cache

    lags = session_cache(
        fv.join(fp, "user_id").select((F.col("p") - F.col("v")).alias("lag_s"))
    )
    qs = exact_global_quantiles(lags, F.col("lag_s"), [0.25, 0.50, 0.75, 0.90])
    pivot = qs.agg(
        *[
            F.round(F.max(F.when(F.col("frac") == f, F.col("q"))), 6).alias(a)
            for f, a in [(0.25, "p25_s"), (0.50, "p50_s"),
                         (0.75, "p75_s"), (0.90, "p90_s")]
        ]
    )
    n = lags.agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    return n.crossJoin(broadcast(pivot)).select(
        "n_converted", "p25_s", "p50_s", "p75_s", "p90_s"
    )


# ---------------------------------------------------------------------------
# New vs returning users per day — the growth-accounting split every
# product mart materializes: a user's first-ever event day marks them
# NEW; on later active days they count as RETURNING. One user_id
# shuffle for the first-touch min, one broadcast-scale join back onto
# the bounded (day, user) activity frame, one day-level aggregate.
# Exact integer date arithmetic in both engines.
# ---------------------------------------------------------------------------

_NEWRET_SQL = """
WITH act AS (
    SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
    FROM events
),
first_touch AS (SELECT user_id, MIN(day) AS first_day FROM act GROUP BY user_id)
SELECT a.day,
       CAST(SUM(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(SUM(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM act a JOIN first_touch f USING (user_id)
GROUP BY a.day
"""


@register("events_new_vs_returning", oracle=_NEWRET_SQL)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    first_touch = act.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        act.join(first_touch, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
            F.count(F.lit(1)).cast("long").alias("n_active"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix — first-order Markov view of user
# behavior (the input to next-event prediction features and to bot
# detection): per user ordered by (ts, event_id), count (prev -> next)
# transitions and each row's share of its prev-type mass. One window
# pass for the lag (partitioned by user: Spark shuffles once on
# user_id) and one bounded aggregate (|types|^2 <= 25 rows out); at
# 100 TB the only corpus-sized stage is the lag window, which shares
# the sessionization family's partitioning.
# ---------------------------------------------------------------------------

_TRANSITION_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n_trans AS BIGINT) AS n_trans,
       ROUND(CAST(n_trans AS DOUBLE)
             / SUM(n_trans) OVER (PARTITION BY prev_type), 6) AS share
FROM trans
ORDER BY prev_type, next_type
"""


@register("events_type_transition_matrix", oracle=_TRANSITION_SQL)
def events_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_prev = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.sum("n_trans").over(w_prev), 6
        ).alias("share"),
    ).orderBy("prev_type", "next_type")


# ---------------------------------------------------------------------------
# Top session paths — the first three event types of each session
# (30-minute gap rule, events_session_features' exact session law),
# joined into a path string, counted, top 15. The funnel view's
# exploratory sibling: which entry sequences actually happen. Session
# assembly shares the one user-partitioned window chain; the path
# aggregate is bounded by |types|^3.
# ---------------------------------------------------------------------------

_TOP_PATHS = 15

_PATHS_SQL = f"""
WITH e AS (
    SELECT event_id, user_id, event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
g AS (
    SELECT *, CASE WHEN LAG(sec) OVER w IS NULL
                     OR sec - LAG(sec) OVER w > {_SESSION_GAP_S}
                   THEN 1 ELSE 0 END AS is_start
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
s AS (
    SELECT *, SUM(is_start) OVER (
        PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING
    ) AS session_seq FROM g
),
pos AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, session_seq ORDER BY sec, event_id
    ) AS pos_in_session FROM s
),
paths AS (
    SELECT user_id, session_seq,
           string_agg(event_type, '>' ORDER BY pos_in_session) AS path
    FROM pos WHERE pos_in_session <= 3
    GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {_TOP_PATHS}
"""


@register("events_top_session_paths", oracle=_PATHS_SQL)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    g = e.withColumn(
        "is_start",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > _SESSION_GAP_S),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = g.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy("sec", "event_id")
    pos = s.withColumn("pos_in_session", F.row_number().over(w_sess))
    # Order-stable path join: sort (pos, type) structs, then project
    # the types (collect_list alone has no ordering contract).
    paths = (
        pos.filter(F.col("pos_in_session") <= 3)
        .groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos_in_session", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_TOP_PATHS)
    )


# ---------------------------------------------------------------------------
# A/B experiment readout with CUPED variance reduction — the canonical
# online-experimentation adjustment (Deng et al., WSDM'13): variant by
# deterministic user hash, pre-period spend as the covariate, theta =
# cov(X,Y)/var(X), adjusted lift = raw lift - theta * covariate lift
# (the mean(X) recentering term cancels in the A/B difference).
#
# Determinism: spend is folded to integer CENTS per event
# (ROUND(value*100) — the 2-decimal columns land within 1e-10 of an
# integer, so both engines round identically), all per-user and global
# moments are exact BIGINT sums, and doubles appear only in the final
# one-row ratio arithmetic (identical expression trees both sides).
# 100 TB shape: one shuffle on user_id for the per-user frame, then a
# single partial-aggregated scalar frame; moment sums stay < 2^63 by
# orders of magnitude at any plausible scale (documented: cents^2 per
# user ~1e12, users ~1e9 -> ~1e21 would overflow — at that scale fold
# the moments per-partition into DOUBLE, trading exactness for range).
# ---------------------------------------------------------------------------

_CUPED_CUTOFF = "2024-01-16 00:00:00"

_CUPED_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           {sql_hash60('CAST(user_id AS VARCHAR)')} % 2 AS variant,
           CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{_CUPED_CUTOFF}'
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_CUPED_CUTOFF}'
                    THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events
    GROUP BY user_id
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa,
           CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb,
           CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
           CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS syb
    FROM per_user
)
SELECT na AS n_users_a, nb AS n_users_b,
       ROUND(CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na, 6)
           AS raw_lift_cents,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
       ROUND((CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na)
             - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
               * (CAST(sxb AS DOUBLE) / nb - CAST(sxa AS DOUBLE) / na), 6)
           AS cuped_lift_cents
FROM m
"""


@register("events_ab_cuped_adjusted_lift", oracle=_CUPED_SQL)
def events_ab_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_pre = F.col("ts") < F.expr(f"TIMESTAMP_NTZ '{_CUPED_CUTOFF}'")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(is_pre, cents).otherwise(F.lit(0))).cast("long").alias("x"),
        F.sum(F.when(~is_pre, cents).otherwise(F.lit(0))).cast("long").alias("y"),
    ).withColumn(
        "variant", F.pmod(hash60(F.col("user_id").cast("string")), F.lit(2))
    )
    m = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(F.lit(0)))
        .cast("long").alias("sxa"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(F.lit(0)))
        .cast("long").alias("sxb"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(F.lit(0)))
        .cast("long").alias("sya"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(F.lit(0)))
        .cast("long").alias("syb"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # NULLIF guards (round-8 degenerate-events find): an experiment with
    # NO pre-period data has every per-user x = 0, so theta's variance
    # denominator is exactly 0 — and a tiny corpus can hash every user
    # into one variant (na or nb = 0). Spark's default ANSI mode aborts
    # on those divisions; the oracle yields NULL (x/0). NULLIF makes
    # both engines report NULL lifts instead of crashing the readout.
    nb = F.nullif(d("nb"), F.lit(0.0))
    na = F.nullif(d("na"), F.lit(0.0))
    raw = d("syb") / nb - d("sya") / na
    theta = (d("n") * d("sxy") - d("sx") * d("sy")) / F.nullif(
        d("n") * d("sxx") - d("sx") * d("sx"), F.lit(0.0)
    )
    cov_lift = d("sxb") / nb - d("sxa") / na
    return m.select(
        F.col("na").alias("n_users_a"),
        F.col("nb").alias("n_users_b"),
        F.round(raw, 6).alias("raw_lift_cents"),
        F.round(theta, 6).alias("theta"),
        F.round(raw - theta * cov_lift, 6).alias("cuped_lift_cents"),
    )


# ---------------------------------------------------------------------------
# RFM quintile segmentation — the classic customer-value matrix over
# orders: per customer, Recency (days since last order vs the corpus
# watermark), Frequency (order count), Monetary (exact decimal revenue
# sum), each NTILE(5)-scored with a unique tie-break so bucket
# assignment is engine-deterministic, folded to the 125-cell segment
# summary. The three quintile scores are EXACT NTILE semantics computed
# scale-safely (round-9): a two-phase distributed rank per dimension
# (operators/ordering.two_phase_order) plus closed-form bucket sizing
# (ntile_from_rank), bit-identical to the oracle's NTILE windows with
# no single-task sort anywhere — exactness without the approx trade
# the docstring used to defer to.
# ---------------------------------------------------------------------------

_RFM_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           date_diff('day', CAST(MAX(o_orderdate) AS TIMESTAMP),
                     (SELECT CAST(MAX(o_orderdate) AS TIMESTAMP) FROM orders))
               AS recency_days,
           COUNT(*) AS frequency,
           {sql_dsum("o_totalprice", "monetary")}
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_quintile,
           NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quintile,
           NTILE(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_quintile,
           monetary
    FROM per_cust
)
SELECT CAST(r_quintile AS BIGINT) AS r_quintile,
       CAST(f_quintile AS BIGINT) AS f_quintile,
       CAST(m_quintile AS BIGINT) AS m_quintile,
       COUNT(*) AS n_customers,
       {sql_davg("monetary", "avg_monetary", 6)}
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("events_rfm_quintiles", oracle=_RFM_SQL)
def events_rfm_quintiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    orders = load_table(spark, sf_dir, "orders")
    wm = orders.agg(F.max("o_orderdate").alias("watermark"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
        .crossJoin(broadcast(wm))
        .select(
            "o_custkey",
            F.datediff(F.col("watermark"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    # Three distributed two-phase ranks replace the three global NTILE
    # windows (round-9: each was a sequential single-task sort of the
    # whole customer frame at scale). ntile_from_rank reproduces SQL
    # NTILE bucket sizing exactly from (rank, N), so the result is
    # bit-identical to the windowed form the oracle still runs. The
    # per-customer frame is cached: each rank pass evaluates it for
    # boundaries/totals/ranks, and it is |customers| ≪ |orders|.
    from deathmetal_datalake_spark.operators.ordering import (
        OrderSpec,
        ntile_from_rank,
        two_phase_order_multi,
    )
    from deathmetal_datalake_spark.plans.registry import session_cache

    per_cust = session_cache(per_cust)
    # recency_days and frequency are SMALL-DOMAIN values (days, order
    # counts) — massive tie groups at scale. sub_key=o_custkey (the
    # tie-break) splits heavy tie groups into balanced sub-buckets; the
    # ranks stay bit-identical. The FUSED multi-order form (round-10,
    # NEXT #3) batches all three dimensions' boundary and sub-boundary
    # quantiles into two plan-build actions total, instead of the six
    # the serial form paid over the cached per-customer frame.
    ranked = two_phase_order_multi(
        per_cust,
        [
            OrderSpec(
                [F.asc("recency_days"), F.asc("o_custkey")],
                F.col("recency_days"),
                rank_col="r_rank",
                sub_key=F.col("o_custkey"),
            ),
            OrderSpec(
                [F.desc("frequency"), F.asc("o_custkey")],
                F.col("frequency"),
                key_desc=True,
                rank_col="f_rank",
                sub_key=F.col("o_custkey"),
            ),
            OrderSpec(
                [F.desc("monetary"), F.asc("o_custkey")],
                F.col("monetary"),
                key_desc=True,
                rank_col="m_rank",
                sub_key=F.col("o_custkey"),
            ),
        ],
        n_total_col="n_cust",
    )
    n = F.col("n_cust")
    scored = ranked.select(
        ntile_from_rank(F.col("r_rank"), n, 5).alias("r_quintile"),
        ntile_from_rank(F.col("f_rank"), n, 5).alias("f_quintile"),
        ntile_from_rank(F.col("m_rank"), n, 5).alias("m_quintile"),
        "monetary",
    )
    return (
        scored.groupBy("r_quintile", "f_quintile", "m_quintile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("monetary", "avg_monetary", 6),
        )
        .select(
            F.col("r_quintile").cast("long"),
            F.col("f_quintile").cast("long"),
            F.col("m_quintile").cast("long"),
            "n_customers",
            "avg_monetary",
        )
        .orderBy("r_quintile", "f_quintile", "m_quintile")
    )


# ---------------------------------------------------------------------------
# Peak concurrency (sweep line) — the interval-analytics staple: each
# event opens an interval [start, start + ceil(value) seconds) and the
# audit reports, per event type, the maximum number of simultaneously
# open intervals and when it first occurs. Classic +1/−1 boundary-point
# sweep: net deltas grouped per second, one running-sum window
# PARTITIONED BY event type (never global), then a join-back for the
# argmax second. Half-open semantics make the per-second net exact:
# concurrency at second t = Σ starts≤t − Σ ends≤t.
# ---------------------------------------------------------------------------

_CONCURRENCY_SQL = """
WITH iv AS (
    SELECT event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             + GREATEST(CAST(CEIL(COALESCE(value, 0)) AS BIGINT), 1) AS e
    FROM events
),
pts AS (
    SELECT event_type, s AS sec, 1 AS delta FROM iv
    UNION ALL
    SELECT event_type, e AS sec, -1 AS delta FROM iv
),
net AS (
    SELECT event_type, sec, SUM(delta) AS net
    FROM pts GROUP BY event_type, sec
),
cum AS (
    SELECT event_type, sec,
           SUM(net) OVER (PARTITION BY event_type ORDER BY sec
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS concurrency
    FROM net
),
peaks AS (
    SELECT event_type, MAX(concurrency) AS peak FROM cum GROUP BY event_type
)
SELECT p.event_type,
       CAST((SELECT COUNT(*) FROM iv i WHERE i.event_type = p.event_type)
            AS BIGINT) AS n_intervals,
       CAST(p.peak AS BIGINT) AS peak_concurrency,
       make_timestamp(MIN(c.sec) * 1000000) AS first_peak_ts
FROM peaks p
JOIN cum c ON c.event_type = p.event_type AND c.concurrency = p.peak
GROUP BY p.event_type, p.peak
ORDER BY p.event_type
"""


@register("events_peak_concurrency", oracle=_CONCURRENCY_SQL)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan, window-only form (the first cut unioned two scans
    # and re-executed the running-sum subtree once per join branch —
    # 4+ scans of events; this explodes each event to its two boundary
    # points in one pass and folds peak/argmax/start-mass with windows
    # over the bounded per-(type, second) net frame).
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("s"),
        F.greatest(
            F.ceil(F.coalesce(F.col("value"), F.lit(0.0))).cast("long"), F.lit(1)
        ).alias("dur"),
    )
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("sec"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("s") + F.col("dur")).alias("sec"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("pt"),
    ).select(
        "event_type", F.col("pt.sec").alias("sec"), F.col("pt.delta").alias("delta")
    )
    net = pts.groupBy("event_type", "sec").agg(
        F.sum("delta").alias("net"),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("starts"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ann = net.select(
        "event_type",
        "sec",
        "starts",
        F.sum("net").over(w).alias("concurrency"),
    ).select(
        "event_type",
        "sec",
        "concurrency",
        F.max("concurrency").over(w_full).alias("peak"),
        F.sum("starts").over(w_full).cast("long").alias("n_starts"),
    )
    return (
        ann.filter(F.col("concurrency") == F.col("peak"))
        .groupBy("event_type", "peak", "n_starts")
        .agg(F.min("sec").alias("first_peak_sec"))
        .select(
            "event_type",
            F.col("n_starts").alias("n_intervals"),
            F.col("peak").cast("long").alias("peak_concurrency"),
            F.expr(
                "timestampadd(SECOND, first_peak_sec,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("first_peak_ts"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Outage-gap detection (gaps and islands) — the monitoring query that
# finds windows where a feed went SILENT: per event type, contiguous
# runs of minutes with no events, reported when the run is at least
# the alert threshold. Classic lag-window islands: distinct active
# minutes, the lag gap, one row per qualifying gap with a total-order
# tie-break. The window runs over the DISTINCT-minute frame (bounded
# by the time span, not the event count), so the audit costs one
# distinct aggregate + one per-type window at any scale.
# ---------------------------------------------------------------------------

_OUTAGE_MIN_GAP_MIN = 3  # report gaps of >= 3 silent minutes

_OUTAGE_SQL = f"""
WITH minutes AS (
    SELECT DISTINCT event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) AS BIGINT) AS m
    FROM events
),
gaps AS (
    SELECT event_type, m,
           LAG(m) OVER (PARTITION BY event_type ORDER BY m) AS prev_m
    FROM minutes
)
SELECT event_type,
       make_timestamp((prev_m + 1) * 60 * 1000000) AS gap_start_ts,
       make_timestamp(m * 60 * 1000000) AS gap_end_ts,
       CAST(m - prev_m - 1 AS BIGINT) AS silent_minutes
FROM gaps
WHERE prev_m IS NOT NULL AND m - prev_m - 1 >= {_OUTAGE_MIN_GAP_MIN}
ORDER BY silent_minutes DESC, event_type ASC, gap_start_ts ASC
LIMIT 20
"""


@register("events_outage_gaps", oracle=_OUTAGE_SQL)
def events_outage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.floor(
                F.expr(
                    "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
                / 60
            )
        )
        .cast("long")
        .alias("m"),
    )
    minutes = ev.distinct()
    w = Window.partitionBy("event_type").orderBy("m")
    gaps = minutes.withColumn("prev_m", F.lag("m").over(w))
    silent = F.col("m") - F.col("prev_m") - 1
    return (
        gaps.filter(F.col("prev_m").isNotNull() & (silent >= _OUTAGE_MIN_GAP_MIN))
        .select(
            "event_type",
            F.expr(
                "timestampadd(MINUTE, CAST(prev_m + 1 AS INT),"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("gap_start_ts"),
            F.expr(
                "timestampadd(MINUTE, CAST(m AS INT),"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("gap_end_ts"),
            silent.cast("long").alias("silent_minutes"),
        )
        .orderBy(F.desc("silent_minutes"), F.asc("event_type"), F.asc("gap_start_ts"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness (round 9) — the growth-accounting ratio next to
# new-vs-returning: per day, distinct active users that day (DAU) and
# distinct users active in the trailing 7-day window (WAU), ratio
# rounded. Cross-day distincts can't slide cheaply, so the exact form
# joins the BOUNDED day grid to the per-(day, user) distinct pairs
# with a 7-day band — the fan-out is ≤ 7 rows per active (day, user),
# then one distinct aggregate per grid day. Everything shuffles on
# (day, user); no global structure anywhere.
# ---------------------------------------------------------------------------

_STICKINESS_SQL = """
WITH du AS (
    SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
    FROM events
),
grid AS (SELECT DISTINCT d FROM du),
wau AS (
    SELECT g.d, COUNT(DISTINCT u.user_id) AS wau
    FROM grid g
    JOIN du u ON u.d <= g.d AND u.d >= g.d - INTERVAL 6 DAY
    GROUP BY g.d
),
dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d)
SELECT CAST(dau.d AS DATE) AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY day
"""


@register("events_dau_wau_stickiness", oracle=_STICKINESS_SQL)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events")
    du = session_cache(
        ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    )
    grid = du.select("d").distinct()
    # Fan each (day, user) pair to the EXACTLY 7 grid days it covers
    # (explode of a 7-date sequence), then an EQUI semi-restriction to
    # real grid days — a broadcast hash join against the time-range-
    # bound grid, never a nested-loop band join (a ≤-band BNLJ would
    # evaluate |pairs| × |grid| at scale; this stays 7 × |pairs|).
    cov = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("gd"),
        "user_id",
    )
    wau = (
        cov.join(broadcast(grid.withColumnRenamed("d", "gd")), "gd")
        .groupBy(F.col("gd").alias("d"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Audience overlap (round 9) — pairwise Jaccard between event types'
# USER SETS: do clickers also purchase? Type pairs are a bounded enum
# (T² for a handful of types), per-type distincts and pair
# intersections are hash aggregates over (type, user); the only join
# keys on user_id. Jaccard = |A∩B| / (|A| + |B| − |A∩B|), exact
# integers into one correctly-rounded division.
# ---------------------------------------------------------------------------

_AUDIENCE_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type),
inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
    FROM tu a JOIN tu b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT i.type_a, i.type_b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.n_both AS BIGINT) AS n_both,
       ROUND(CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both), 6)
           AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY type_a, type_b
"""


@register("events_audience_overlap_jaccard", oracle=_AUDIENCE_SQL)
def events_audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events")
    tu = session_cache(ev.select("event_type", "user_id").distinct())
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.alias("a")
    b = tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(broadcast(sa), "type_a")
        .join(broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (round-9 continuation) — the retention curve a
# product team actually trusts: time from a user's FIRST event to
# churn, with users still active near the corpus watermark treated as
# CENSORED (alive at last sight), not as churned — the mistake naive
# retention queries make. Churn = last activity more than
# _KM_CENSOR_DAYS before the watermark; death time = last − first in
# days, censor time = watermark − first. Classic estimator:
# S(t) = Π_{u<=t} (n_u − d_u)/n_u over the day-granular time frame.
#
# Cross-engine exactness without transcendentals (the BM25 lesson):
# the cumulative product is a SEQUENTIAL LEFT-TO-RIGHT fold of
# identical IEEE ops on both sides — Spark folds with the aggregate()
# higher-order function over the sorted bounded frame; the oracle uses
# a RECURSIVE CTE stepping row-by-row in the same order with the same
# cast-subtract-divide-multiply sequence, so the doubles are
# bit-identical (ROUND 6 is belt-and-braces). A windowed product()
# would NOT be safe: segment-tree evaluation regroups the
# multiplication.
#
# 100 TB shape: one user_id shuffle for first/last, one groupBy on the
# DAY-BOUNDED time value; the fold runs on one row of ≤ span-in-days
# structs — bounded by construction, never data-proportional (the
# O(T²) prefix folds are ~13M lambda steps even at a 10-year span).
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 7

_KM_SQL = f"""
WITH RECURSIVE bounds AS (
    SELECT CAST(date_trunc('day', MAX(CAST(ts AS TIMESTAMP))) AS DATE) AS w
    FROM events
),
per_user AS (
    SELECT user_id,
           CAST(date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS DATE) AS f,
           CAST(date_trunc('day', MAX(CAST(ts AS TIMESTAMP))) AS DATE) AS l
    FROM events GROUP BY 1
),
obs AS (
    SELECT CASE WHEN l <= w - {_KM_CENSOR_DAYS} THEN date_diff('day', f, l)
                ELSE date_diff('day', f, w) END AS t,
           CASE WHEN l <= w - {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS death
    FROM per_user, bounds
),
tf AS (
    SELECT t, SUM(death) AS d, SUM(1 - death) AS cz
    FROM obs GROUP BY t
),
ranked AS (
    SELECT t, d, cz,
           SUM(d + cz) OVER () - COALESCE(
               SUM(d + cz) OVER (ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS n,
           ROW_NUMBER() OVER (ORDER BY t) AS rn
    FROM tf
),
km AS (
    SELECT rn, t, d, cz, n,
           CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS s
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT r.rn, r.t, r.d, r.cz, r.n,
           km.s * (CAST(r.n - r.d AS DOUBLE) / CAST(r.n AS DOUBLE))
    FROM km JOIN ranked r ON r.rn = km.rn + 1
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(n AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_deaths,
       CAST(cz AS BIGINT) AS n_censored,
       ROUND(s, 6) AS survival
FROM km
ORDER BY t_days
"""


@register("events_survival_kaplan_meier", oracle=_KM_SQL)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    wm = ev.agg(F.max("day").alias("w"))
    per_user = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("f"), F.max("day").alias("l"))
        .crossJoin(broadcast(wm))
    )
    death = F.col("l") <= F.date_sub(F.col("w"), _KM_CENSOR_DAYS)
    obs = per_user.select(
        F.when(death, F.datediff(F.col("l"), F.col("f")))
        .otherwise(F.datediff(F.col("w"), F.col("f")))
        .cast("long")
        .alias("t"),
        F.when(death, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("death"),
    )
    tf = obs.groupBy("t").agg(
        F.sum("death").alias("d"), F.sum(F.lit(1) - F.col("death")).alias("cz")
    )
    # One row holding the whole DAY-BOUNDED frame; prefix folds give
    # the risk set and the sequential survival product (see header).
    row = tf.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "cz"))).alias("a")
    ).withColumn("tot", F.expr("aggregate(a, 0L, (acc, x) -> acc + x.d + x.cz)"))
    curve = row.select(
        F.explode(
            F.expr(
                """
                transform(a, (x, i) -> named_struct(
                    't_days', x.t,
                    'n_at_risk',
                        tot - aggregate(slice(a, 1, i), 0L,
                                        (acc, y) -> acc + y.d + y.cz),
                    'n_deaths', x.d,
                    'n_censored', x.cz,
                    'survival', round(
                        aggregate(slice(a, 1, i + 1),
                                  named_struct('rem', tot,
                                               'sv', cast(1.0 as double)),
                                  (acc, y) -> named_struct(
                                      'rem', acc.rem - y.d - y.cz,
                                      'sv', acc.sv *
                                          (cast(acc.rem - y.d as double)
                                           / cast(acc.rem as double)))).sv,
                        6)))
                """
            )
        ).alias("r")
    ).select("r.*")
    return curve.orderBy("t_days")


# ---------------------------------------------------------------------------
# Time-weighted average (round-9 continuation) — the TWAP-style rollup
# for irregularly sampled measurements: a value that held for 50
# minutes must weigh 50× one that held for a minute, which the plain
# mean gets wrong on event-driven data. Each event's value is weighted
# by the seconds until that type's NEXT event (last event carries no
# interval and is excluded, standard step-function convention).
# Windows are PARTITIONED by event type; the (ts, event_id) tie-break
# pins the lead() pairing when timestamps collide, so the weighted
# multiset is engine-deterministic. value·dur terms go through the
# DECIMAL(18,6) cast (Spark widens the sum to DECIMAL(28,6), DuckDB to
# DECIMAL(38,6) — both exact); NULLIF guards the all-simultaneous
# degenerate type (zero total duration) where ANSI Spark would abort.
# ---------------------------------------------------------------------------

_TWA_SQL = f"""
WITH e AS (
    SELECT event_type, event_id, value,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
seq AS (
    SELECT event_type, value, sec,
           LEAD(sec) OVER (PARTITION BY event_type
                           ORDER BY sec, event_id) - sec AS dur
    FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur) AS BIGINT) AS total_seconds,
       ROUND(CAST(CAST(SUM(CAST(value * dur AS DECIMAL(18,6))) AS VARCHAR)
                  AS DOUBLE) / NULLIF(SUM(dur), 0), 6) AS twa_value,
       {sql_davg("value", "mean_value")}
FROM seq
WHERE dur IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register("events_time_weighted_average", oracle=_TWA_SQL)
def events_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import davg

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    seq = e.select(
        "event_type",
        "value",
        "sec",
        (F.lead("sec").over(w) - F.col("sec")).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    wsum = (
        F.sum((F.col("value") * F.col("dur")).cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dur").cast("long").alias("total_seconds"),
            F.round(
                wsum / F.nullif(F.sum("dur"), F.lit(0)), 6
            ).alias("twa_value"),
            davg("value", "mean_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Seasonal-residual anomaly (round-9 continuation) — the day-of-week-
# aware upgrade of dq_daily_volume_anomaly: raw daily counts flag every
# weekend as an outage when traffic is weekly-seasonal, so the screen
# first removes the per-(type, weekday) mean and applies the
# median/MAD rule to the RESIDUALS. Arithmetic stays engine-exact:
# the dow mean is a ROUND-6 decimal average (one deterministic value),
# the residual is one IEEE subtraction, and the residual median/MAD
# run on grouped_quantiles_general (continuous domain). No
# transcendentals; a real STL would need them.
# ---------------------------------------------------------------------------

_SEAS_MAD_K = 3.0

_SEASONAL_ANOMALY_SQL = f"""
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
dow AS (
    SELECT event_type, dayofweek(d) AS wd,
           ROUND(CAST(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*), 6) AS dow_mean
    FROM daily GROUP BY 1, 2
),
resid AS (
    SELECT dl.event_type, dl.c - w.dow_mean AS r
    FROM daily dl JOIN dow w
      ON dl.event_type = w.event_type AND dayofweek(dl.d) = w.wd
),
med AS (
    SELECT event_type, quantile_cont(r, 0.5) AS med_r FROM resid GROUP BY 1
),
dev AS (
    SELECT s.event_type, s.r, m.med_r, ABS(s.r - m.med_r) AS absdev
    FROM resid s JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(absdev, 0.5) AS mad_r FROM dev GROUP BY 1
)
SELECT v.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(v.med_r, 6) AS med_residual,
       ROUND(a.mad_r, 6) AS mad_residual,
       CAST(SUM(CASE WHEN v.absdev > {_SEAS_MAD_K} * a.mad_r
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous_days
FROM dev v JOIN mad a USING (event_type)
GROUP BY v.event_type, v.med_r, a.mad_r
ORDER BY v.event_type
"""


@register("events_seasonal_residual_anomaly", oracle=_SEASONAL_ANOMALY_SQL)
def events_seasonal_residual_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import math
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    # The per-(type, day) count frame is bounded by the event-type ENUM
    # x calendar days — it grows with the time range, never with data
    # volume (150 rows at sf0.1; ~tens of thousands for a decade of
    # types at any corpus size). Collect it once (the adjudicated
    # bounded-probe class, the markov-attribution precedent) and run
    # the dow-mean / residual / median / MAD ladder as driver math:
    # the previous shape paid TWO grouped_quantiles_general calls
    # (each with plan-time probe actions) plus three cache
    # materializations over this 150-row frame — build time 4-9 s for
    # 0.3 s of actual distributed work (round-13 receipt in
    # OPTIMIZATION_r13.md). The heavy part — events scan -> daily
    # counts — STAYS distributed.
    daily_rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )

    # Driver math mirrors the previous Spark pipeline (and the oracle)
    # operation-for-operation on IEEE doubles:
    # - dow_mean: ROUND(double(sum_c) / count, 6). Spark's ROUND on a
    #   DOUBLE is BigDecimal.valueOf(Double.toString(x)) -> HALF_UP;
    #   repr() is the same shortest-round-trip decimal, so
    #   Decimal(repr(x)).quantize(1e-6, HALF_UP) is bit-identical.
    # - median: percentile interpolation, 0-indexed pos=(n-1)*f,
    #   q = v_lo*(ceil(pos)-pos) + v_hi*(pos-floor(pos)) — the exact
    #   formula grouped_quantiles_general applies.
    # - weekday bucket IDENTITY is all that matters (each engine is
    #   internally consistent), so isoweekday()%7 needs no shift.
    # Final ROUNDs stay in Spark on the assembled frame.
    def round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def median_interp(xs: list) -> float:
        xs = sorted(xs)
        pos = (len(xs) - 1) * 0.5
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            return xs[lo]
        return xs[lo] * (hi - pos) + xs[hi] * (pos - lo)

    # A NULL day or type never matched the old dow equi-join (NULL ==
    # NULL is not true on either engine), so those rows vanished from
    # the residual frame — skipping them here is the same semantics.
    daily_rows = [
        r
        for r in daily_rows
        if r["d"] is not None and r["event_type"] is not None
    ]
    dow_sum: dict = defaultdict(lambda: [0, 0])  # (et, wd) -> [sum_c, n]
    for r in daily_rows:
        k = (r["event_type"], r["d"].isoweekday() % 7)
        dow_sum[k][0] += r["c"]
        dow_sum[k][1] += 1
    dow_mean = {
        k: round6(float(sc) / float(n)) for k, (sc, n) in dow_sum.items()
    }
    resid: dict = defaultdict(list)  # et -> [r...]
    for r in daily_rows:
        m = dow_mean[(r["event_type"], r["d"].isoweekday() % 7)]
        resid[r["event_type"]].append(float(r["c"]) - m)
    out_rows = []
    for et in sorted(resid):
        rs = resid[et]
        med_r = median_interp(rs)
        devs = [abs(r - med_r) for r in rs]
        mad_r = median_interp(devs)
        cut = float(_SEAS_MAD_K) * mad_r
        n_anom = sum(1 for a in devs if a > cut)
        out_rows.append((et, len(rs), med_r, mad_r, n_anom))
    return (
        spark.createDataFrame(
            out_rows,
            "event_type string, n_days long, med_r double, "
            "mad_r double, n_anomalous_days long",
        )
        .select(
            "event_type",
            "n_days",
            F.round("med_r", 6).alias("med_residual"),
            F.round("mad_r", 6).alias("mad_residual"),
            "n_anomalous_days",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Per-user feature vector (round-9 continuation) — the feature-store
# build every churn/LTV model trains on: one row per user with
# tenure, recency, activity density, type diversity, value totals, and
# the mean inter-event gap. One user_id shuffle covers everything: the
# aggregate features come from a single groupBy, the gap feature from
# a lag window PARTITIONED by user over the same shuffle key (Spark
# reuses the exchange). All exact: day/second arithmetic is integer,
# money goes through dsum/davg decimals. The 1-row watermark frame
# (recency needs "days since last vs corpus end") is the only
# broadcast.
# ---------------------------------------------------------------------------

_USER_FEATURES_SQL = f"""
WITH e AS (
    SELECT user_id, event_type, value,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           event_id
    FROM events
),
wm AS (SELECT MAX(d) AS w FROM e),
gaps AS (
    SELECT user_id,
           sec - LAG(sec) OVER (PARTITION BY user_id
                                ORDER BY sec, event_id) AS gap
    FROM e
),
gapagg AS (
    SELECT user_id, {sql_davg("gap", "mean_gap_s")}
    FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT a.user_id,
       CAST(date_diff('day', MIN(a.d), MAX(a.d)) AS BIGINT) AS tenure_days,
       CAST(date_diff('day', MAX(a.d), MAX(w.w)) AS BIGINT) AS days_since_last,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT a.d) AS BIGINT) AS n_active_days,
       CAST(COUNT(DISTINCT a.event_type) AS BIGINT) AS n_event_types,
       {sql_dsum("a.value", "sum_value")},
       {sql_davg("a.value", "avg_value")},
       MAX(g.mean_gap_s) AS mean_gap_s
FROM e a CROSS JOIN wm w
LEFT JOIN gapagg g ON g.user_id = a.user_id
GROUP BY a.user_id
ORDER BY a.user_id
"""


@register("events_user_features", oracle=_USER_FEATURES_SQL)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    )
    wm = e.agg(F.max("d").alias("w"))
    gw = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = (
        e.select("user_id", (F.col("sec") - F.lag("sec").over(gw)).alias("gap"))
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(davg("gap", "mean_gap_s"))
    )
    base = (
        e.crossJoin(broadcast(wm))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("d"), F.min("d")).cast("long").alias("tenure_days"),
            F.datediff(F.max("w"), F.max("d"))
            .cast("long")
            .alias("days_since_last"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("d").cast("long").alias("n_active_days"),
            F.countDistinct("event_type").cast("long").alias("n_event_types"),
            dsum("value", "sum_value"),
            davg("value", "avg_value"),
        )
    )
    return (
        base.join(gaps, "user_id", "left")
        .select(
            "user_id",
            "tenure_days",
            "days_since_last",
            "n_events",
            "n_active_days",
            "n_event_types",
            "sum_value",
            "avg_value",
            "mean_gap_s",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Burst episodes (round-9 continuation) — the gaps-and-islands pattern
# no other entry exercises: minutes whose event count clears a
# threshold are "hot", and CONSECUTIVE hot minutes merge into one
# burst episode (alerting pages once per episode, not once per
# minute). Island id = minute_index − row_number() within the type —
# constant exactly while minutes are consecutive; both windows are
# PARTITIONED by event type. Output: one row per episode with start,
# duration, and event mass — everything integer.
# ---------------------------------------------------------------------------

_BURST_MIN_COUNT = 2

_BURST_SQL = f"""
WITH per_min AS (
    SELECT event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 60 AS m,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
hot AS (
    SELECT event_type, m, c,
           m - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m)
               AS island
    FROM per_min WHERE c >= {_BURST_MIN_COUNT}
)
SELECT event_type,
       CAST(MIN(m) * 60 AS BIGINT) AS start_sec,
       CAST(COUNT(*) AS BIGINT) AS n_minutes,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(MAX(c) AS BIGINT) AS peak_minute_count
FROM hot
GROUP BY event_type, island
ORDER BY event_type, start_sec
"""


@register("events_burst_episodes", oracle=_BURST_SQL)
def events_burst_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_min = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 60"
            ).alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("m")
    hot = per_min.filter(F.col("c") >= _BURST_MIN_COUNT).withColumn(
        "island", F.col("m") - F.row_number().over(w)
    )
    return (
        hot.groupBy("event_type", "island")
        .agg(
            (F.min("m") * 60).cast("long").alias("start_sec"),
            F.count(F.lit(1)).cast("long").alias("n_minutes"),
            F.sum("c").cast("long").alias("n_events"),
            F.max("c").cast("long").alias("peak_minute_count"),
        )
        .drop("island")
        .orderBy("event_type", "start_sec")
    )


# ---------------------------------------------------------------------------
# Holt linear smoothing (round-9 continuation) — double exponential
# smoothing per event type over the daily-count series: level l and
# trend b update recursively (α=0.5, β=0.25 — both exactly
# representable in binary, chosen so the recursion is pure IEEE
# arithmetic), and the 7-day-ahead forecast is l + 7b. The EWMA entry
# smooths level only; Holt adds the trend every capacity forecast
# needs. Same cross-engine recipe as the Kaplan-Meier fold: the
# recursion is a SEQUENTIAL left-to-right fold over the day-bounded
# frame (aggregate() HOF one side, per-type recursive CTE the other,
# identical op order inside), so the doubles agree bit-for-bit before
# the display ROUND. One shuffle to daily counts; the fold runs on
# one bounded row per type.
# ---------------------------------------------------------------------------

_HOLT_SQL = """
WITH RECURSIVE daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, CAST(c AS DOUBLE) AS c,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
    FROM daily
),
holt AS (
    SELECT event_type, rn, c AS l, CAST(0.0 AS DOUBLE) AS b
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT r.event_type, r.rn,
           0.5 * r.c + 0.5 * (h.l + h.b),
           0.25 * ((0.5 * r.c + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b
    FROM holt h JOIN ranked r
      ON r.event_type = h.event_type AND r.rn = h.rn + 1
),
final AS (
    SELECT event_type, rn, l, b,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY rn DESC) AS rr
    FROM holt
)
SELECT event_type,
       CAST(rn AS BIGINT) AS n_days,
       ROUND(l, 6) AS level,
       ROUND(b, 6) AS trend,
       ROUND(l + 7.0 * b, 6) AS forecast_7d
FROM final WHERE rr = 1
ORDER BY event_type
"""


@register("events_holt_linear_forecast", oracle=_HOLT_SQL)
def events_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("a")
    )
    folded = series.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        F.expr(
            """
            aggregate(a,
                named_struct('n', 0L, 'l', cast(0.0 as double),
                             'b', cast(0.0 as double)),
                (acc, x) -> IF(acc.n = 0,
                    named_struct('n', 1L, 'l', x.c, 'b', cast(0.0 as double)),
                    named_struct('n', acc.n + 1L,
                                 'l', 0.5 * x.c + 0.5 * (acc.l + acc.b),
                                 'b', 0.25 * ((0.5 * x.c + 0.5 * (acc.l + acc.b))
                                              - acc.l) + 0.75 * acc.b)))
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.b"), 6).alias("trend"),
        F.round(F.col("st.l") + F.lit(7.0) * F.col("st.b"), 6).alias(
            "forecast_7d"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# User resurrection (round-9 continuation) — the growth-accounting
# state new_vs_returning cannot express: a user coming back after a
# DORMANCY gap (>= _RESURRECT_GAP_DAYS since their previous
# event; 3 days here — the corpus spans one month of near-daily
# activity, production sets 14+) is
# "resurrected", not merely returning — product teams track it as its
# own funnel. Per day: active users split into new / resurrected /
# returning by the day-gap to each user's PREVIOUS active day (lag
# window per user over the distinct active-day frame). All integer
# day arithmetic.
# ---------------------------------------------------------------------------

_RESURRECT_GAP_DAYS = 3

_RESURRECTION_SQL = f"""
WITH user_days AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
    FROM events
),
lagged AS (
    SELECT user_id, d,
           LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
    FROM user_days
),
classed AS (
    SELECT d,
           CASE WHEN prev_d IS NULL THEN 'new'
                WHEN date_diff('day', prev_d, d) >= {_RESURRECT_GAP_DAYS}
                THEN 'resurrected'
                ELSE 'returning' END AS state
    FROM lagged
)
SELECT d AS day,
       CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected,
       CAST(SUM(CASE WHEN state = 'returning' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returning
FROM classed
GROUP BY d
ORDER BY day
"""


@register("events_user_resurrection", oracle=_RESURRECTION_SQL)
def events_user_resurrection(spark: SparkSession, sf_dir: str) -> DataFrame:
    user_days = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = user_days.withColumn("prev_d", F.lag("d").over(w))
    state = (
        F.when(F.col("prev_d").isNull(), F.lit("new"))
        .when(
            F.datediff(F.col("d"), F.col("prev_d")) >= _RESURRECT_GAP_DAYS,
            F.lit("resurrected"),
        )
        .otherwise(F.lit("returning"))
    )
    return (
        lagged.select(F.col("d").alias("day"), state.alias("state"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("n_resurrected"),
            F.sum(F.when(F.col("state") == "returning", 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Session depth → conversion (round-9 continuation) — the funnel
# question sessionization exists to answer: do deeper sessions
# convert? Sessions are the same 30-minute-gap islands as
# events_sessionization_30min (identical flag/cumsum construction);
# each session's DEPTH (event count) buckets into 1 / 2-3 / 4-7 / 8+,
# and conversion = the session contains a purchase. Output per depth
# bucket: sessions, conversions, rate — all integers and one exact
# division.
# ---------------------------------------------------------------------------

_DEPTH_CONV_SQL = """
WITH flagged AS (
    SELECT user_id, event_type,
           CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (
                    PARTITION BY user_id ORDER BY ts
                ) >= INTERVAL 30 MINUTE THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                ELSE 0 END AS new_session,
           ts
    FROM events
),
sessions AS (
    SELECT user_id, event_type,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_no
    FROM flagged
),
per_session AS (
    SELECT user_id, session_no, COUNT(*) AS depth,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
    FROM sessions GROUP BY 1, 2
),
bucketed AS (
    SELECT CASE WHEN depth = 1 THEN '1'
                WHEN depth <= 3 THEN '2-3'
                WHEN depth <= 7 THEN '4-7'
                ELSE '8+' END AS depth_bucket,
           converted
    FROM per_session
)
SELECT depth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       ROUND(SUM(converted) * 1.0 / COUNT(*), 6) AS conversion_rate
FROM bucketed
GROUP BY depth_bucket
ORDER BY depth_bucket
"""


@register("events_session_depth_conversion", oracle=_DEPTH_CONV_SQL)
def events_session_depth_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Same session identity as events_sessionization_30min: the native
    # session_window (full-precision gap semantics, matching the
    # oracle's interval-lag flag construction).
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    per_session = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("depth"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    bucket = (
        F.when(F.col("depth") == 1, F.lit("1"))
        .when(F.col("depth") <= 3, F.lit("2-3"))
        .when(F.col("depth") <= 7, F.lit("4-7"))
        .otherwise(F.lit("8+"))
    )
    return (
        per_session.groupBy(bucket.alias("depth_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(
                F.sum("converted") * F.lit(1.0) / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
        .orderBy("depth_bucket")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (round 10) — the classic sequential
# drift detector over the daily event-count series: S+_i =
# max(0, S+_{i-1} + (x_i - mean)) flags sustained upward shifts, S-
# the downward ones, and the argmax day is the changepoint estimate.
# Exactness: with mean = T/D rational, everything is scaled by D —
# P_i = D*C_i - i*T (C = cumulative count) — and the recursive max
# unrolls to the CLOSED FORM S+_i = P_i - min(0, min_{j<=i} P_j), so
# both engines compute pure-integer prefix sums and running minima:
# no fold, no recursion, bit-exact. The daily frame is time-range
# bounded (the whitelisted global-window class); products D*C stay in
# BIGINT until D*N exceeds 2^63 (~2.5e15 events at a 10-year span).
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS x
    FROM events GROUP BY 1
),
t AS (SELECT COUNT(*) AS nd, SUM(x) AS tot FROM daily),
p AS (
    SELECT d,
           CAST(t.nd AS BIGINT) * SUM(x) OVER (ORDER BY d)
             - ROW_NUMBER() OVER (ORDER BY d) * CAST(t.tot AS BIGINT) AS pi
    FROM daily, t
),
s AS (
    SELECT d, pi,
           pi - LEAST(0, MIN(pi) OVER (ORDER BY d)) AS s_up,
           GREATEST(0, MAX(pi) OVER (ORDER BY d)) - pi AS s_down
    FROM p
),
m AS (SELECT MAX(s_up) AS up_max, MAX(s_down) AS down_max FROM s)
SELECT (SELECT CAST(nd AS BIGINT) FROM t) AS n_days,
       (SELECT CAST(tot AS BIGINT) FROM t) AS n_events,
       CAST(m.up_max AS BIGINT) AS cusum_up_max,
       (SELECT MIN(d) FROM s WHERE s.s_up = m.up_max) AS up_peak_day,
       CAST(m.down_max AS BIGINT) AS cusum_down_max,
       (SELECT MIN(d) FROM s WHERE s.s_down = m.down_max) AS down_peak_day
FROM m
"""


@register("events_cusum_changepoint", oracle=_CUSUM_SQL)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    t = daily.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("x").alias("tot")
    )
    w = Window.orderBy("d")  # time-range-bounded daily frame
    p = (
        daily.crossJoin(broadcast(t))
        .select(
            "d",
            "nd",
            "tot",
            (
                F.col("nd") * F.sum("x").over(w)
                - F.row_number().over(w) * F.col("tot")
            ).alias("pi"),
        )
    )
    s = session_cache(
        p.select(
            "d",
            "nd",
            "tot",
            (
                F.col("pi")
                - F.least(F.lit(0).cast("long"), F.min("pi").over(w))
            ).alias("s_up"),
            (
                F.greatest(F.lit(0).cast("long"), F.max("pi").over(w))
                - F.col("pi")
            ).alias("s_down"),
        )
    )
    m = s.agg(F.max("s_up").alias("up_max"), F.max("s_down").alias("down_max"))
    up_day = (
        s.join(broadcast(m), s["s_up"] == m["up_max"])
        .agg(F.min("d").alias("up_peak_day"))
    )
    down_day = (
        s.join(broadcast(m), s["s_down"] == m["down_max"])
        .agg(F.min("d").alias("down_peak_day"))
    )
    # Final row from the AGGREGATE frames (t/m/up_day/down_day always
    # yield exactly one row) — not limit(1) over the windowed data
    # frame, which is empty on an empty events table while the oracle's
    # scalar subqueries still emit one NULL/0 row (r10 ADVICE).
    return (
        t.crossJoin(broadcast(m))
        .crossJoin(broadcast(up_day))
        .crossJoin(broadcast(down_day))
        .select(
            F.col("nd").cast("long").alias("n_days"),
            F.col("tot").cast("long").alias("n_events"),
            F.col("up_max").alias("cusum_up_max"),
            "up_peak_day",
            F.col("down_max").alias("cusum_down_max"),
            "down_peak_day",
        )
    )


# ---------------------------------------------------------------------------
# Explicit HyperLogLog registers (round 10) — the sketch the built-in
# approx_count_distinct hides, implemented register-by-register so BOTH
# engines reproduce it bit-for-bit AND the distributed-merge property
# is verified in-query: per-type register banks max-merged equal the
# globally-built bank (max is associative/commutative — the reason HLL
# shards freely across 1000 executors). Exactness: the shared 60-bit
# md5 hash splits into an 8-bit register index and a 52-bit window;
# rho = 53 - bitlength(w) is pure integer; the harmonic denominator is
# accumulated as the INTEGER sum of 2^(53-M) (<= 256*2^53 < 2^63), so
# the only floating-point op is the final alpha*m^2*2^53/Z divide —
# identical IEEE on identical integers. n_zero registers use the
# standard raw estimate (no linear-counting branch: ln() is libm- and
# engine-dependent; documented trade).
# ---------------------------------------------------------------------------

_HLL_M = 256  # registers (b = 8 index bits of the 60-bit hash)

_HLL_SQL = f"""
WITH h AS (
    SELECT event_type,
           CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
               AS hv
    FROM events
),
rw AS (
    SELECT event_type, hv % {_HLL_M} AS reg, hv // {_HLL_M} AS w FROM h
),
rho AS (
    SELECT event_type, reg,
           CASE WHEN w = 0 THEN 53 ELSE 53 - LENGTH(bin(w)) END AS r
    FROM rw
),
global_regs AS (SELECT reg, MAX(r) AS m FROM rho GROUP BY reg),
type_regs AS (SELECT event_type, reg, MAX(r) AS m FROM rho GROUP BY 1, 2),
merged AS (SELECT reg, MAX(m) AS m FROM type_regs GROUP BY reg),
zg AS (
    SELECT {_HLL_M} - COUNT(*) AS n_zero,
           SUM(CAST(1 AS BIGINT) << (53 - m)) AS z_used
    FROM global_regs
),
est AS (
    SELECT n_zero,
           (0.7213 / (1.0 + 1.079 / {_HLL_M}.0)) * {_HLL_M}.0 * {_HLL_M}.0
             * CAST(CAST(1 AS BIGINT) << 53 AS DOUBLE)
             / CAST(z_used + n_zero * (CAST(1 AS BIGINT) << 53) AS DOUBLE)
               AS raw
    FROM zg
),
x AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events),
chk AS (
    SELECT COUNT(*) = 0 AS merged_equals_global
    FROM (
        SELECT reg, m FROM merged
        EXCEPT
        SELECT reg, m FROM global_regs
    )
)
SELECT CAST(x.n_exact AS BIGINT) AS n_exact,
       ROUND(est.raw, 6) AS hll_estimate,
       CAST(est.n_zero AS BIGINT) AS n_zero_registers,
       ROUND(100.0 * (est.raw - x.n_exact) / x.n_exact, 4) AS rel_error_pct,
       chk.merged_equals_global
FROM x, est, chk
"""


@register("events_hll_registers", oracle=_HLL_SQL)
def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import hash60, session_cache

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = ev.select(
        "event_type", hash60(F.col("user_id").cast("string")).alias("hv")
    )
    rho = session_cache(
        h.select(
            "event_type",
            (F.col("hv") % _HLL_M).alias("reg"),
            F.when(F.col("hv") / _HLL_M < 1, F.lit(53))
            .otherwise(
                F.lit(53) - F.length(F.bin(F.expr(f"hv div {_HLL_M}")))
            )
            .cast("long")
            .alias("r"),
        )
    )
    global_regs = session_cache(
        rho.groupBy("reg").agg(F.max("r").alias("m"))
    )
    merged = (
        rho.groupBy("event_type", "reg")
        .agg(F.max("r").alias("m"))
        .groupBy("reg")
        .agg(F.max("m").alias("m"))
    )
    chk = (
        merged.exceptAll(global_regs)
        .agg((F.count(F.lit(1)) == 0).alias("merged_equals_global"))
    )
    zg = global_regs.agg(
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("n_zero"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))"))
        .alias("z_used"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    two53 = float(1 << 53)
    raw = (
        F.lit(alpha)
        * F.lit(float(_HLL_M) * float(_HLL_M))
        * F.lit(two53)
        / (
            F.col("z_used") + F.col("n_zero") * F.lit(1 << 53).cast("long")
        ).cast("double")
    )
    x = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (
        x.crossJoin(broadcast(zg))
        .crossJoin(broadcast(chk))
        .select(
            "n_exact",
            F.round(raw, 6).alias("hll_estimate"),
            F.col("n_zero").alias("n_zero_registers"),
            F.round(
                F.lit(100.0) * (raw - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_error_pct"),
            "merged_equals_global",
        )
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution, two exact power steps (round 10) —
# the transition matrix's downstream consumer: where does user
# behavior CONCENTRATE if the observed dynamics run forward? pi_2 =
# pi_0 P^2 from the uniform start over the BOUNDED event-type space.
# Exactness without rationals blowing up: P[i][j] = C[i][j]/R[i] is one
# IEEE divide per cell from exact counts; each mat-vec accumulates in
# EXPLICIT ascending-type order (sorted list fold on both engines —
# relational SUM guarantees no order, so it is never used on the
# doubles), making every intermediate bit-identical. K is the type
# cardinality (bounded domain), so lists and folds are K-sized — the
# same bounded-frame argument as the Holt fold. Absorbing/unseen rows
# keep pi mass in place (identity row), the standard lazy completion.
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
c AS (
    SELECT prev_type AS i, event_type AS j, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type AS t FROM events),
k AS (SELECT COUNT(*) AS kk FROM types),
r AS (SELECT i, SUM(n) AS tot FROM c GROUP BY i),
-- dense K x K matrix with identity completion for unseen rows
p AS (
    SELECT a.t AS i, b.t AS j,
           CASE WHEN r.tot IS NULL THEN CASE WHEN a.t = b.t THEN 1.0 ELSE 0.0 END
                ELSE COALESCE(c.n, 0) / CAST(r.tot AS DOUBLE) END AS pij
    FROM types a
    CROSS JOIN types b
    LEFT JOIN r ON r.i = a.t
    LEFT JOIN c ON c.i = a.t AND c.j = b.t
),
pi1 AS (
    SELECT j, list_sum(list(pi0_term ORDER BY i)) AS v
    FROM (SELECT i, j, (1.0 / kk) * pij AS pi0_term FROM p, k)
    GROUP BY j
),
pi2 AS (
    SELECT p.j, list_sum(list(pi1.v * p.pij ORDER BY p.i)) AS v
    FROM p JOIN pi1 ON pi1.j = p.i
    GROUP BY p.j
)
SELECT j AS event_type, ROUND(v, 6) AS pi_2step
FROM pi2 ORDER BY event_type
"""


@register("events_markov_stationary_2step", oracle=_MARKOV_SQL)
def events_markov_stationary_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("i"), F.col("event_type").alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    types = session_cache(
        ev.select(F.col("event_type").alias("t")).distinct()
    )
    kk = types.agg(F.count(F.lit(1)).alias("kk"))
    r = c.groupBy("i").agg(F.sum("n").alias("tot"))
    p = session_cache(
        types.select(F.col("t").alias("i"))
        .crossJoin(broadcast(types.select(F.col("t").alias("j"))))
        .join(broadcast(r), "i", "left")
        .join(broadcast(c), ["i", "j"], "left")
        .select(
            "i",
            "j",
            F.when(
                F.col("tot").isNull(),
                F.when(F.col("i") == F.col("j"), 1.0).otherwise(0.0),
            )
            .otherwise(
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("tot").cast("double")
            )
            .alias("pij"),
        )
    )
    # Ordered K-term folds: sort_array(collect_list(struct(i, term)))
    # then an explicit left-to-right aggregate — relational SUM has no
    # order guarantee, so the doubles never go through it.
    pi1 = (
        p.crossJoin(broadcast(kk))
        .select("i", "j", ((F.lit(1.0) / F.col("kk")) * F.col("pij")).alias("term"))
        .groupBy("j")
        .agg(F.sort_array(F.collect_list(F.struct("i", "term"))).alias("a"))
        .select(
            F.col("j").alias("i"),  # pi1 indexed by state for the next step
            F.expr(
                "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.term)"
            ).alias("v"),
        )
    )
    pi2 = (
        p.join(broadcast(pi1), "i")
        .select("i", "j", (F.col("v") * F.col("pij")).alias("term"))
        .groupBy("j")
        .agg(F.sort_array(F.collect_list(F.struct("i", "term"))).alias("a"))
        .select(
            F.col("j").alias("event_type"),
            F.round(
                F.expr(
                    "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x.term)"
                ),
                6,
            ).alias("pi_2step"),
        )
    )
    return pi2.orderBy("event_type")


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition (round 10) — the multi-resolution
# spectral profile of the daily activity series: which TIME SCALE
# (day-to-day, week-ish, month-ish...) carries the variance. The usual
# recursive averaging cascade is rewritten as a closed form: the
# unnormalized detail coefficient at level l, block k is the SIGNED
# block sum d_{l,k} = sum_i sign_l(i) * x_i with sign_l(i) = +1 when
# bit (l-1) of the day index is 0, else -1 — so ONE explode of each
# day into its log2(P) levels plus ONE hash aggregate computes every
# coefficient: no recursion, no per-level passes, all integers
# (energies fit BIGINT while sum(x)^2 * levels < 2^63). Missing days
# inside the padded power-of-two span act as zeros by simply being
# absent. The day-index frame is time-range bounded (whitelisted
# global-window class).
# ---------------------------------------------------------------------------

_HAAR_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS x
    FROM events GROUP BY 1
),
idx AS (
    SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i, x FROM daily
),
span AS (
    -- ceil(log2(D)) computed as bitlength(D-1) = LENGTH(bin(max_i)) —
    -- pure integer, no libm log2 edge cases at exact powers of two
    SELECT CAST(LENGTH(bin(GREATEST(MAX(i), 1))) AS BIGINT) AS nlev
    FROM idx
),
coef AS (
    SELECT l.lvl,
           i // (CAST(1 AS BIGINT) << l.lvl) AS k,
           SUM(CASE WHEN (i // (CAST(1 AS BIGINT) << (l.lvl - 1))) % 2 = 0
                    THEN x ELSE -x END) AS dlk
    FROM idx, span,
         LATERAL (SELECT UNNEST(range(1, nlev + 1)) AS lvl) l
    GROUP BY 1, 2
)
SELECT CAST(lvl AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(dlk * dlk) AS BIGINT) AS energy
FROM coef
GROUP BY lvl
ORDER BY lvl
"""


@register("events_haar_energy_levels", oracle=_HAAR_SQL)
def events_haar_energy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("d")  # time-range-bounded daily spine
    idx = daily.select((F.row_number().over(w) - 1).alias("i"), "x")
    span = idx.agg(
        F.length(F.bin(F.greatest(F.max("i"), F.lit(1))))
        .cast("long")
        .alias("nlev")
    )
    coef = (
        idx.crossJoin(broadcast(span))
        .select(
            "i",
            "x",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("nlev"))).alias(
                "lvl"
            ),
        )
        .select(
            "lvl",
            F.expr("i div shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))").alias(
                "k"
            ),
            F.when(
                F.expr(
                    "(i div shiftleft(CAST(1 AS BIGINT), CAST(lvl - 1 AS INT))) % 2"
                )
                == 0,
                F.col("x"),
            )
            .otherwise(-F.col("x"))
            .alias("sx"),
        )
        .groupBy("lvl", "k")
        .agg(F.sum("sx").alias("dlk"))
    )
    return (
        coef.groupBy(F.col("lvl").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.col("dlk") * F.col("dlk")).cast("long").alias("energy"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# Daily-series autocorrelation / period detection (round 10) — the ACF
# at lags 1..14 over the daily event counts, the instrument that finds
# weekly rhythm (lag 7) before any seasonal model is fit. Exactness by
# cross-multiplication: with mean = T/D rational, every centered term
# scales by D — num(k) = sum (D*x_i - T)(D*x_{i+k} - T) and
# den = sum (D*x_i - T)^2 are exact integers (DECIMAL(38,0)/HUGEINT;
# D^2*x^2 products) — and acf = num/den is one IEEE divide. Pairs with
# a missing day on either side are simply absent (gap-tolerant ACF;
# n_pairs is reported so the reader sees coverage). The lag dim is a
# 14-row literal; the daily frame is time-range bounded.
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 14

_ACF_SQL = f"""
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01',
                CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                AS BIGINT) AS dn,
           COUNT(*) AS x
    FROM events GROUP BY 1
),
t AS (SELECT COUNT(*) AS d, SUM(x) AS tot FROM daily),
c AS (
    SELECT dn, CAST(t.d AS HUGEINT) * x - CAST(t.tot AS HUGEINT) AS y
    FROM daily, t
),
den AS (SELECT SUM(y * y) AS dd FROM c),
lags AS (SELECT UNNEST(range(1, {_ACF_MAX_LAG} + 1)) AS k),
num AS (
    SELECT l.k, COUNT(*) AS n_pairs, SUM(a.y * b.y) AS nn
    FROM lags l
    JOIN c a ON TRUE
    JOIN c b ON b.dn = a.dn + l.k
    GROUP BY l.k
)
SELECT CAST(num.k AS BIGINT) AS lag,
       CAST(num.n_pairs AS BIGINT) AS n_pairs,
       ROUND(CAST(CAST(num.nn AS VARCHAR) AS DOUBLE)
             / CAST(CAST(den.dd AS VARCHAR) AS DOUBLE), 6) AS acf
FROM num, den
ORDER BY lag
"""


@register("events_daily_autocorrelation", oracle=_ACF_SQL)
def events_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("long")
            .alias("dn")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    t = daily.agg(F.count(F.lit(1)).alias("d"), F.sum("x").alias("tot"))
    c = session_cache(
        daily.crossJoin(broadcast(t)).select(
            "dn",
            (
                F.col("d").cast("decimal(19,0)") * F.col("x")
                - F.col("tot").cast("decimal(19,0)")
            ).alias("y"),
        )
    )
    den = c.agg(F.sum(F.col("y") * F.col("y")).alias("dd"))
    lags = c.sparkSession.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").alias("k")
    )
    a = c.select(F.col("dn").alias("dna"), F.col("y").alias("ya"))
    b = c.select(F.col("dn").alias("dnb"), F.col("y").alias("yb"))
    num = (
        a.crossJoin(broadcast(lags))
        .join(b, F.col("dnb") == F.col("dna") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("ya") * F.col("yb")).alias("nn"),
        )
    )
    dd = lambda c_: F.col(c_).cast("string").cast("double")  # noqa: E731
    return (
        num.crossJoin(broadcast(den))
        .select(
            F.col("k").cast("long").alias("lag"),
            "n_pairs",
            F.round(dd("nn") / dd("dd"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (round 10) — the data-driven
# multi-touch attribution model: each user's journey (event sequence up
# to the first purchase, mapped start -> channels -> conv/null) builds
# a first-order transition matrix; a channel's credit is its REMOVAL
# EFFECT, 1 - P(conv | channel deleted)/P(conv), with conversion
# probability taken over paths of <= 3 steps (the bounded-path
# truncation that replaces the absorbing-chain inversion — exact DP,
# no matrix solve). Exactness: transition probs are single IEEE
# divides from exact counts; every DP contraction sums its K channel
# terms via an ORDERED fold (sorted-state list, never relational SUM
# on doubles); the state space is the bounded event-type enum, so the
# whole DP is a few hundred rows regardless of corpus size.
# ---------------------------------------------------------------------------

_ATTR_SQL = """
WITH seq AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 'conv' ELSE event_type END
               AS st,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id) AS first_conv_ts
    FROM events
),
trunc AS (
    SELECT user_id, ts, event_id, st FROM seq
    WHERE first_conv_ts IS NULL OR ts <= first_conv_ts
),
hops AS (
    SELECT user_id, st,
           LAG(st) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n,
           MAX(CASE WHEN st = 'conv' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS converted
    FROM trunc
),
trans AS (
    SELECT 'start' AS f, st AS t FROM hops WHERE rn = 1
    UNION ALL
    SELECT prev, st FROM hops WHERE prev IS NOT NULL
    UNION ALL
    SELECT st, 'null' FROM hops WHERE rn = n AND converted = 0
),
c AS (SELECT f, t, COUNT(*) AS n FROM trans GROUP BY f, t),
r AS (SELECT f, SUM(n) AS tot FROM c GROUP BY f),
p AS (SELECT c.f, c.t, c.n / CAST(r.tot AS DOUBLE) AS pv FROM c JOIN r USING (f)),
chans AS (
    SELECT DISTINCT f AS ch FROM c WHERE f NOT IN ('start', 'conv', 'null')
),
removals AS (SELECT 'none' AS rm UNION ALL SELECT ch FROM chans),
pr AS (
    SELECT rm, f, t, pv FROM p, removals
    WHERE f <> rm AND t <> rm
),
g1 AS (
    SELECT rm, f, COALESCE(MAX(CASE WHEN t = 'conv' THEN pv END), 0.0) AS v
    FROM pr GROUP BY rm, f
),
g2 AS (
    SELECT g1.rm, g1.f,
           g1.v + COALESCE(list_sum(list(pr.pv * gt.v ORDER BY pr.t)), 0.0) AS v
    FROM g1
    LEFT JOIN pr ON pr.rm = g1.rm AND pr.f = g1.f
        AND pr.t NOT IN ('conv', 'null', 'start')
    LEFT JOIN g1 gt ON gt.rm = g1.rm AND gt.f = pr.t
    GROUP BY g1.rm, g1.f, g1.v
),
g3 AS (
    SELECT g1.rm, g1.f,
           g1.v + COALESCE(list_sum(list(pr.pv * gt.v ORDER BY pr.t)), 0.0) AS v
    FROM g1
    LEFT JOIN pr ON pr.rm = g1.rm AND pr.f = g1.f
        AND pr.t NOT IN ('conv', 'null', 'start')
    LEFT JOIN g2 gt ON gt.rm = g1.rm AND gt.f = pr.t
    GROUP BY g1.rm, g1.f, g1.v
),
base AS (SELECT v FROM g3 WHERE rm = 'none' AND f = 'start')
SELECT g3.rm AS channel,
       ROUND(g3.v, 6) AS p_conv_3step,
       ROUND(1.0 - g3.v / base.v, 6) AS removal_effect
FROM g3, base
WHERE g3.f = 'start' AND g3.rm <> 'none'
ORDER BY channel
"""


@register("events_markov_attribution", oracle=_ATTR_SQL)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wq = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("st"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(wq).alias("first_conv_ts"),
    )
    trunc = seq.filter(
        F.col("first_conv_ts").isNull() | (F.col("ts") <= F.col("first_conv_ts"))
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = trunc.select(
        "st",
        F.lag("st").over(wo).alias("prev"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wq).alias("n"),
        F.max(F.when(F.col("st") == "conv", 1).otherwise(0))
        .over(wq)
        .alias("converted"),
    )
    # One pass emits every transition a row contributes (entry hop,
    # observed hop, terminal null-hop) as an array, exploded — the
    # 3-branch union form re-executed the whole window pipeline per
    # branch (Catalyst does not share common subtrees across a union:
    # measured 2.3 s -> 1.2 s for the transition phase at sf0.1).
    # Union order never mattered (the next step is a count aggregate),
    # so counts are bit-identical.
    trans = hops.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.when(
                        F.col("rn") == 1,
                        F.struct(
                            F.lit("start").alias("f"), F.col("st").alias("t")
                        ),
                    ),
                    F.when(
                        F.col("prev").isNotNull(),
                        F.struct(
                            F.col("prev").alias("f"), F.col("st").alias("t")
                        ),
                    ),
                    F.when(
                        (F.col("rn") == F.col("n"))
                        & (F.col("converted") == 0),
                        F.struct(
                            F.col("st").alias("f"), F.lit("null").alias("t")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.f", "p.t")
    c = trans.groupBy("f", "t").agg(F.count(F.lit(1)).alias("n"))
    r = c.groupBy("f").agg(F.sum("n").alias("tot"))
    # The transition matrix is bounded by the event-type enum (K states
    # + start/conv/null), NEVER data-proportional: collect it (one
    # bounded action, the adjudicated bounded-probe class) and run the
    # (K+1)-removal x 3-step DP as driver math instead of unrolling it
    # into a Catalyst plan. The unrolled form compounded every
    # contraction's lineage into a ~2,800-line physical plan (267
    # Exchanges before AQE reuse) whose per-action planning cost
    # dominated end-to-end latency (round-13 receipt in
    # OPTIMIZATION_r13.md: 4.3 s -> ~1 s at sf0.1). Exactness is
    # preserved operation-for-operation: terms fold in sorted-t order
    # (the sort_array convention), max/plus/mul on IEEE doubles are
    # bit-identical in Python and the JVM, and the final ROUNDs still
    # run in Spark on the assembled frame.
    p_rows = (
        c.join(r, "f")
        .select(
            "f", "t", (F.col("n") / F.col("tot").cast("double")).alias("pv")
        )
        .collect()
    )
    P = {(row["f"], row["t"]): row["pv"] for row in p_rows}
    chans = sorted({f for (f, _t) in P if f not in ("start", "conv", "null")})

    def conv3(rm: str):
        pr = {(f, t): pv for (f, t), pv in P.items() if f != rm and t != rm}
        fs = sorted({f for (f, _t) in pr})
        g1 = {}
        for f in fs:
            vals = [pv for (ff, t), pv in pr.items() if ff == f and t == "conv"]
            g1[f] = max(vals) if vals else 0.0

        def contract(g_prev: dict) -> dict:
            out = {}
            for f in fs:
                # Ordered K-term fold (sorted target list, left-to-right
                # accumulation) — mirrors the oracle's
                # list_sum(list(... ORDER BY t)) exactly; a term whose
                # target never occurs as a source state drops out, the
                # inner-join/NULL-skip convention both engines share.
                terms = sorted(
                    (t, pv * g_prev[t])
                    for (ff, t), pv in pr.items()
                    if ff == f
                    and t not in ("conv", "null", "start")
                    and t in g_prev
                )
                acc = 0.0
                for _t, w in terms:
                    acc = acc + w
                out[f] = g1[f] + acc
            return out

        g3 = contract(contract(g1))
        return g3.get("start")

    basev = conv3("none")
    out_rows = [
        (rm, float(v), float(basev))
        for rm in chans
        for v in [conv3(rm)]
        if v is not None and basev is not None
    ]
    return (
        spark.createDataFrame(
            out_rows, "channel string, v double, basev double"
        )
        .select(
            "channel",
            F.round(F.col("v"), 6).alias("p_conv_3step"),
            F.round(F.lit(1.0) - F.col("v") / F.col("basev"), 6).alias(
                "removal_effect"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift changepoint (round 11) — the drift-TOLERANT
# companion to events_cusum_changepoint: CUSUM clamps its statistic at
# zero and flags any deviation from the global mean, while Page-Hinkley
# measures the maximum drawup/drawdown of the cumulative deviation
# AFTER granting an explicit per-day drift allowance delta (here 5% of
# the mean daily rate, floor), so slow trends don't alarm. Exactness:
# with mean = T/D and delta = T div (20*D), everything scales by D —
# PU_i = D*C_i - i*(T + delta*D) — and the running-extremum difference
# is pure-integer prefix sums and minima/maxima: bit-exact on both
# engines. 100 TB: the daily frame is time-range bounded (whitelisted
# global-window class); D*C stays in BIGINT until D*N ~ 2^63.
# ---------------------------------------------------------------------------

_PAGE_HINKLEY_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS x
    FROM events GROUP BY 1
),
t AS (
    SELECT COUNT(*) AS nd, SUM(x) AS tot,
           CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(x) // (20 * COUNT(*)) END AS delta
    FROM daily
),
p AS (
    SELECT d,
           CAST(t.nd AS BIGINT) * SUM(x) OVER (ORDER BY d)
             - ROW_NUMBER() OVER (ORDER BY d)
               * (CAST(t.tot AS BIGINT)
                  + CAST(t.delta AS BIGINT) * CAST(t.nd AS BIGINT)) AS pu,
           CAST(t.nd AS BIGINT) * SUM(x) OVER (ORDER BY d)
             - ROW_NUMBER() OVER (ORDER BY d)
               * (CAST(t.tot AS BIGINT)
                  - CAST(t.delta AS BIGINT) * CAST(t.nd AS BIGINT)) AS qd
    FROM daily, t
),
s AS (
    SELECT d,
           pu - MIN(pu) OVER (ORDER BY d) AS ph_up,
           MAX(qd) OVER (ORDER BY d) - qd AS ph_down
    FROM p
),
m AS (SELECT MAX(ph_up) AS up_max, MAX(ph_down) AS down_max FROM s)
SELECT (SELECT CAST(nd AS BIGINT) FROM t) AS n_days,
       (SELECT CAST(tot AS BIGINT) FROM t) AS n_events,
       (SELECT CAST(delta AS BIGINT) FROM t) AS delta_per_day,
       CAST(m.up_max AS BIGINT) AS ph_up_max,
       (SELECT MIN(d) FROM s WHERE s.ph_up = m.up_max) AS up_peak_day,
       CAST(m.down_max AS BIGINT) AS ph_down_max,
       (SELECT MIN(d) FROM s WHERE s.ph_down = m.down_max) AS down_peak_day
FROM m
"""


@register("events_page_hinkley_drift", oracle=_PAGE_HINKLEY_SQL)
def events_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    t = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("x").alias("tot"),
        F.when(F.count(F.lit(1)) == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("sum(x) div (20 * count(1))"))
        .alias("delta"),
    )
    w = Window.orderBy("d")  # time-range-bounded daily frame
    p = daily.crossJoin(broadcast(t)).select(
        "d",
        "nd",
        "tot",
        "delta",
        (
            F.col("nd") * F.sum("x").over(w)
            - F.row_number().over(w)
            * (F.col("tot") + F.col("delta") * F.col("nd"))
        ).alias("pu"),
        (
            F.col("nd") * F.sum("x").over(w)
            - F.row_number().over(w)
            * (F.col("tot") - F.col("delta") * F.col("nd"))
        ).alias("qd"),
    )
    s = session_cache(
        p.select(
            "d",
            "nd",
            "tot",
            "delta",
            (F.col("pu") - F.min("pu").over(w)).alias("ph_up"),
            (F.max("qd").over(w) - F.col("qd")).alias("ph_down"),
        )
    )
    m = s.agg(
        F.max("ph_up").alias("up_max"), F.max("ph_down").alias("down_max")
    )
    up_day = (
        s.join(broadcast(m), s["ph_up"] == m["up_max"])
        .agg(F.min("d").alias("up_peak_day"))
    )
    down_day = (
        s.join(broadcast(m), s["ph_down"] == m["down_max"])
        .agg(F.min("d").alias("down_peak_day"))
    )
    # Final row from the AGGREGATE frames (each always one row) — never
    # limit(1) over the windowed data frame (empty-input parity).
    return (
        t.crossJoin(broadcast(m))
        .crossJoin(broadcast(up_day))
        .crossJoin(broadcast(down_day))
        .select(
            F.col("nd").cast("long").alias("n_days"),
            F.col("tot").cast("long").alias("n_events"),
            F.col("delta").cast("long").alias("delta_per_day"),
            F.col("up_max").alias("ph_up_max"),
            "up_peak_day",
            F.col("down_max").alias("ph_down_max"),
            "down_peak_day",
        )
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank over paired per-user era activity (round 11) —
# the PAIRED companion to the Mann-Whitney drift test: each user is
# their own control (event count in the window's first half vs the
# second), so between-user variance cancels and the test asks only
# "did individual users change?". Rank math is the doubled-rank trick
# from the MWU query: per |diff| tie group the averaged rank is
# (2*cum_before + cnt + 1)/2, accumulated doubled so everything stays
# integral; W+ sums positive-diff users' ranks; the z-score's
# n(n+1)(2n+1)/24 variance (tie-corrected by sum(t^3-t)/48) is derived
# from the same exact integers via the VARCHAR crossing. 100 TB: the
# per-user frame is data-proportional — its running count uses the
# two-phase distributed cumsum, never a single-task sort.
# ---------------------------------------------------------------------------

_WILCOXON_SQL = """
WITH b AS (
    SELECT CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP))) AS BIGINT) AS lo,
           CAST(FLOOR(epoch(CAST(MAX(ts) AS TIMESTAMP))) AS BIGINT) AS hi
    FROM events
),
u AS (
    SELECT user_id,
           SUM(CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                         * 2 <= lo + hi THEN 1 ELSE 0 END) AS c0,
           SUM(CASE WHEN CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                         * 2 > lo + hi THEN 1 ELSE 0 END) AS c1
    FROM events, b GROUP BY user_id
),
dnz AS (
    SELECT c1 - c0 AS diff, ABS(c1 - c0) AS adiff FROM u WHERE c1 <> c0
),
g AS (
    SELECT adiff, COUNT(*) AS cnt,
           SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS npos
    FROM dnz GROUP BY adiff
),
o AS (
    SELECT adiff, cnt, npos,
           COALESCE(SUM(cnt) OVER (ORDER BY adiff
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM g
),
s AS (
    SELECT SUM(CAST(cnt AS HUGEINT)) AS n,
           SUM(CAST(npos AS HUGEINT) * (2 * CAST(cb AS HUGEINT)
                                        + CAST(cnt AS HUGEINT) + 1)) AS w2,
           SUM(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)
               * CAST(cnt AS HUGEINT) - CAST(cnt AS HUGEINT)) AS tie3
    FROM o
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(CAST(w2 AS VARCHAR) AS DOUBLE) / 2.0 AS w_plus,
       CASE WHEN n IS NULL OR n < 2 THEN NULL ELSE
         ROUND((CAST(CAST(w2 AS VARCHAR) AS DOUBLE) / 2.0
                - CAST(CAST(n * (n + 1) AS VARCHAR) AS DOUBLE) / 4.0)
               / SQRT(CAST(CAST(n * (n + 1) * (2 * n + 1) AS VARCHAR)
                           AS DOUBLE) / 24.0
                      - CAST(CAST(tie3 AS VARCHAR) AS DOUBLE) / 48.0), 6)
       END AS z_score
FROM s
"""


@register("events_wilcoxon_signed_rank", oracle=_WILCOXON_SQL)
def events_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    bounds = ev.agg(F.min("sec").alias("lo"), F.max("sec").alias("hi"))
    u = (
        ev.crossJoin(broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("sec") * 2 <= F.col("lo") + F.col("hi"), 1)
                .otherwise(0)
            ).alias("c0"),
            F.sum(
                F.when(F.col("sec") * 2 > F.col("lo") + F.col("hi"), 1)
                .otherwise(0)
            ).alias("c1"),
        )
    )
    dnz = u.filter(F.col("c1") != F.col("c0")).select(
        (F.col("c1") - F.col("c0")).alias("diff"),
        F.abs(F.col("c1") - F.col("c0")).alias("adiff"),
    )
    g = dnz.groupBy("adiff").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("npos"),
    )
    o = two_phase_order(
        g, [F.asc("adiff")], F.col("adiff"), cumsum=("cnt", "cum_incl")
    ).select("cnt", "npos", (F.col("cum_incl") - F.col("cnt")).alias("cb"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = o.agg(
        F.sum(d19("cnt")).alias("n"),
        F.sum(
            d19("npos")
            * (F.lit(2).cast("decimal(19,0)") * d19("cb") + d19("cnt") + 1)
        ).alias("w2"),
        F.sum(d19("cnt") * d19("cnt") * d19("cnt") - d19("cnt")).alias("tie3"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    n = F.col("n")
    w_plus = dd(F.col("w2")) / F.lit(2.0)
    z = (
        w_plus - dd(n * (n + 1)) / F.lit(4.0)
    ) / F.sqrt(
        dd(n * (n + 1) * (2 * n + 1)) / F.lit(24.0)
        - dd(F.col("tie3")) / F.lit(48.0)
    )
    return s.select(
        n.cast("long").alias("n_pairs"),
        w_plus.alias("w_plus"),
        F.when(n.isNull() | (n < 2), F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test over the daily series (round 11) — is the
# sequence of above/below-median days RANDOM, or does it cluster
# (regimes) / alternate (overcorrection)? Median exactness: the doubled
# comparison 2*x vs x_(ceil(D/2)) + x_(floor(D/2)+1) keeps the even-D
# half-sample median integral; equal-to-median days are dropped per the
# standard test. The run count is a LAG inequality sum over the daily
# spine (time-range bounded, whitelisted); n1/n2/r are exact integers
# and the normal-approximation z is derived from them via the VARCHAR
# crossing. Degenerate guards (all days one side, < 2 kept days) yield
# NULL on both engines.
# ---------------------------------------------------------------------------

_RUNS_TEST_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           COUNT(*) AS x
    FROM events GROUP BY 1
),
t AS (SELECT COUNT(*) AS nd FROM daily),
rk AS (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn FROM daily
),
med AS (
    SELECT SUM(CASE WHEN rn = (t.nd + 1) // 2 THEN x ELSE 0 END)
           + SUM(CASE WHEN rn = t.nd // 2 + 1 THEN x ELSE 0 END) AS med2
    FROM rk, t
),
signs AS (
    SELECT d, CASE WHEN 2 * x > med2 THEN 1 ELSE -1 END AS s
    FROM daily, med WHERE 2 * x <> med2
),
runs AS (SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signs),
c AS (
    SELECT COUNT(*) AS n_kept,
           SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
           SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n2,
           SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END) AS r
    FROM runs
)
SELECT (SELECT CAST(nd AS BIGINT) FROM t) AS n_days,
       CAST(c.n_kept AS BIGINT) AS n_kept,
       CAST(c.n1 AS BIGINT) AS n_plus,
       CAST(c.n2 AS BIGINT) AS n_minus,
       CAST(c.r AS BIGINT) AS n_runs,
       CASE WHEN COALESCE(c.n1, 0) = 0 OR COALESCE(c.n2, 0) = 0 THEN NULL
            ELSE ROUND(1.0 + 2.0 * CAST(CAST(c.n1 AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(c.n2 AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE), 6)
       END AS expected_runs,
       CASE WHEN COALESCE(c.n1, 0) = 0 OR COALESCE(c.n2, 0) = 0
                 OR c.n_kept < 3 THEN NULL
            ELSE ROUND(
              (CAST(CAST(c.r AS VARCHAR) AS DOUBLE)
               - (1.0 + 2.0 * CAST(CAST(c.n1 AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(c.n2 AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE)))
              / SQRT((2.0 * CAST(CAST(c.n1 AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(c.n2 AS VARCHAR) AS DOUBLE)
                      * (2.0 * CAST(CAST(c.n1 AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(c.n2 AS VARCHAR) AS DOUBLE)
                         - CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE)))
                     / (CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE)
                        * (CAST(CAST(c.n_kept AS VARCHAR) AS DOUBLE) - 1.0))),
              6)
       END AS z_score
FROM c
"""


@register("events_runs_test_daily", oracle=_RUNS_TEST_SQL)
def events_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    daily = session_cache(
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    t = daily.agg(F.count(F.lit(1)).alias("nd"))
    wrk = Window.orderBy("x", "d")  # time-range-bounded daily frame
    rk = daily.select("x", F.row_number().over(wrk).alias("rn"))
    med = rk.crossJoin(broadcast(t)).agg(
        (
            F.sum(
                F.when(
                    F.col("rn") == F.expr("(nd + 1) div 2"), F.col("x")
                ).otherwise(0)
            )
            + F.sum(
                F.when(
                    F.col("rn") == F.expr("nd div 2 + 1"), F.col("x")
                ).otherwise(0)
            )
        ).alias("med2")
    )
    signs = (
        daily.crossJoin(broadcast(med))
        .filter(F.col("x") * 2 != F.col("med2"))
        .select(
            "d",
            F.when(F.col("x") * 2 > F.col("med2"), 1).otherwise(-1).alias("s"),
        )
    )
    wd = Window.orderBy("d")  # time-range-bounded daily frame
    runs = signs.select("s", F.lag("s").over(wd).alias("prev"))
    c = runs.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("s") != F.col("prev")), 1
            ).otherwise(0)
        ).alias("r"),
    )
    dd = lambda c_: F.col(c_).cast("string").cast("double")  # noqa: E731
    n1d, n2d, nd_, rd = dd("n1"), dd("n2"), dd("n_kept"), dd("r")
    exp_runs = F.lit(1.0) + F.lit(2.0) * n1d * n2d / nd_
    z = (rd - exp_runs) / F.sqrt(
        (F.lit(2.0) * n1d * n2d * (F.lit(2.0) * n1d * n2d - nd_))
        / (nd_ * nd_ * (nd_ - F.lit(1.0)))
    )
    degenerate = (
        (F.coalesce(F.col("n1"), F.lit(0)) == 0)
        | (F.coalesce(F.col("n2"), F.lit(0)) == 0)
    )
    # Final row from the AGGREGATE frames (t and c each one row always).
    return t.crossJoin(broadcast(c)).select(
        F.col("nd").cast("long").alias("n_days"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n1").cast("long").alias("n_plus"),
        F.col("n2").cast("long").alias("n_minus"),
        F.col("r").cast("long").alias("n_runs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(exp_runs, 6))
        .alias("expected_runs"),
        F.when(degenerate | (F.col("n_kept") < 3), F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Inter-event burstiness by type (round 11) — the Goh-Barabási
# burstiness coefficient B = (sigma - mu)/(sigma + mu) over per-user
# inter-event gaps, per event type: B ~ -1 for metronome traffic, 0 for
# Poisson, -> 1 for heavy-tailed bursts. The gap MULTISET is
# order-independent (sorting by timestamp fully determines consecutive
# differences, ties contribute zero gaps), so no tie-break column is
# needed; gaps are exact integer seconds, and sigma/mu come from the
# DECIMAL(38,0) moment pair (n*sum(g^2) - sum(g)^2 stays inside 2^126
# for any corpus whose counts fit BIGINT). Only the final sqrt/ratio is
# a rounded double via the VARCHAR crossing. 100 TB: the lag window is
# partitioned by (user, type) — never global; the output frame is
# event_type-bounded.
# ---------------------------------------------------------------------------

_BURSTINESS_SQL = """
WITH seq AS (
    SELECT event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             - LAG(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY CAST(ts AS TIMESTAMP)) AS gap
    FROM events
),
m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(gap AS HUGEINT)) AS sg,
           SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sg2
    FROM seq WHERE gap IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(CAST(sg AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n AS VARCHAR) AS DOUBLE), 6) AS mean_gap_sec,
       CASE WHEN sg = 0 THEN NULL
            ELSE ROUND(
              (SQRT(CAST(CAST(n * sg2 - sg * sg AS VARCHAR) AS DOUBLE))
               - CAST(CAST(sg AS VARCHAR) AS DOUBLE))
              / (SQRT(CAST(CAST(n * sg2 - sg * sg AS VARCHAR) AS DOUBLE))
                 + CAST(CAST(sg AS VARCHAR) AS DOUBLE)), 6)
       END AS burstiness
FROM m ORDER BY event_type
"""


@register("events_burstiness_by_type", oracle=_BURSTINESS_SQL)
def events_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("sec")
    seq = ev.select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("gap")).alias("sg"),
        F.sum(d19("gap") * d19("gap")).alias("sg2"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    n, sg, sg2 = F.col("n").cast("decimal(19,0)"), F.col("sg"), F.col("sg2")
    num = n * sg2 - sg * sg
    root = F.sqrt(dd(num))
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(dd(sg) / dd(n), 6).alias("mean_gap_sec"),
        F.when(sg == 0, F.lit(None).cast("double"))
        .otherwise(F.round((root - dd(sg)) / (root + dd(sg)), 6))
        .alias("burstiness"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Kendall tau-b between weekly volume and weekly mean value (round 11)
# — the rank-concordance companion to the Spearman signal correlation:
# does heavier weekly traffic come with higher (or lower) typical
# values? Concordant/discordant/tie pair counts are exact integers over
# the time-range BOUNDED weekly frame (the whitelisted Theil-Sen
# pairwise class — O(weeks^2), never corpus-quadratic); both weekly
# signals are exact-decimal-derived doubles, so every pairwise
# comparison agrees across engines, and tau-b's denominator uses the
# standard per-variable tie corrections. Only the final ratio is a
# rounded double.
# ---------------------------------------------------------------------------

_KENDALL_SQL = """
WITH weekly AS (
    SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS wn,
           COUNT(*) AS vol,
           ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR)
                      AS DOUBLE) / COUNT(value), 6) AS mv
    FROM events WHERE value IS NOT NULL GROUP BY 1
),
p AS (
    SELECT SUM(CASE WHEN (b.vol - a.vol) * (b.mv - a.mv) > 0
                    THEN 1 ELSE 0 END) AS c,
           SUM(CASE WHEN (b.vol - a.vol) * (b.mv - a.mv) < 0
                    THEN 1 ELSE 0 END) AS d,
           SUM(CASE WHEN b.vol = a.vol AND b.mv <> a.mv
                    THEN 1 ELSE 0 END) AS tx,
           SUM(CASE WHEN b.mv = a.mv AND b.vol <> a.vol
                    THEN 1 ELSE 0 END) AS ty,
           COUNT(*) AS n0
    FROM weekly a JOIN weekly b ON b.wn > a.wn
),
t AS (SELECT COUNT(*) AS n FROM weekly)
SELECT CAST(t.n AS BIGINT) AS n_weeks,
       CAST(p.c AS BIGINT) AS concordant,
       CAST(p.d AS BIGINT) AS discordant,
       CASE WHEN COALESCE(p.n0, 0) = 0
                 OR p.n0 - p.tx - (p.n0 - p.c - p.d - p.tx - p.ty) = 0
                 OR p.n0 - p.ty - (p.n0 - p.c - p.d - p.tx - p.ty) = 0
            THEN NULL
            ELSE ROUND((CAST(p.c AS DOUBLE) - p.d)
                       / SQRT((CAST(p.n0 AS DOUBLE) - p.tx
                               - (p.n0 - p.c - p.d - p.tx - p.ty))
                              * (CAST(p.n0 AS DOUBLE) - p.ty
                                 - (p.n0 - p.c - p.d - p.tx - p.ty))), 6)
       END AS kendall_tau_b
FROM t, p
"""


@register("events_kendall_volume_value", oracle=_KENDALL_SQL)
def events_kendall_volume_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    weekly = session_cache(
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.expr(
                "CAST(FLOOR(timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 604800)"
                " AS BIGINT)"
            ).alias("wn"),
            "value",
        )
        .groupBy("wn")
        .agg(
            F.count(F.lit(1)).alias("vol"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("string")
                .cast("double")
                / F.count("value"),
                6,
            ).alias("mv"),
        )
    )
    a = weekly.select(
        F.col("wn").alias("wa"), F.col("vol").alias("va"), F.col("mv").alias("ma")
    )
    bb = weekly.select(
        F.col("wn").alias("wb"), F.col("vol").alias("vb"), F.col("mv").alias("mb")
    )
    p = (
        a.join(bb, F.col("wb") > F.col("wa"))  # bounded weekly frame
        .agg(
            F.sum(
                F.when(
                    (F.col("vb") - F.col("va")) * (F.col("mb") - F.col("ma"))
                    > 0,
                    1,
                ).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when(
                    (F.col("vb") - F.col("va")) * (F.col("mb") - F.col("ma"))
                    < 0,
                    1,
                ).otherwise(0)
            ).alias("d"),
            F.sum(
                F.when(
                    (F.col("vb") == F.col("va"))
                    & (F.col("mb") != F.col("ma")),
                    1,
                ).otherwise(0)
            ).alias("tx"),
            F.sum(
                F.when(
                    (F.col("mb") == F.col("ma"))
                    & (F.col("vb") != F.col("va")),
                    1,
                ).otherwise(0)
            ).alias("ty"),
            F.count(F.lit(1)).alias("n0"),
        )
    )
    t = weekly.agg(F.count(F.lit(1)).alias("n"))
    c, d = F.col("c").cast("double"), F.col("d").cast("double")
    n0 = F.col("n0").cast("double")
    txy = n0 - c - d - F.col("tx").cast("double") - F.col("ty").cast("double")
    denx = n0 - F.col("tx").cast("double") - txy
    deny = n0 - F.col("ty").cast("double") - txy
    return t.crossJoin(broadcast(p)).select(
        F.col("n").cast("long").alias("n_weeks"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.when(
            (F.coalesce(F.col("n0"), F.lit(0)) == 0)
            | (denx == 0)
            | (deny == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round((c - d) / F.sqrt(denx * deny), 6))
        .alias("kendall_tau_b"),
    )


# ---------------------------------------------------------------------------
# Fano factor over hourly counts by type (round 11) — the COUNT
# dispersion companion to the gap-based burstiness coefficient: a
# Poisson arrival process has var/mean = 1 over any counting window;
# F >> 1 means clumped arrivals, F < 1 regular ones. The hourly frame
# is time-range bounded; moments (n, sum c, sum c^2) are exact integers
# and F = (n*S2 - S1^2) / ((n-1) * S1) is derived from them via the
# VARCHAR crossing (sample variance over mean). Degenerate guards
# (one window, zero mean) yield NULL on both engines.
# ---------------------------------------------------------------------------

_FANO_SQL = """
WITH hourly AS (
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(c AS HUGEINT)) AS s1,
           SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
    FROM hourly GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CAST(s1 AS BIGINT) AS n_events,
       CASE WHEN n < 2 OR s1 = 0 THEN NULL
            ELSE ROUND(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
                       / ((CAST(CAST(n AS VARCHAR) AS DOUBLE) - 1.0)
                          * CAST(CAST(n AS VARCHAR) AS DOUBLE))
                       / (CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                          / CAST(CAST(n AS VARCHAR) AS DOUBLE)), 6)
       END AS fano_factor
FROM m ORDER BY event_type
"""


@register("events_fano_factor_hourly", oracle=_FANO_SQL)
def events_fano_factor_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("c")).alias("s1"),
        F.sum(d19("c") * d19("c")).alias("s2"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    n = F.col("n").cast("decimal(19,0)")
    var_num = dd(n * F.col("s2") - F.col("s1") * F.col("s1"))
    nd = dd(n)
    mean = dd(F.col("s1")) / nd
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("s1").cast("long").alias("n_events"),
        F.when(
            (F.col("n") < 2) | (F.col("s1") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(var_num / ((nd - F.lit(1.0)) * nd) / mean, 6))
        .alias("fano_factor"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Cohort retention triangle (round 11) — the product-analytics view the
# DAU/WAU and resurrection queries bracket but never materialize: users
# grouped by FIRST-ACTIVE week (cohort), counted distinct in each
# subsequent week, as (cohort_week, age_weeks) cells with retention
# relative to the cohort's size. Week number is the engine-independent
# integer epoch-seconds div 604800 (the Theil-Sen convention). 100 TB:
# first-active is one hash aggregate per user; the triangle is a
# distinct-count per (cohort, age) cell — both shuffle on bounded-ish
# keys; the output frame is (weeks x weeks)/2, time-range bounded.
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS wn
    FROM events
),
first_w AS (SELECT user_id, MIN(wn) AS cw FROM uw GROUP BY user_id),
cohort_size AS (SELECT cw, COUNT(*) AS n0 FROM first_w GROUP BY cw),
cells AS (
    SELECT f.cw, uw.wn - f.cw AS age, COUNT(DISTINCT uw.user_id) AS n
    FROM uw JOIN first_w f ON uw.user_id = f.user_id
    GROUP BY 1, 2
)
SELECT cells.cw AS cohort_week,
       CAST(cells.age AS BIGINT) AS age_weeks,
       CAST(cells.n AS BIGINT) AS n_active,
       CAST(cs.n0 AS BIGINT) AS cohort_size,
       ROUND(CAST(cells.n AS DOUBLE) / cs.n0, 6) AS retention
FROM cells JOIN cohort_size cs ON cells.cw = cs.cw
ORDER BY cohort_week, age_weeks
"""


@register("events_cohort_retention_triangle", oracle=_RETENTION_SQL)
def events_cohort_retention_triangle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from deathmetal_datalake_spark.plans.registry import session_cache

    uw = session_cache(
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(FLOOR(timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 604800)"
                " AS BIGINT)"
            ).alias("wn"),
        )
        .distinct()
    )
    first_w = uw.groupBy("user_id").agg(F.min("wn").alias("cw"))
    cohort_size = first_w.groupBy("cw").agg(F.count(F.lit(1)).alias("n0"))
    cells = (
        uw.join(first_w, "user_id")
        .groupBy("cw", (F.col("wn") - F.col("cw")).alias("age"))
        .agg(F.countDistinct("user_id").alias("n"))
    )
    return (
        cells.join(cohort_size, "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            F.col("age").cast("long").alias("age_weeks"),
            F.col("n").cast("long").alias("n_active"),
            F.col("n0").cast("long").alias("cohort_size"),
            F.round(F.col("n").cast("double") / F.col("n0"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# ---------------------------------------------------------------------------
# Chebyshev outlier hours (round 11) — distribution-free surge
# flagging with a PURE-INTEGER criterion: hour h is an outlier iff
# |c_h - mean| > k*s, which cross-multiplies to
# (c_h*n - S1)^2 * (n-1) > k^2 * n * (n*S2 - S1^2) — every term an
# exact DECIMAL(38,0)/HUGEINT product, so the flag set is bit-identical
# on both engines with NO square roots or divisions anywhere (k = 4:
# Chebyshev guarantees < 1/16 of hours can flag under ANY
# distribution). 100 TB: hourly frame is time-range bounded; one
# moment aggregate per type, one broadcast-join back.
# ---------------------------------------------------------------------------

_CHEBYSHEV_K2 = 16  # k = 4

_CHEBYSHEV_SQL = f"""
WITH hourly AS (
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(c AS HUGEINT)) AS s1,
           SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
    FROM hourly GROUP BY event_type
),
flagged AS (
    SELECT hourly.event_type, hourly.h, hourly.c, m.n, m.s1
    FROM hourly JOIN m ON hourly.event_type = m.event_type
    WHERE m.n >= 2
      AND (CAST(hourly.c AS HUGEINT) * m.n - m.s1)
          * (CAST(hourly.c AS HUGEINT) * m.n - m.s1) * (m.n - 1)
          > {_CHEBYSHEV_K2} * m.n * (m.n * m.s2 - m.s1 * m.s1)
)
SELECT m.event_type,
       CAST(m.n AS BIGINT) AS n_hours,
       CAST(COALESCE(f.n_out, 0) AS BIGINT) AS n_outlier_hours,
       f.first_outlier_hour,
       CAST(f.peak AS BIGINT) AS peak_outlier_count
FROM m
LEFT JOIN (
    SELECT event_type, COUNT(*) AS n_out, MIN(h) AS first_outlier_hour,
           MAX(c) AS peak
    FROM flagged GROUP BY event_type
) f ON m.event_type = f.event_type
ORDER BY m.event_type
"""


@register("events_chebyshev_outlier_hours", oracle=_CHEBYSHEV_SQL)
def events_chebyshev_outlier_hours(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    hourly = session_cache(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("c")).alias("s1"),
        F.sum(d19("c") * d19("c")).alias("s2"),
    )
    n = F.col("n").cast("decimal(19,0)")
    dev = d19("c") * n - F.col("s1")
    # Enum-bounded per-type moment frame: broadcast join back.
    flagged = (
        hourly.join(broadcast(m), "event_type")
        .filter(
            (F.col("n") >= 2)
            & (
                dev * dev * (n - 1)
                > F.lit(_CHEBYSHEV_K2).cast("decimal(19,0)")
                * n
                * (n * F.col("s2") - F.col("s1") * F.col("s1"))
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_out"),
            F.min("h").alias("first_outlier_hour"),
            F.max("c").alias("peak"),
        )
    )
    z = F.lit(0).cast("long")
    return (
        m.join(flagged, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.coalesce(F.col("n_out"), z).cast("long").alias("n_outlier_hours"),
            "first_outlier_hour",
            F.col("peak").cast("long").alias("peak_outlier_count"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ordered funnel view -> click -> purchase (round 11) — the classic
# product-analytics operator the session-path queries bracket but never
# answer directly: how many users progress through the staged sequence
# IN ORDER (each stage strictly after the previous one's first
# occurrence)? Three sequential min-timestamp aggregates with a join
# between each stage — the standard distributed funnel shape (no
# window, no per-user sort; each pass is one hash aggregate + one
# equi-join on user_id). Timestamps compare as exact epoch seconds.
# Output: one row per stage with survivors and conversion from the
# previous stage.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH e AS (
    SELECT user_id, event_type,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
    FROM events
),
s1 AS (
    SELECT user_id, MIN(sec) AS t1 FROM e WHERE event_type = 'view'
    GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.sec) AS t2
    FROM e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.sec > s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.sec) AS t3
    FROM e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.sec > s2.t2
    GROUP BY e.user_id
),
counts AS (
    SELECT (SELECT COUNT(*) FROM s1) AS n1,
           (SELECT COUNT(*) FROM s2) AS n2,
           (SELECT COUNT(*) FROM s3) AS n3
)
SELECT stage, n_users, conversion_from_prev FROM (
    SELECT 1 AS stage, 'view' AS stage_name, CAST(n1 AS BIGINT) AS n_users,
           CAST(NULL AS DOUBLE) AS conversion_from_prev
    FROM counts
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT),
           CASE WHEN n1 = 0 THEN NULL
                ELSE ROUND(CAST(n2 AS DOUBLE) / n1, 6) END
    FROM counts
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           CASE WHEN n2 = 0 THEN NULL
                ELSE ROUND(CAST(n3 AS DOUBLE) / n2, 6) END
    FROM counts
) ORDER BY stage
"""


@register("events_ordered_funnel", oracle=_FUNNEL_SQL)
def events_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.plans.registry import session_cache

    e = session_cache(
        load_table(spark, sf_dir, "events").select(
            "user_id",
            "event_type",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("sec"),
        )
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("sec") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("sec") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n3"))
    counts = c1.crossJoin(broadcast(c2)).crossJoin(broadcast(c3))
    stage1 = counts.select(
        F.lit(1).cast("int").alias("stage"),
        F.col("n1").cast("long").alias("n_users"),
        F.lit(None).cast("double").alias("conversion_from_prev"),
    )
    stage2 = counts.select(
        F.lit(2).cast("int").alias("stage"),
        F.col("n2").cast("long").alias("n_users"),
        F.when(F.col("n1") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n2").cast("double") / F.col("n1"), 6))
        .alias("conversion_from_prev"),
    )
    stage3 = counts.select(
        F.lit(3).cast("int").alias("stage"),
        F.col("n3").cast("long").alias("n_users"),
        F.when(F.col("n2") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n3").cast("double") / F.col("n2"), 6))
        .alias("conversion_from_prev"),
    )
    return stage1.unionByName(stage2).unionByName(stage3).orderBy("stage")


# ---------------------------------------------------------------------------
# Gini coefficient of per-user event activity (round 12) — the
# concentration scalar behind every "1% of users generate X% of
# traffic" claim, and the workload-skew receipt for per-user
# partitioning decisions. Exactness: with counts c ranked ascending
# (ties broken by user_id), G = (2*sum(r*c) - (n+1)*sum(c)) /
# (n*sum(c)) — every sum is an exact 128-bit integer (rank x count
# products reach n * max_count, DECIMAL(38,0)/HUGEINT), and only the
# final closed form crosses to double via the exact VARCHAR parse.
# 100 TB: per-user counts are one hash aggregate; the global rank uses
# the distributed two-phase cumsum (bucket-bounded boundary frames),
# never a single-task ORDER BY window; one 1-row reduce.
# ---------------------------------------------------------------------------

_GINI_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, user_id ASC) AS r FROM c),
s AS (SELECT COUNT(*) AS n,
             SUM(CAST(c AS HUGEINT)) AS t,
             SUM(CAST(r AS HUGEINT) * CAST(c AS HUGEINT)) AS a
      FROM r)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(COALESCE(t, 0) AS BIGINT) AS total_events,
       CASE WHEN n = 0 OR COALESCE(t, 0) = 0 THEN NULL
            ELSE ROUND((2.0 * CAST(CAST(a AS VARCHAR) AS DOUBLE)
                        - (CAST(CAST(n AS VARCHAR) AS DOUBLE) + 1.0)
                          * CAST(CAST(t AS VARCHAR) AS DOUBLE))
                       / (CAST(CAST(n AS VARCHAR) AS DOUBLE)
                          * CAST(CAST(t AS VARCHAR) AS DOUBLE)), 6)
       END AS gini
FROM s
"""


@register("events_gini_user_activity", oracle=_GINI_SQL)
def events_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Counts are a small-domain leading key: sub-bucket ties by user_id.
    o = two_phase_order(
        c,
        [F.asc("c"), F.asc("user_id")],
        F.col("c"),
        rank_col="r",
        sub_key=F.col("user_id"),
    )
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d19("c")).alias("t"),
        F.sum(d19("r") * d19("c")).alias("a"),
    )
    dd = lambda c_: c_.cast("string").cast("double")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,0)")
    gini = (
        F.lit(2.0) * dd(F.col("a"))
        - (dd(F.col("n")) + F.lit(1.0)) * dd(F.col("t"))
    ) / (dd(F.col("n")) * dd(F.col("t")))
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.coalesce(F.col("t"), zero).cast("long").alias("total_events"),
        F.when(
            (F.col("n") == 0) | (F.coalesce(F.col("t"), zero) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(gini, 6))
        .alias("gini"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve of user activity by decile (round 12) — the curve the
# Gini scalar summarizes: users ranked ascending by event count, split
# into 10 equal-population bins (decile = floor((r-1)*10/n), stated
# identically in both engines — NOT NTILE, whose remainder placement
# differs), each reporting its exact share and cumulative share of
# total activity. 100 TB: two-phase global rank, one hash aggregate to
# 10 rows, and a 10x10 bounded triangle join for the cumulative —
# nothing data-proportional past the rank.
# ---------------------------------------------------------------------------

_LORENZ_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
n AS (SELECT COUNT(*) AS n, SUM(CAST(c AS HUGEINT)) AS t FROM c),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, user_id ASC) AS r FROM c),
d AS (
    SELECT (CAST(r - 1 AS HUGEINT) * 10) // (SELECT n FROM n) AS decile,
           COUNT(*) AS n_users,
           SUM(CAST(c AS HUGEINT)) AS n_events
    FROM r GROUP BY 1
),
cum AS (
    SELECT a.decile, a.n_users, a.n_events,
           SUM(b.n_events) AS cum_events
    FROM d a JOIN d b ON b.decile <= a.decile
    GROUP BY 1, 2, 3
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(cum_events AS BIGINT) AS cum_events,
       ROUND(CAST(CAST(cum_events AS VARCHAR) AS DOUBLE)
             / CAST(CAST((SELECT t FROM n) AS VARCHAR) AS DOUBLE), 6)
           AS cum_share
FROM cum
ORDER BY decile
"""


@register("events_lorenz_activity_deciles", oracle=_LORENZ_SQL)
def events_lorenz_activity_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from deathmetal_datalake_spark.operators.ordering import two_phase_order

    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    o = two_phase_order(
        c,
        [F.asc("c"), F.asc("user_id")],
        F.col("c"),
        rank_col="r",
        sub_key=F.col("user_id"),
        n_total_col="n",
    )
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    d = (
        o.select(
            (
                (d19("r") - 1) * 10
            ).cast("decimal(38,0)").alias("r10"),
            F.col("n"),
            F.col("c"),
        )
        .select(
            F.expr("CAST(r10 div n AS decimal(38,0))").alias("decile"),
            "c",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(d19("c")).alias("n_events"),
        )
    )
    t = c.agg(F.sum(d19("c")).alias("t"))
    a = d.alias("a")
    b = d.alias("b")
    cum = (
        a.join(broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(
            F.col("a.decile").alias("decile"),
            F.col("a.n_users").alias("n_users"),
            F.col("a.n_events").alias("n_events"),
        )
        .agg(F.sum(F.col("b.n_events")).alias("cum_events"))
    )
    dd = lambda c_: c_.cast("string").cast("double")  # noqa: E731
    return (
        cum.crossJoin(broadcast(t))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("cum_events").cast("long").alias("cum_events"),
            F.round(dd(F.col("cum_events")) / dd(F.col("t")), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Exact Shapley channel attribution (round 12) — the game-theoretic
# upgrade of events_markov_attribution: credit for a conversion is
# split among the pre-purchase touch channels (view / click / signup)
# by the exact Shapley value over the 3-channel coalition game
# v(S) = #converted users whose touched-channel set is a subset of S.
# With 3 channels the subset lattice has 8 nodes and the Shapley sum
# 12 terms — everything is a bounded-frame pivot over ONE per-user
# hash aggregate, and the weights s!(2-s)!/3! have common denominator
# 6, so each channel's credit is an exact INTEGER numerator divided by
# 6.0 in one identical IEEE step. Efficiency property pinned by the
# oracle: credits sum to v(all) - v(none). 100 TB: one aggregate to
# user grain, one to 8 masks; the lattice math is literal-frame joins.
# ---------------------------------------------------------------------------

_SHAPLEY_DIM = [
    # (channel bit, channel name, base subset S with bit not in S,
    #  weight numerator over denominator 6: |S|=0 -> 2, 1 -> 1, 2 -> 2)
    (ch, name, s, {0: 2, 1: 1, 2: 2}[bin(s).count("1")])
    for ch, name in ((1, "view"), (2, "click"), (4, "signup"))
    for s in range(8)
    if (s & ch) == 0
]

_SHAPLEY_DIM_SQL = ", ".join(
    f"({ch}, '{name}', {s}, {w})" for ch, name, s, w in _SHAPLEY_DIM
)

_SHAPLEY_SQL = f"""
WITH fp AS (
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS fpts
    FROM events WHERE event_type = 'purchase' GROUP BY 1
),
ch AS (
    SELECT f.user_id,
           MAX(CASE WHEN e.event_type = 'view'
                     AND CAST(e.ts AS TIMESTAMP) < f.fpts THEN 1 ELSE 0 END)
           + 2 * MAX(CASE WHEN e.event_type = 'click'
                     AND CAST(e.ts AS TIMESTAMP) < f.fpts THEN 1 ELSE 0 END)
           + 4 * MAX(CASE WHEN e.event_type = 'signup'
                     AND CAST(e.ts AS TIMESTAMP) < f.fpts THEN 1 ELSE 0 END)
               AS mask
    FROM fp f JOIN events e ON e.user_id = f.user_id
    GROUP BY 1
),
m AS (SELECT mask, COUNT(*) AS n FROM ch GROUP BY 1),
subsets AS (SELECT UNNEST(range(8)) AS s),
v AS (
    SELECT s.s, COALESCE(SUM(m.n), 0) AS v
    FROM subsets s LEFT JOIN m ON (m.mask & s.s) = m.mask
    GROUP BY 1
),
dim AS (
    SELECT * FROM (VALUES {_SHAPLEY_DIM_SQL}) AS t(ch, channel, s, wnum)
),
contrib AS (
    SELECT d.ch, d.channel,
           SUM(CAST(d.wnum AS BIGINT) * (vi.v - vs.v)) AS num
    FROM dim d
    JOIN v vs ON vs.s = d.s
    JOIN v vi ON vi.s = d.s + d.ch
    GROUP BY 1, 2
)
SELECT channel,
       CAST((SELECT COALESCE(SUM(n), 0) FROM m) AS BIGINT) AS n_converted,
       CAST(num AS BIGINT) AS credit_numerator_6ths,
       ROUND(CAST(num AS DOUBLE) / 6.0, 6) AS shapley_credit
FROM contrib
ORDER BY channel
"""


@register("events_shapley_attribution", oracle=_SHAPLEY_SQL)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fpts"))
    )
    touched = lambda t: F.max(  # noqa: E731
        F.when(
            (F.col("event_type") == t) & (F.col("ts") < F.col("fpts")), 1
        ).otherwise(0)
    )
    ch = (
        fp.join(ev, "user_id")
        .groupBy("user_id")
        .agg(
            (
                touched("view")
                + F.lit(2) * touched("click")
                + F.lit(4) * touched("signup")
            ).alias("mask")
        )
    )
    m = ch.groupBy("mask").agg(F.count(F.lit(1)).alias("n"))
    subsets = spark.range(8).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            broadcast(m), F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"), "left"
        )  # [enum] 8-mask frame
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
    )
    dim = spark.createDataFrame(
        _SHAPLEY_DIM, "ch int, channel string, s int, wnum int"
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    contrib = (
        dim.join(broadcast(vs), F.col("s0") == F.col("s"))  # [enum] 8-row v
        .join(broadcast(vi), F.col("s1") == F.col("s") + F.col("ch"))
        .groupBy("ch", "channel")
        .agg(
            F.sum(
                F.col("wnum").cast("long") * (F.col("v1") - F.col("v0"))
            ).alias("num")
        )
    )
    nconv = m.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_converted")
    )
    return (
        contrib.crossJoin(broadcast(nconv))  # [1row] converted total
        .select(
            "channel",
            "n_converted",
            F.col("num").cast("long").alias("credit_numerator_6ths"),
            F.round(F.col("num").cast("double") / F.lit(6.0), 6).alias(
                "shapley_credit"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Daily bounce rate (round 12) — the engagement-quality rollup of the
# 30-minute sessionization: a bounce is a single-event session, the
# classic junk-traffic / crawler signal. Session grain reuses the
# exact session_window <-> lag/cumsum equivalence the sessionization
# query pins; the rollup keys on the session's start DAY. Exact
# integer counts; one ratio rounds at the end. 100 TB: the session
# window is per-user partitioned (never global), then one hash
# aggregate to days.
# ---------------------------------------------------------------------------

_BOUNCE_SQL = """
WITH flagged AS (
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (
                    PARTITION BY user_id ORDER BY ts
                ) >= INTERVAL 30 MINUTE THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_no
    FROM flagged
),
s AS (
    SELECT user_id, session_no,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', session_start) AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS bounce_rate
FROM s GROUP BY 1 ORDER BY 1
"""


@register("events_bounce_rate_daily", oracle=_BOUNCE_SQL)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n"))
    bounce = F.when(F.col("n") == 1, 1).otherwise(0)
    return (
        s.select(F.to_date("session_start").alias("day"), "n")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(bounce).cast("long").alias("n_bounces"),
            F.round(F.sum(bounce).cast("double") / F.count(F.lit(1)), 6).alias(
                "bounce_rate"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Cochran's Q across engagement actions (round 12) — the k-treatment
# binary companion to McNemar: blocks are users, treatments the three
# engagement actions (click / view / purchase), each cell "did the
# user perform that action at least once". Q asks whether the three
# action penetration rates differ beyond user-level heterogeneity —
# the A/B/C feature-reach test run on every engagement funnel. With
# column totals T_j, N = sum(B_i), and row-square sum sum(B_i^2), the
# k=3 statistic reduces to Q = (6*sum T_j^2 - 2*N^2) / (3*N -
# sum B_i^2) — every term an INTEGER aggregate, so the only float op
# is the final division (identical IEEE divide both engines).
# Blocks with B_i in {0, k} cancel from both numerator and
# denominator, per the test's definition — no block filtering needed.
# 100 TB: one map-combinable per-user aggregate (the pivot is three
# MAX(CASE)s, not a join), one 1-row reduce. Degenerate denominator
# (every user all-or-nothing) -> NULL.
# ---------------------------------------------------------------------------

_CQ_ACTS = ("click", "view", "purchase")

_COCHRAN_Q_SQL = f"""
WITH ut AS (
    SELECT user_id,
           {", ".join(f"MAX(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS x{i}" for i, a in enumerate(_CQ_ACTS, 1))}
    FROM events GROUP BY user_id
),
agg AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n_users,
           {", ".join(f"SUM(CAST(x{i} AS HUGEINT)) AS t{i}" for i in range(1, 4))},
           SUM(CAST(x1 + x2 + x3 AS HUGEINT)) AS sb,
           SUM(CAST(x1 + x2 + x3 AS HUGEINT) * (x1 + x2 + x3)) AS sb2
    FROM ut
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       CAST(t1 AS BIGINT) AS n_click_users,
       CAST(t2 AS BIGINT) AS n_view_users,
       CAST(t3 AS BIGINT) AS n_purchase_users,
       CASE WHEN 3 * sb - sb2 = 0 THEN NULL
            ELSE ROUND(
                (6.0 * CAST(CAST(t1 * t1 + t2 * t2 + t3 * t3 AS VARCHAR) AS DOUBLE)
                 - 2.0 * CAST(CAST(sb * sb AS VARCHAR) AS DOUBLE))
                / CAST(CAST(3 * sb - sb2 AS VARCHAR) AS DOUBLE), 6)
       END AS q_statistic
FROM agg
"""


@register("events_cochran_q_actions", oracle=_COCHRAN_Q_SQL)
def events_cochran_q_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == a, 1).otherwise(0)
            ).alias(f"x{i}")
            for i, a in enumerate(_CQ_ACTS, 1)
        ]
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    bsum = F.col("x1") + F.col("x2") + F.col("x3")
    agg = ut.agg(
        F.count(F.lit(1)).alias("n_users"),
        *[F.sum(d38(F.col(f"x{i}"))).alias(f"t{i}") for i in range(1, 4)],
        F.sum(d38(bsum)).alias("sb"),
        F.sum(d38(bsum) * bsum).alias("sb2"),
    )
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    tsq = (
        d38(F.col("t1")) * F.col("t1")
        + d38(F.col("t2")) * F.col("t2")
        + d38(F.col("t3")) * F.col("t3")
    ).cast("decimal(38,0)")
    denom = (F.lit(3) * d38(F.col("sb")) - F.col("sb2")).cast("decimal(38,0)")
    return agg.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("t1").cast("long").alias("n_click_users"),
        F.col("t2").cast("long").alias("n_view_users"),
        F.col("t3").cast("long").alias("n_purchase_users"),
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (
                    F.lit(6.0) * dd(tsq)
                    - F.lit(2.0)
                    * dd((d38(F.col("sb")) * F.col("sb")).cast("decimal(38,0)"))
                )
                / dd(denom),
                6,
            )
        )
        .alias("q_statistic"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate (round 13) — the information-theoretic summary
# of the behavioral transition matrix: H = -sum p(s,t) log2 p(t|s)
# over first-order event-type transitions (the transition-matrix
# query's law), i.e. how unpredictable the NEXT action is given the
# current one. Reported with the perplexity (2^H = effective branching
# factor) — the sequence-model difficulty number for this corpus.
# Determinism: per-pair terms are exact-long micro-rounded before the
# sum (chi2 pattern); the pair frame is bounded by |types|^2. 100 TB:
# one user-partitioned lag window, one hash aggregate to <=K^2 rows.
# ---------------------------------------------------------------------------

_ENTROPY_RATE_SQL = """
WITH seq AS (
    SELECT event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS prev_type
    FROM events
),
trans AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS c
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
),
rowt AS (SELECT prev_type, SUM(c) AS cs FROM trans GROUP BY prev_type),
tot AS (SELECT SUM(c) AS n FROM trans),
terms AS (
    SELECT CAST(ROUND((CAST(t.c AS DOUBLE) / tot.n)
                      * LOG2(CAST(r.cs AS DOUBLE) / t.c)
                      * 1000000) AS BIGINT) AS h_u
    FROM trans t
    JOIN rowt r USING (prev_type), tot
)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_transitions,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rowt) AS n_states,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM trans) AS n_pairs,
       ROUND(SUM(h_u) / 1000000.0, 6) AS entropy_rate_bits,
       ROUND(POW(2.0, ROUND(SUM(h_u) / 1000000.0, 6)), 6) AS perplexity
FROM terms
"""


@register("events_entropy_rate_markov", oracle=_ENTROPY_RATE_SQL)
def events_entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    trans = session_cache(trans)
    rowt = trans.groupBy("prev_type").agg(F.sum("c").cast("long").alias("cs"))
    tot = trans.agg(F.sum("c").cast("long").alias("n"))
    h_u = F.round(
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(F.col("cs").cast("double") / F.col("c"))
        * F.lit(1000000.0)
    ).cast("long")
    terms = (
        trans.join(broadcast(rowt), "prev_type")  # [enum] per-state totals
        .crossJoin(broadcast(tot))  # [1row] grand total
        .select(h_u.alias("h_u"))
    )
    h = F.round(F.sum("h_u") / F.lit(1000000.0), 6)
    out = (
        terms.agg(h.alias("entropy_rate_bits"))
        .crossJoin(broadcast(tot.select(F.col("n").alias("n_transitions"))))
        .crossJoin(
            broadcast(rowt.agg(F.count(F.lit(1)).cast("long").alias("n_states")))
        )
        .crossJoin(
            broadcast(trans.agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))
        )
        .select(
            "n_transitions",
            "n_states",
            "n_pairs",
            "entropy_rate_bits",
            F.round(
                F.pow(F.lit(2.0), F.col("entropy_rate_bits")), 6
            ).alias("perplexity"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Daily periodogram (round 13) — the discrete-Fourier power of the
# daily event-count series at the first three harmonics: the spectral
# companion to the autocorrelation/seasonal battery (is there a
# weekly-ish cycle, and how much of the variance sits in it). The day
# spine is time-range bounded; per-day cos/sin terms are micro-rounded
# longs (chi2 determinism pattern) with the 2*pi*k constants folded to
# identical double literals on both engines, so the sums are exact and
# the squared amplitudes divide once at the end. 100 TB: one hash
# aggregate to the day spine, bounded everything after.
# ---------------------------------------------------------------------------

_PGRAM_KS = (1, 2, 3)


def _pgram_sql() -> str:
    import math

    terms, sums, rows = [], [], []
    for k in _PGRAM_KS:
        c = repr(2.0 * math.pi * k)
        terms.append(
            f"CAST(ROUND(c * COS({c} * t / n_days) * 1000000) AS BIGINT) AS a_{k},"
            f" CAST(ROUND(c * SIN({c} * t / n_days) * 1000000) AS BIGINT) AS b_{k}"
        )
        sums.append(f"SUM(a_{k}) AS a_{k}, SUM(b_{k}) AS b_{k}")
        rows.append(
            f"({k}, (SELECT CAST(n_days AS BIGINT) FROM b),"
            f" (SELECT ROUND((a_{k} / 1000000.0) * (a_{k} / 1000000.0)"
            f" + (b_{k} / 1000000.0) * (b_{k} / 1000000.0), 6) FROM s))"
        )
    return f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, COUNT(*) AS c
    FROM events GROUP BY 1
),
b AS (
    SELECT MIN(d) AS d0, date_diff('day', MIN(d), MAX(d)) + 1 AS n_days
    FROM daily
),
terms AS (
    SELECT {", ".join(terms)}
    FROM (SELECT date_diff('day', b.d0, daily.d) AS t, daily.c, b.n_days
          FROM daily, b)
),
s AS (SELECT {", ".join(sums)} FROM terms)
SELECT * FROM (VALUES
    {", ".join(rows)}
) v(k, n_days, power)
ORDER BY k
"""


@register("events_periodogram_daily", oracle=_pgram_sql())
def events_periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    b = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) + 1).cast("long").alias("n_days"),
    )
    base = daily.crossJoin(broadcast(b)).select(  # [1row] span bounds
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("t"),
        "c",
        "n_days",
    )
    aggs = []
    for k in _PGRAM_KS:
        const = 2.0 * math.pi * k
        arg = F.lit(const) * F.col("t") / F.col("n_days")
        aggs.append(
            F.sum(
                F.round(F.col("c") * F.cos(arg) * F.lit(1000000.0)).cast(
                    "long"
                )
            ).alias(f"a_{k}")
        )
        aggs.append(
            F.sum(
                F.round(F.col("c") * F.sin(arg) * F.lit(1000000.0)).cast(
                    "long"
                )
            ).alias(f"b_{k}")
        )
    s = base.agg(*aggs).crossJoin(
        broadcast(b.select("n_days"))  # [1row] day count
    )
    stack_args = ", ".join(
        f"{k}, n_days, ROUND((a_{k} / 1e6) * (a_{k} / 1e6)"
        f" + (b_{k} / 1e6) * (b_{k} / 1e6), 6)"
        for k in _PGRAM_KS
    )
    return s.selectExpr(
        f"stack({len(_PGRAM_KS)}, {stack_args}) AS (k, n_days, power)"
    ).orderBy("k")


# ---------------------------------------------------------------------------
# Lagged cross-correlation (round 13) — does one event type LEAD
# another? The daily count series of two types, correlated at lags
# -3..+3 over the shared day spine: the signal-analysis companion to
# the periodogram (cycle strength) and autocorrelation (self-memory).
# The day spine is time-range bounded, the lag join is a bounded
# spine-to-spine equi-join, and every correlation term is exact
# integer count arithmetic until the final normalized divide —
# deterministic without micro-rounding. 100 TB: one hash aggregate to
# the (day x 2 types) spine, bounded everything after.
# ---------------------------------------------------------------------------

_CCF_A, _CCF_B = "view", "purchase"
_CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)

_CCF_SQL = f"""
WITH daily AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           SUM(CASE WHEN event_type = '{_CCF_A}' THEN 1 ELSE 0 END) AS ca,
           SUM(CASE WHEN event_type = '{_CCF_B}' THEN 1 ELSE 0 END) AS cb
    FROM events WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')
    GROUP BY 1
),
lags AS (SELECT UNNEST(ARRAY{list(_CCF_LAGS)}) AS lag),
pairs AS (
    SELECT l.lag, x.ca, y.cb
    FROM lags l
    JOIN daily x ON TRUE
    JOIN daily y ON y.d = x.d + CAST(l.lag AS INTEGER)
),
s AS (
    SELECT lag, COUNT(*) AS n,
           SUM(ca) AS sa, SUM(cb) AS sb,
           SUM(CAST(ca AS HUGEINT) * cb) AS sab,
           SUM(CAST(ca AS HUGEINT) * ca) AS saa,
           SUM(CAST(cb AS HUGEINT) * cb) AS sbb
    FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_days,
       CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN NULL
            ELSE ROUND(
                CAST(CAST(n * sab - sa * sb AS VARCHAR) AS DOUBLE)
                / SQRT(CAST(CAST(n * saa - sa * sa AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(n * sbb - sb * sb AS VARCHAR)
                              AS DOUBLE)), 6)
       END AS ccf
FROM s ORDER BY lag
"""


@register("events_cross_correlation_lagged", oracle=_CCF_SQL)
def events_cross_correlation_lagged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_CCF_A, _CCF_B)
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == _CCF_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == _CCF_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    daily = session_cache(daily)
    lags = spark.createDataFrame(
        [(lag,) for lag in _CCF_LAGS], "lag long"
    )
    x = daily.select(F.col("d").alias("dx"), "ca")
    y = daily.select(F.col("d").alias("dy"), "cb")
    pairs = (
        x.crossJoin(broadcast(lags))  # [dim] 7-row lag frame
        .join(
            y,
            F.col("dy") == F.date_add(F.col("dx"), F.col("lag").cast("int")),
        )
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dd = lambda c: c.cast("string").cast("double")  # noqa: E731
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ca").cast("long").alias("sa"),
        F.sum("cb").cast("long").alias("sb"),
        F.sum(d38(F.col("ca")) * F.col("cb")).alias("sab"),
        F.sum(d38(F.col("ca")) * F.col("ca")).alias("saa"),
        F.sum(d38(F.col("cb")) * F.col("cb")).alias("sbb"),
    )
    covn = (d38(F.col("n")) * F.col("sab") - d38(F.col("sa")) * F.col("sb")).cast("decimal(38,0)")
    vara = (d38(F.col("n")) * F.col("saa") - d38(F.col("sa")) * F.col("sa")).cast("decimal(38,0)")
    varb = (d38(F.col("n")) * F.col("sbb") - d38(F.col("sb")) * F.col("sb")).cast("decimal(38,0)")
    return s.select(
        F.col("lag"),
        F.col("n").alias("n_days"),
        F.when(
            (vara == 0) | (varb == 0), F.lit(None).cast("double")
        )
        .otherwise(F.round(dd(covn) / F.sqrt(dd(vara) * dd(varb)), 6))
        .alias("ccf"),
    ).orderBy("lag")
