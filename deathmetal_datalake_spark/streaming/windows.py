"""Event-time streaming analytics: watermarked windows over an events
stream.

The reference has no event-time semantics (its only streaming concern is
micro-batch buffering — SURVEY.md §2.7); these are the mandated
extension. The window logic is the same as the batch catalog
(plans/events.py) so batch replay with ``availableNow`` must produce
identical results — which is exactly what the tests assert.

Scale notes: watermark state is per (window × key); the 10-minute
watermark bounds state size regardless of stream length. The sink below
is pluggable; tests use an in-memory table, production uses parquet/
kafka with the same query object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source event stream (one json/parquet file per micro-batch
    drop — the landing-dir pattern from streaming.landing)."""
    return spark.readStream.schema(EVENT_SCHEMA).json(events_dir)


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time aggregation with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows per user (session_window state op)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
    )


def start_to_memory(
    df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "append"
) -> StreamingQuery:
    """Drain a (windowed) stream into an in-memory table for inspection
    or tests; availableNow = bounded replay."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_attribution(
    purchases: DataFrame,
    views: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: purchases matched to any
    view by the same user within the preceding ``window``. Both sides
    carry watermarks so the join state is bounded (views older than
    purchase-watermark − window are evicted). Batch counterpart:
    plans.events.events_view_purchase_attribution.
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("pts"),
            F.col("value"),
        )
    )
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("vts"),
        )
    )
    return p.join(
        v,
        (F.col("p_user_id") == F.col("v_user_id"))
        & (F.col("vts") <= F.col("pts"))
        & (F.col("vts") > F.col("pts") - F.expr(f"INTERVAL {window}")),
    ).select("purchase_id", F.col("p_user_id").alias("user_id"), "value", "view_id")
