"""Streaming windowed aggregation ≡ batch replay equivalence."""

from __future__ import annotations

import json

import pytest

from deathmetal_datalake_spark.sources.tables import load_table
from deathmetal_datalake_spark.streaming.windows import (
    read_event_stream,
    sessionized,
    start_to_memory,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Spill the events table into 4 json drops (micro-batch shape)."""
    out = tmp_path_factory.mktemp("events_stream")
    rows = load_table(spark, SF, "events").collect()
    n = (len(rows) + 3) // 4
    for part in range(4):
        with open(out / f"drop_{part}.json", "w") as f:
            for r in rows[part * n : (part + 1) * n]:
                f.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"].isoformat(sep=" "),
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                            "props": r["props"],
                        }
                    )
                    + "\n"
                )
    return str(out)


def test_streaming_tumbling_equals_batch(spark, tmp_path, event_files):
    stream = windowed_counts(read_event_stream(spark, event_files))
    q = start_to_memory(stream, "win_counts", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("win_counts").collect()
    }
    # Batch reference on the same data (no watermark needed in batch).
    from pyspark.sql import functions as F

    ref = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r["w"]["start"], r["event_type"]): (r["n"], round(r["s"], 6)) for r in ref}
    # Append mode emits a window only once the watermark passes its end;
    # windows within `watermark` of the stream's max event time stay open
    # at availableNow termination. Everything emitted must match batch,
    # and everything missing must be an open (not-yet-closed) window.
    import datetime

    max_ts = max(k[0] for k in want)  # window starts; max event ts is within the last window
    cutoff = max_ts - datetime.timedelta(minutes=10)
    for key, val in got.items():
        assert want.get(key) == val, f"emitted window differs from batch: {key}"
    for key in set(want) - set(got):
        window_end = key[0] + datetime.timedelta(minutes=5)
        assert window_end > cutoff, f"closed window missing from stream output: {key}"


def test_streaming_sessionization_runs(spark, tmp_path, event_files):
    stream = sessionized(read_event_stream(spark, event_files))
    q = start_to_memory(stream, "sessions", str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    rows = spark.table("sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_stream_attribution_equals_batch(spark, tmp_path, event_files):
    from deathmetal_datalake_spark.streaming.windows import stream_stream_attribution
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, event_files)
    purchases = stream.filter(F.col("event_type") == "purchase")
    views = stream.filter(F.col("event_type") == "view")
    joined = stream_stream_attribution(purchases, views)
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["view_id"]) for r in spark.table("attr_pairs").collect()
    }

    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    want = {
        (r["purchase_id"], r["view_id"])
        for r in p.join(
            v,
            (F.col("pu") == F.col("vu"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") > F.col("pts") - F.expr("INTERVAL 30 MINUTE")),
        ).collect()
    }
    # Stream-stream inner join with availableNow emits every matched
    # pair whose both sides fall inside watermark bounds; with a 1h
    # watermark over a replayed bounded stream the full batch result is
    # emitted.
    assert got == want and len(got) > 0
