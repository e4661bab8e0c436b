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


def test_watermark_drops_late_event(spark, tmp_path):
    """An event older than (max event time - watermark) arriving in a
    later micro-batch must not reopen its already-finalized window."""
    import time as _time

    drops = tmp_path / "late_drops"
    drops.mkdir()

    def write_drop(name, rows):
        with open(drops / name, "w") as f:
            for eid, ts, et in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": ts,
                            "user_id": 1,
                            "event_type": et,
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
        # distinct mtimes keep the file-source batch order deterministic
        _time.sleep(1.1)

    # Batch 0: two events in the 00:00 window, then event time advances
    # to 01:00 — the watermark (10 min) moves far past the first window.
    write_drop("a_batch0.json", [
        (1, "2026-01-01 00:01:00", "click"),
        (2, "2026-01-01 00:02:00", "click"),
        (3, "2026-01-01 01:00:00", "click"),
    ])
    # Batch 1 advances event time further; its in-effect watermark
    # (00:50) finalizes and evicts the 00:00 window at batch end. (A
    # late row arriving in the SAME batch as finalization would still
    # merge — eviction must strictly precede the straggler.)
    write_drop("b_batch1.json", [(5, "2026-01-01 02:00:00", "click")])
    # Batch 2: a straggler for the closed 00:00 window (~105 min late).
    write_drop("c_batch2.json", [(4, "2026-01-01 00:03:00", "click")])

    stream = (
        spark.readStream.schema(
            read_event_stream(spark, str(drops)).schema
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(drops))
    )
    q = start_to_memory(
        windowed_counts(stream, window="5 minutes", watermark="10 minutes"),
        "late_counts",
        str(tmp_path / "late_ckpt"),
        output_mode="append",
    )
    q.awaitTermination(120)
    first_window = [
        r["n_events"]
        for r in spark.table("late_counts").collect()
        if str(r["window_start"]) == "2026-01-01 00:00:00"
    ]
    # The 00:00 window was finalized once, with exactly the 2 on-time
    # events; the late straggler neither re-emitted nor bumped the count.
    assert first_window == [2]


def test_complete_mode_aggregate_equals_batch(spark, tmp_path, event_files):
    """outputMode('complete') re-emits the full aggregate each batch;
    after availableNow drains, the final table equals the batch
    aggregate (third output mode, alongside append/update coverage)."""
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, event_files)
    counts = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("complete_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_complete"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n"], r["s"])
        for r in spark.table("complete_counts").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == want and len(got) == 5
