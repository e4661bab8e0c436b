"""Structured Streaming landing → bronze: chunk-with-header replay
(SURVEY.md §7.3 M3; reference chunker semantics flows/landing.py:27-53)."""

from __future__ import annotations

import csv
from pathlib import Path

import pytest

from deathmetal_datalake_spark.streaming.landing import chunk_csv, stream_landing_to_bronze


@pytest.fixture()
def landing(tmp_path):
    src = tmp_path / "src.csv"
    with open(src, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "album", "title", "score", "content"])
        for i in range(1, 2001):
            w.writerow([i, i % 50, f"Review {i}", round(i * 0.05, 2), f"text {i}"])
    chunks = chunk_csv(str(src), str(tmp_path / "landing" / "reviews"), max_bytes=16 * 1024)
    return tmp_path, chunks


def test_chunker_reattaches_header(landing):
    tmp_path, chunks = landing
    assert len(chunks) > 1, "must split into multiple chunks"
    header = "id,album,title,score,content"
    for c in chunks:
        lines = Path(c).read_text().splitlines()
        assert lines[0] == header, "every chunk re-starts with the header"
    # No rows lost: total data lines == 2000.
    total = sum(len(Path(c).read_text().splitlines()) - 1 for c in chunks)
    assert total == 2000


def test_stream_availablenow_drains_to_bronze(spark, landing):
    tmp_path, chunks = landing
    q = stream_landing_to_bronze(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "bronze"),
        "reviews",
        ["id", "album", "title", "score", "content"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "bronze" / "reviews"))
    assert out.count() == 2000
    assert out.columns == ["id", "album", "title", "score", "content"]
    # Exactly-once on restart: re-running with the same checkpoint adds nothing.
    q2 = stream_landing_to_bronze(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "bronze"),
        "reviews",
        ["id", "album", "title", "score", "content"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "bronze" / "reviews")).count() == 2000


def test_stream_diverts_corrupt_records(spark, tmp_path):
    land = tmp_path / "landing" / "reviews"
    land.mkdir(parents=True)
    # A malformed row (unclosed quote spanning columns) → _corrupt_record.
    (land / "part0.csv").write_text(
        'id,album,title,score,content\n1,2,ok,3.5,fine\n"broken\n'
    )
    q = stream_landing_to_bronze(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "bronze"),
        "reviews",
        ["id", "album", "title", "score", "content"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        errors_dir=str(tmp_path / "errors"),
    )
    q.awaitTermination(120)
    good = spark.read.parquet(str(tmp_path / "bronze" / "reviews"))
    assert good.count() == 1
    bad = spark.read.json(str(tmp_path / "errors" / "reviews"))
    assert bad.count() >= 1


def test_rate_source_transport_to_bronze(spark, tmp_path):
    import time

    from deathmetal_datalake_spark.streaming.landing import stream_rate_to_bronze

    q = stream_rate_to_bronze(
        spark,
        str(tmp_path / "bronze"),
        "ticks",
        str(tmp_path / "ckpt"),
        rows_per_second=200,
    )
    try:
        deadline = time.time() + 60
        written = None
        while time.time() < deadline:
            time.sleep(2)
            try:
                written = spark.read.parquet(str(tmp_path / "bronze" / "ticks"))
                if written.count() > 0:
                    break
            except Exception:
                continue
        assert written is not None and written.count() > 0
    finally:
        q.stop()
    # Stable landing-record envelope, exactly-once ids.
    assert written.columns == ["record_id", "arrival_ts", "partition_key", "payload"]
    n = written.count()
    assert written.select("record_id").distinct().count() == n
    keys = {r["partition_key"] for r in written.select("partition_key").distinct().collect()}
    assert keys <= {str(i) for i in range(8)}


def test_stream_drop_duplicates_exactly_once(spark, tmp_path):
    """Stateful streaming dedup: re-delivered records (at-least-once
    transport) must emit exactly once across micro-batches."""
    import json
    import time

    from deathmetal_datalake_spark.streaming.windows import EVENT_SCHEMA

    drops = tmp_path / "dup_drops"
    drops.mkdir()

    def write_drop(name, ids):
        with open(drops / name, "w") as f:
            for eid in ids:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": "2026-01-01 00:00:00",
                            "user_id": eid % 5,
                            "event_type": "click",
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
        time.sleep(1.1)

    # Batch 2 re-delivers half of batch 1 (simulated transport retry).
    write_drop("a.json", [1, 2, 3, 4])
    write_drop("b.json", [3, 4, 5, 6])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drops))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = [r["event_id"] for r in spark.table("dedup_stream").collect()]
    assert sorted(ids) == [1, 2, 3, 4, 5, 6], ids  # each exactly once


def test_socket_transport_to_windowed_counts(spark):
    """Push-based network transport (the Kinesis ``put_record`` analog,
    reference flows/landing.py:27-53): a TCP producer pushes CSV event
    lines into Spark's socket source; the stream is parsed and
    aggregated, and the complete-mode result must equal the batch
    groupBy over everything sent. Completes the transport trio:
    chunked-file replay, rate source, and now a true network push."""
    import socket
    import threading
    import time as _time

    from pyspark.sql import functions as F

    n_users, per_user = 20, 5
    lines = [
        f"{uid},{'click' if i % 2 == 0 else 'view'}"
        for uid in range(n_users)
        for i in range(per_user)
    ]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    done = threading.Event()

    def serve():
        conn, _ = server.accept()
        try:
            for line in lines:
                conn.sendall((line + "\n").encode())
            done.wait(60)  # keep the pipe open until the test drained it
        finally:
            conn.close()
            server.close()

    producer = threading.Thread(target=serve, daemon=True)
    producer.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    parsed = raw.select(
        F.split("value", ",")[0].cast("long").alias("user_id"),
        F.split("value", ",")[1].alias("event_type"),
    )
    counts = parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        counts.writeStream.format("memory")
        .queryName("socket_counts")
        .outputMode("complete")
        .start()
    )
    try:
        expected = {
            "click": n_users * ((per_user + 1) // 2),
            "view": n_users * (per_user // 2),
        }
        deadline = _time.time() + 90
        got: dict[str, int] = {}
        while _time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["event_type"]: r["n"] for r in spark.table("socket_counts").collect()
            }
            if got == expected:
                break
            _time.sleep(0.5)
        assert got == expected, got
    finally:
        done.set()
        q.stop()


def test_publish_batch_is_idempotent_per_batch_id(spark, tmp_path):
    # foreachBatch is at-least-once: a batch replayed after a partial
    # failure must not duplicate rows in the sink.
    import os

    from deathmetal_datalake_spark.streaming.landing import _publish_batch

    dest = str(tmp_path / "bronze")
    df = spark.range(100).withColumnRenamed("id", "v")
    _publish_batch(df, dest, batch_id=7)
    assert spark.read.parquet(dest).count() == 100
    # Full replay (marker present): no-op.
    _publish_batch(df, dest, batch_id=7)
    assert spark.read.parquet(dest).count() == 100
    # Partial-publish replay: files landed but the marker write was lost
    # (crash between rename pass and marker) — replay must overwrite the
    # deterministic names, not append alongside them.
    os.remove(os.path.join(dest, "_batch-0000000007.done"))
    _publish_batch(df, dest, batch_id=7)
    assert spark.read.parquet(dest).count() == 100
    # A different batch appends.
    _publish_batch(spark.range(5).withColumnRenamed("id", "v"), dest, batch_id=8)
    assert spark.read.parquet(dest).count() == 105


def test_errors_path_exactly_once_after_restart(spark, tmp_path):
    # Corrupt-row diversion runs through foreachBatch; draining the same
    # landing twice through a FRESH checkpoint replays every batch — the
    # idempotent publish must keep bronze row counts stable when batch
    # ids repeat. (Same-checkpoint restarts already skip completed
    # batches; this exercises the publish-layer guarantee directly.)
    import csv as _csv
    import os

    from deathmetal_datalake_spark.streaming.landing import (
        chunk_csv,
        stream_landing_to_bronze,
    )

    src = tmp_path / "s.csv"
    with open(src, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["id", "name"])
        for i in range(200):
            w.writerow([i, f"n{i}"])
    chunk_csv(str(src), str(tmp_path / "landing" / "ds"), max_bytes=2048)
    bronze = str(tmp_path / "bronze")
    q = stream_landing_to_bronze(
        spark,
        str(tmp_path / "landing"),
        bronze,
        "ds",
        ["id", "name"],
        str(tmp_path / "ckpt1"),
        errors_dir=str(tmp_path / "errors"),
    )
    q.awaitTermination()
    first = spark.read.parquet(os.path.join(bronze, "ds")).count()
    assert first == 200
    # Replay with a fresh checkpoint: batch ids restart at 0, the same
    # data re-arrives — publishes dedupe on (batch_id, content) names.
    q2 = stream_landing_to_bronze(
        spark,
        str(tmp_path / "landing"),
        bronze,
        "ds",
        ["id", "name"],
        str(tmp_path / "ckpt2"),
        errors_dir=str(tmp_path / "errors"),
    )
    q2.awaitTermination()
    assert spark.read.parquet(os.path.join(bronze, "ds")).count() == 200
