"""applyInPandasWithState: state must accumulate across micro-batches
and the final emission must equal the batch aggregate."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deathmetal_datalake_spark.sources.tables import load_table
from deathmetal_datalake_spark.streaming.stateful import running_user_totals
from deathmetal_datalake_spark.streaming.windows import EVENT_SCHEMA

SF = "/root/testdata/sf0.001"


def test_stateful_running_totals(spark, tmp_path):
    rows = load_table(spark, SF, "events").collect()
    drops = tmp_path / "drops"
    drops.mkdir()
    n = (len(rows) + 3) // 4
    for part in range(4):
        with open(drops / f"d{part}.json", "w") as f:
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
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per drop
        .json(str(drops))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("running_totals")
    # multiple batches → multiple emissions per user (state carried over)
    assert emitted.count() > emitted.select("user_id").distinct().count()
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in emitted.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == batch


def test_stateful_timeout_evicts_idle_keys(spark, tmp_path):
    import time

    from deathmetal_datalake_spark.streaming.stateful import (
        running_user_totals_with_timeout,
    )

    drops = tmp_path / "evict_drops"
    drops.mkdir()

    def drop(name, user_ids):
        with open(drops / name, "w") as f:
            for i, u in enumerate(user_ids):
                f.write(
                    json.dumps(
                        {
                            "event_id": i,
                            "ts": "2026-01-01 00:00:00",
                            "user_id": u,
                            "event_type": "click",
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    drop("b0.json", [1, 1, 2])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(drops))
    q = (
        running_user_totals_with_timeout(stream, idle_timeout_ms=500)
        .writeStream.format("memory")
        .queryName("evicting_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "evict_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # Batch 1 processes users 1 and 2; then only user 2 stays active.
        # User 1 must be flushed with evicted=true once its 500 ms idle
        # timeout lapses on a later batch, and must not re-emit after.
        deadline = time.time() + 120
        evicted = []
        batch = 1
        while time.time() < deadline and not evicted:
            time.sleep(2)
            drop(f"b{batch}.json", [2])  # keep user 2 active, user 1 idle
            batch += 1
            evicted = (
                spark.table("evicting_totals")
                .filter("evicted AND user_id = 1")
                .collect()
            )
        assert evicted, "idle key was never evicted"
        assert evicted[0]["n_events"] == 2 and evicted[0]["total_value"] == 2.0
        live_user2 = spark.table("evicting_totals").filter(
            "NOT evicted AND user_id = 2"
        )
        assert live_user2.count() >= 2  # still updating across batches
    finally:
        q.stop()


def test_streaming_asof_equals_batch(spark, tmp_path):
    """The stateful streaming as-of join must equal the batch window
    formulation when delivery is event-time ordered across batches."""
    from deathmetal_datalake_spark.plans.events import (
        events_asof_click_before_purchase,
    )
    from deathmetal_datalake_spark.streaming.stateful import (
        streaming_asof_click_before_purchase,
    )

    rows = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r["ts"], 1 if r["event_type"] == "purchase" else 0, r["event_id"]),
    )
    drops = tmp_path / "asof_drops"
    drops.mkdir()
    n = (len(rows) + 3) // 4
    for part in range(4):
        with open(drops / f"d{part}.json", "w") as f:
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
    # Pin strictly increasing mtimes: the file source delivers in mtime
    # order at MILLISECOND resolution, and on a loaded machine two
    # sequential writes can share an ms — flipping the delivery order
    # this order-SENSITIVE as-of state depends on (observed once as a
    # full-suite-only flake, round 9).
    import os
    import time as _time

    _base = _time.time()
    for part in range(4):
        os.utime(drops / f"d{part}.json", (_base + part, _base + part))
    from deathmetal_datalake_spark.streaming.windows import EVENT_SCHEMA

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drops))
    )
    q = (
        streaming_asof_click_before_purchase(stream)
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: (r["user_id"], r["purchase_ts"], r["asof_click_ts"])
        for r in spark.table("asof_stream").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["purchase_ts"], r["asof_click_ts"])
        for r in events_asof_click_before_purchase(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_asof_survives_multi_chunk_batches(spark, tmp_path):
    """A group's micro-batch can arrive as several Arrow chunks with no
    inter-chunk ordering; the operator must still apply state in event
    order (regression: per-chunk sorting let a later click time-travel
    before an earlier purchase)."""
    from deathmetal_datalake_spark.plans.events import (
        events_asof_click_before_purchase,
    )
    from deathmetal_datalake_spark.streaming.stateful import (
        streaming_asof_click_before_purchase,
    )
    from deathmetal_datalake_spark.streaming.windows import EVENT_SCHEMA

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        rows = sorted(
            load_table(spark, SF, "events").collect(),
            key=lambda r: (r["ts"], 1 if r["event_type"] == "purchase" else 0, r["event_id"]),
        )
        drops = tmp_path / "chunk_drops"
        drops.mkdir()
        with open(drops / "all.json", "w") as f:
            for r in rows:
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
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(drops))
        q = (
            streaming_asof_click_before_purchase(stream)
            .writeStream.format("memory")
            .queryName("asof_chunked")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["event_id"]: (r["user_id"], r["purchase_ts"], r["asof_click_ts"])
            for r in spark.table("asof_chunked").collect()
        }
        want = {
            r["event_id"]: (r["user_id"], r["purchase_ts"], r["asof_click_ts"])
            for r in events_asof_click_before_purchase(spark, SF).collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_transition_increments_carry_state_across_batches(spark, tmp_path):
    # Order-sensitive operator: two ts-ordered micro-batches whose rows
    # arrive UNSORTED inside each batch; the cross-batch transition
    # (batch 1's last event -> batch 2's first) must come from state.
    from deathmetal_datalake_spark.streaming.stateful import (
        type_transition_increments,
    )

    drops = tmp_path / "drops"
    drops.mkdir()
    # user 1: click(t1) view(t2) | purchase(t3); user 2: view(t1) | view(t4)
    batches = [
        [  # batch 0, deliberately out of in-batch order
            (2, "2024-01-01 00:02:00", 1, "view", 0.0, "{}"),
            (1, "2024-01-01 00:01:00", 1, "click", 0.0, "{}"),
            (3, "2024-01-01 00:01:30", 2, "view", 0.0, "{}"),
        ],
        [
            (4, "2024-01-01 00:03:00", 1, "purchase", 0.0, "{}"),
            (5, "2024-01-01 00:04:00", 2, "view", 0.0, "{}"),
        ],
    ]
    import json as _json

    import os as _os
    import time as _time

    now = _time.time()
    for i, rows in enumerate(batches):
        path = drops / f"d{i}.json"
        with open(path, "w") as f:
            for e, ts, u, t, v, p in rows:
                f.write(
                    _json.dumps(
                        {"event_id": e, "ts": ts, "user_id": u,
                         "event_type": t, "value": v, "props": p}
                    )
                    + "\n"
                )
        # The operator's contract is event-time-ordered batch delivery
        # (strictly increasing file mtimes, like the slice replay's
        # sequential write jobs); two quick writes can tie at the file
        # source's ms resolution, so pin the order explicitly.
        _os.utime(path, (now + i, now + i))
    from deathmetal_datalake_spark.streaming.windows import EVENT_SCHEMA

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(drops))
    )
    q = (
        type_transition_increments(stream)
        .writeStream.format("memory")
        .queryName("transition_incs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["prev_type"], r["next_type"]): r["n_inc"]
        for r in spark.table("transition_incs").collect()
    }
    assert got == {
        (1, "click", "view"): 1,       # in-batch, needed the sort
        (1, "view", "purchase"): 1,    # cross-batch, needed the state
        (2, "view", "view"): 1,        # cross-batch for user 2
    }
