"""Kinesis-shaped record transport: producer routing/ordering and the
``record_feed`` streaming source's delivery guarantees."""

from __future__ import annotations

import json
import os

import pytest

from deathmetal_datalake_spark.streaming.transport import (
    RECORD_FEED_SCHEMA,
    RecordStreamTransport,
    register_record_feed,
    shard_for_key,
)


@pytest.fixture()
def transport(tmp_path):
    return RecordStreamTransport(str(tmp_path / "streams"))


def _read_shard(stream_dir: str, shard: int) -> list[dict]:
    path = os.path.join(stream_dir, f"shard-{shard:04d}.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_routing_matches_md5_convention(transport):
    # shard_for_key is the engine's portable 60-bit md5 hash mod shards
    # — the same value SQL computes with
    # CAST('0x'||substr(md5(pk),1,15) AS BIGINT) % n.
    import hashlib

    for pk in ["events", "albums", "user-17", ""]:
        expect = int(hashlib.md5(pk.encode()).hexdigest()[:15], 16) % 4
        assert shard_for_key(pk, 4) == expect


def test_put_record_lands_in_routed_shard_with_monotonic_seq(transport):
    d = transport.create_stream("ev", n_shards=4)
    placements = [transport.put_record("ev", f"user-{i % 7}", f"payload-{i}") for i in range(40)]
    for i, (shard, _seq) in enumerate(placements):
        assert shard == shard_for_key(f"user-{i % 7}", 4)
    for s in range(4):
        recs = _read_shard(d, s)
        assert [r["seq"] for r in recs] == list(range(len(recs)))


def test_seq_recovered_after_producer_restart(tmp_path):
    root = str(tmp_path / "streams")
    t1 = RecordStreamTransport(root)
    t1.create_stream("ev", n_shards=1)
    t1.put_record("ev", "k", "a")
    t1.put_record("ev", "k", "b")
    t2 = RecordStreamTransport(root)  # fresh producer, same logs
    shard, seq = t2.put_record("ev", "k", "c")
    assert (shard, seq) == (0, 2)


def test_reshard_rejected_create_idempotent(transport):
    transport.create_stream("ev", n_shards=2)
    transport.create_stream("ev", n_shards=2)  # idempotent
    with pytest.raises(ValueError, match="resharding"):
        transport.create_stream("ev", n_shards=3)


def test_chunked_csv_producer_reattaches_header(transport):
    d = transport.create_stream("landing", n_shards=2)
    csv = "id,name\n" + "\n".join(f"{i},row{i}" for i in range(100))
    placements = transport.put_csv_in_chunks("landing", "albums", csv, max_bytes=120)
    assert len(placements) > 3  # genuinely chunked
    # Single partition key => single shard => ordered chunks.
    assert len({s for s, _ in placements}) == 1
    shard = placements[0][0]
    rows: list[str] = []
    for rec in _read_shard(d, shard):
        chunk_lines = rec["data"].splitlines()
        assert chunk_lines[0] == "id,name"  # standalone-parseable
        rows.extend(chunk_lines[1:])
    assert rows == [f"{i},row{i}" for i in range(100)]


def test_stream_delivers_every_record_exactly_once(spark, transport):
    d = transport.create_stream("ev", n_shards=3)
    produced = [(f"user-{i % 5}", f"payload-{i}") for i in range(60)]
    transport.put_records("ev", produced)
    register_record_feed(spark)
    stream = (
        spark.readStream.format("record_feed")
        .schema(RECORD_FEED_SCHEMA)
        .option("path", d)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("record_feed_once")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("record_feed_once").collect()
    assert sorted(r.data for r in got) == sorted(p for _, p in produced)
    # Per-shard ordering: seq strictly increasing in arrival order is
    # checked via (shard_id, seq) uniqueness + contiguity.
    by_shard: dict[int, list[int]] = {}
    for r in got:
        by_shard.setdefault(r.shard_id, []).append(r.seq)
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_checkpoint_restart_resumes_without_redelivery(spark, transport, tmp_path):
    d = transport.create_stream("ev", n_shards=2)
    register_record_feed(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.format("record_feed")
            .schema(RECORD_FEED_SCHEMA)
            .option("path", d)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    transport.put_records("ev", [(f"a-{i}", f"first-{i}") for i in range(10)])
    drain()
    transport.put_records("ev", [(f"b-{i}", f"second-{i}") for i in range(10)])
    drain()  # same checkpoint: must deliver ONLY the new records
    got = sorted(r.data for r in spark.read.parquet(sink).collect())
    expect = sorted([f"first-{i}" for i in range(10)] + [f"second-{i}" for i in range(10)])
    assert got == expect


def test_foreachbatch_drain_resumes_and_dedupes_redelivery(spark, transport, tmp_path):
    # The transport replay queries drain via foreachBatch into a
    # batch_id-keyed driver dict (round-13: replaces the parquet sink +
    # re-read). Two contracts pinned here: (a) a second drain on the
    # same checkpoint delivers ONLY the new records (incremental
    # offsets survive the sink swap); (b) the keyed overwrite makes a
    # redelivered micro-batch (foreachBatch is at-least-once) a no-op
    # instead of a duplication.
    d = transport.create_stream("ev", n_shards=2)
    register_record_feed(spark)
    ckpt = str(tmp_path / "ckpt")
    batches: dict[int, list] = {}

    def drain():
        def _sink(bdf, batch_id):
            batches[batch_id] = bdf.collect()

        q = (
            spark.readStream.format("record_feed")
            .schema(RECORD_FEED_SCHEMA)
            .option("path", d)
            .load()
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    transport.put_records("ev", [(f"a-{i}", f"first-{i}") for i in range(10)])
    drain()
    first_batches = dict(batches)
    transport.put_records("ev", [(f"b-{i}", f"second-{i}") for i in range(10)])
    drain()  # same checkpoint: must deliver ONLY the new records
    new_ids = set(batches) - set(first_batches)
    assert new_ids, "second drain must add at least one new batch id"
    new_rows = [r for b in new_ids for r in batches[b]]
    assert sorted(r.data for r in new_rows) == sorted(f"second-{i}" for i in range(10))
    all_rows = [r for rows in batches.values() for r in rows]
    assert sorted(r.data for r in all_rows) == sorted(
        [f"first-{i}" for i in range(10)] + [f"second-{i}" for i in range(10)]
    )
    # (b) batch ids never collide across the two drains — the keyed
    # store can only dedupe redeliveries if a resumed query continues
    # the id sequence instead of restarting it at 0.
    assert len(batches) == len(first_batches) + len(new_ids)
    assert max(first_batches) < min(new_ids)


def test_chunked_csv_through_transport_to_bronze(spark, transport, tmp_path):
    # The reference's full ingest edge: chunked CSV put_record -> shard
    # log -> streaming parse -> bronze parquet, equal to a batch read
    # of the original CSV.
    import csv as csvmod

    from deathmetal_datalake_spark.streaming.landing import stream_records_to_bronze

    src = tmp_path / "reviews.csv"
    with open(src, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["id", "album", "title"])
        for i in range(1, 501):
            w.writerow([i, i % 50, f"Review {i}"])
    d = transport.create_stream("landing", n_shards=2)
    transport.put_csv_in_chunks("landing", "reviews", src.read_text(), max_bytes=2048)
    bronze = str(tmp_path / "bronze")
    q = stream_records_to_bronze(
        spark, d, ["id", "album", "title"], bronze, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = spark.read.parquet(bronze)
    expect = spark.read.option("header", True).csv(str(src))
    assert got.count() == 500
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_concurrent_producer_instances_keep_seqs_unique(tmp_path):
    root = str(tmp_path / "streams")
    t1 = RecordStreamTransport(root)
    t1.create_stream("ev", n_shards=1)
    t2 = RecordStreamTransport(root)  # second live producer, same logs
    placements = []
    for i in range(10):
        placements.append(t1.put_record("ev", "k", f"a-{i}"))
        placements.append(t2.put_record("ev", "k", f"b-{i}"))
    seqs = [seq for _, seq in placements]
    assert sorted(seqs) == list(range(20))  # unique AND gapless


def test_bronze_keeps_data_row_that_equals_header(spark, transport, tmp_path):
    # Header stripping is positional (line 1 of each chunk), so a data
    # row whose text coincides with the header must survive to bronze.
    from deathmetal_datalake_spark.streaming.landing import stream_records_to_bronze

    d = transport.create_stream("landing", n_shards=1)
    chunk = "id,name\n1,alpha\nid,name\n2,beta"
    transport.put_record("landing", "tricky", chunk)
    bronze = str(tmp_path / "bronze")
    q = stream_records_to_bronze(
        spark, d, ["id", "name"], bronze, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(bronze).collect()))
    assert got == [("1", "alpha"), ("2", "beta"), ("id", "name")]


def test_latest_offset_floors_torn_record_to_boundary(transport):
    # A record flushed across multiple syscalls can be half-visible when
    # latestOffset snapshots the file size; the planned offset must be
    # the last record terminator, never a mid-record byte (a torn offset
    # in the WAL wedges the query permanently).
    from deathmetal_datalake_spark.streaming.transport import (
        RecordFeedStreamReader,
        _shard_path,
    )

    d = transport.create_stream("ev", n_shards=1)
    transport.put_record("ev", "k", "complete-1")
    transport.put_record("ev", "k", "complete-2")
    path = _shard_path(d, 0)
    boundary = os.path.getsize(path)
    with open(path, "a", encoding="utf-8") as f:  # torn append, no newline
        f.write('{"seq":2,"pk":"k","data":"par')
        f.flush()
    reader = RecordFeedStreamReader(RECORD_FEED_SCHEMA, {"path": d})
    assert reader.latestOffset() == {"shard-0000": boundary}
    # Once the record completes, the offset advances past it.
    with open(path, "a", encoding="utf-8") as f:
        f.write('tial"}\n')
    assert reader.latestOffset() == {"shard-0000": os.path.getsize(path)}


def test_read_tolerates_trailing_partial_line(transport):
    from deathmetal_datalake_spark.streaming.transport import (
        RecordFeedStreamReader,
        _ShardRangePartition,
        _shard_path,
    )

    d = transport.create_stream("ev", n_shards=1)
    transport.put_record("ev", "k", "whole")
    path = _shard_path(d, 0)
    with open(path, "a", encoding="utf-8") as f:
        f.write('{"seq":1,"pk":"k","data":"par')
    reader = RecordFeedStreamReader(RECORD_FEED_SCHEMA, {"path": d})
    part = _ShardRangePartition(0, path, 0, os.path.getsize(path))
    rows = list(reader.read(part))
    assert [r[3] for r in rows] == ["whole"]  # fragment skipped, no crash


def test_multi_buffer_record_boundary_scan(transport):
    # Boundary scan must walk backward across chunk windows when the
    # torn tail is longer than one scan chunk.
    from deathmetal_datalake_spark.streaming.transport import RecordFeedStreamReader

    d = transport.create_stream("ev", n_shards=1)
    transport.put_record("ev", "k", "x" * 10)
    from deathmetal_datalake_spark.streaming.transport import _shard_path

    path = _shard_path(d, 0)
    boundary = os.path.getsize(path)
    with open(path, "a", encoding="utf-8") as f:
        f.write('{"seq":1,"pk":"k","data":"' + "y" * 200_000)  # > 64 KiB, no \n
    assert (
        RecordFeedStreamReader._floor_to_record_boundary(
            path, os.path.getsize(path)
        )
        == boundary
    )


# ---- ShardLogBackend contract suite ------------------------------------
# Any backend (local-FS now; a Kafka/Kinesis adapter later) must pass
# these by inheriting the mixin and providing make_backend().


class ShardLogContract:
    def make_backend(self, tmp_path):
        raise NotImplementedError

    def test_ensure_stream_idempotent_and_shard_count(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 4)
        b.ensure_stream("s", 4)  # idempotent
        assert b.n_shards("s") == 4
        with pytest.raises(ValueError):
            b.ensure_stream("s", 8)  # resharding refused

    def test_append_roundtrip_and_offset_monotonic(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)
        offsets = [b.end_offset("s", 0)]
        payloads = [f'{{"i":{i}}}\n'.encode() for i in range(20)]
        for p in payloads:
            with b.exclusive("s", 0) as log:
                log.append(p)
            offsets.append(b.end_offset("s", 0))
        assert offsets == sorted(offsets)  # never decreases
        assert b.read_range("s", 0, 0, offsets[-1]) == b"".join(payloads)
        # Any handed-out offset remains a valid replay boundary.
        for i in range(1, len(offsets)):
            assert b.read_range("s", 0, offsets[i - 1], offsets[i]) == payloads[i - 1]

    def test_end_offset_is_record_boundary(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)
        with b.exclusive("s", 0) as log:
            log.append(b'{"a":1}\n')
        off = b.end_offset("s", 0)
        assert b.read_range("s", 0, 0, off).endswith(b"\n")

    def test_concurrent_appends_never_interleave(self, tmp_path):
        import threading

        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)

        def writer(tag: str):
            backend = self.make_backend(tmp_path)  # own instance per thread
            for i in range(50):
                rec = (json.dumps({"w": tag, "i": i}) + "\n").encode()
                with backend.exclusive("s", 0) as log:
                    log.append(rec)

        threads = [threading.Thread(target=writer, args=(f"w{t}",)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        blob = b.read_range("s", 0, 0, b.end_offset("s", 0))
        recs = [json.loads(x) for x in blob.decode().splitlines() if x]
        assert len(recs) == 200  # every append fully visible
        per = {}
        for r in recs:
            per.setdefault(r["w"], []).append(r["i"])
        assert all(v == list(range(50)) for v in per.values())  # per-writer order

    def test_last_record_recovery(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)
        with b.exclusive("s", 0) as log:
            assert log.last_record() is None
        with b.exclusive("s", 0) as log:
            log.append(b'{"seq":0}\n')
            log.append(b'{"seq":1}\n')
        with b.exclusive("s", 0) as log:
            assert json.loads(log.last_record())["seq"] == 1

    def test_immutable_replay(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)
        with b.exclusive("s", 0) as log:
            log.append(b'{"x":1}\n')
        end = b.end_offset("s", 0)
        first = b.read_range("s", 0, 0, end)
        with b.exclusive("s", 0) as log:
            log.append(b'{"x":2}\n')
        assert b.read_range("s", 0, 0, end) == first  # old range unchanged

    def test_group_offsets_roundtrip_isolation_and_merge(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 2)
        for shard in (0, 1):
            with b.exclusive("s", shard) as log:
                log.append(b'{"x":1}\n')
        assert b.committed_offsets("s", "g1") == {}
        e0, e1 = b.end_offset("s", 0), b.end_offset("s", 1)
        b.commit_offsets("s", "g1", {0: e0})
        assert b.committed_offsets("s", "g1") == {0: e0}
        # Per-shard merge: committing shard 1 keeps shard 0's value.
        b.commit_offsets("s", "g1", {1: e1})
        assert b.committed_offsets("s", "g1") == {0: e0, 1: e1}
        # Group isolation.
        assert b.committed_offsets("s", "g2") == {}
        # Rewind (last-write-wins) is allowed, like a Kafka seek.
        b.commit_offsets("s", "g1", {0: 0})
        assert b.committed_offsets("s", "g1")[0] == 0

    def test_group_commit_rejects_invalid_offsets(self, tmp_path):
        b = self.make_backend(tmp_path)
        b.ensure_stream("s", 1)
        with b.exclusive("s", 0) as log:
            log.append(b'{"x":1}\n')
        end = b.end_offset("s", 0)
        with pytest.raises(ValueError):
            b.commit_offsets("s", "g", {0: end + 1})  # beyond log end
        with pytest.raises(ValueError):
            b.commit_offsets("s", "g", {0: -1})
        with pytest.raises(ValueError):
            b.commit_offsets("s", "g", {5: 0})  # shard out of range


class TestLocalFSShardLog(ShardLogContract):
    def make_backend(self, tmp_path):
        from deathmetal_datalake_spark.streaming.transport import LocalFSShardLog

        return LocalFSShardLog(str(tmp_path / "backend"))


class TestInMemoryShardLog(ShardLogContract):
    def make_backend(self, tmp_path):
        from deathmetal_datalake_spark.streaming.transport import InMemoryShardLog

        return InMemoryShardLog(str(tmp_path))  # instances share per-root state


class TestRemoteShardLog(ShardLogContract):
    """The full backend contract, with every operation crossing a real
    process boundary: the suite's appends/reads/commits travel over HTTP
    to a subprocess server — the closest this environment gets to a
    broker, and the test that validates the protocol's atomicity claims
    hold when clients and storage are different processes."""

    @pytest.fixture(autouse=True)
    def _server(self, tmp_path):
        from deathmetal_datalake_spark.streaming.shardlog_remote import (
            ShardLogServerProcess,
        )

        with ShardLogServerProcess(str(tmp_path / "backend")) as srv:
            self._base = srv.base_url
            yield

    def make_backend(self, tmp_path):
        from deathmetal_datalake_spark.streaming.shardlog_remote import (
            RemoteShardLog,
        )

        return RemoteShardLog(self._base)


def test_remote_lease_expiry_unwedges_crashed_producer(tmp_path):
    # A client that acquires a shard lease and dies (never releases)
    # must not wedge the shard forever: the next acquire succeeds once
    # the lease expires — the broker producer-timeout analog.
    from deathmetal_datalake_spark.streaming.shardlog_remote import (
        RemoteShardLog,
        ShardLogServerProcess,
    )

    with ShardLogServerProcess(str(tmp_path / "backend"), lease_s=1.0) as srv:
        b = RemoteShardLog(srv.base_url)
        b.ensure_stream("s", 1)
        token = b._call("/acquire", stream="s", shard=0)["token"]  # never released
        with b.exclusive("s", 0) as log:  # blocks ~1 s, then takes over
            log.append(b'{"x":1}\n')
        assert b.end_offset("s", 0) > 0
        # The stale token is dead: its appends are refused.
        with pytest.raises(PermissionError):
            b._call("/append", stream="s", shard=0, token=token, b64="eyJ4IjoyfQo=")


def test_remote_durability_across_server_restart(tmp_path):
    # Broker recovery: records and group offsets live on the server's
    # disk, so a restarted server (same root, new port/process) serves
    # the same log — offsets handed out before the restart still replay.
    from deathmetal_datalake_spark.streaming.shardlog_remote import (
        RemoteShardLog,
        ShardLogServerProcess,
    )

    root = str(tmp_path / "backend")
    with ShardLogServerProcess(root) as srv:
        b = RemoteShardLog(srv.base_url)
        b.ensure_stream("s", 2)
        with b.exclusive("s", 0) as log:
            log.append(b'{"x":1}\n')
        end = b.end_offset("s", 0)
        blob = b.read_range("s", 0, 0, end)
        b.commit_offsets("s", "g", {0: end})
    with ShardLogServerProcess(root) as srv:
        b2 = RemoteShardLog(srv.base_url)
        assert b2.n_shards("s") == 2
        assert b2.end_offset("s", 0) == end
        assert b2.read_range("s", 0, 0, end) == blob
        assert b2.committed_offsets("s", "g") == {0: end}


def test_producer_sdk_and_group_consumer_over_remote(tmp_path):
    # End-to-end over the wire: put_record routing/sequencing and the
    # GroupConsumer poll/commit loop, all through the subprocess server.
    from deathmetal_datalake_spark.streaming.shardlog_remote import (
        RemoteShardLog,
        ShardLogServerProcess,
    )
    from deathmetal_datalake_spark.streaming.transport import (
        GroupConsumer,
        RecordStreamTransport,
    )

    with ShardLogServerProcess(str(tmp_path / "backend")) as srv:
        backend = RemoteShardLog(srv.base_url)
        t = RecordStreamTransport(srv.base_url, backend=backend)
        t.create_stream("ev", n_shards=4)
        for i in range(40):
            shard, _ = t.put_record("ev", f"user-{i % 7}", f"p-{i}")
            assert shard == shard_for_key(f"user-{i % 7}", 4)
        c = GroupConsumer(backend, "ev", "g1")
        first = c.poll()
        assert sorted(r["data"] for r in first) == sorted(f"p-{i}" for i in range(40))
        c.commit()
        assert c.poll() == []  # committed: nothing new
        t.put_record("ev", "user-1", "late")
        assert [r["data"] for r in c.poll()] == ["late"]


def test_producer_sdk_runs_on_memory_backend(tmp_path):
    # The drop-in claim, exercised: RecordStreamTransport with the
    # in-memory backend behaves identically to the local-FS default.
    from deathmetal_datalake_spark.streaming.transport import (
        InMemoryShardLog,
        RecordStreamTransport,
    )

    backend = InMemoryShardLog(str(tmp_path))
    t = RecordStreamTransport(str(tmp_path), backend=backend)
    t.create_stream("ev", n_shards=4)
    placements = [t.put_record("ev", f"user-{i % 7}", f"p-{i}") for i in range(40)]
    for i, (shard, _seq) in enumerate(placements):
        assert shard == shard_for_key(f"user-{i % 7}", 4)
    # Per-shard seqs recover from the log for a fresh producer instance
    # sharing the backend, exactly like the FS path.
    t2 = RecordStreamTransport(str(tmp_path), backend=InMemoryShardLog(str(tmp_path)))
    shard, seq = t2.put_record("ev", "user-0", "more")
    recs = []
    end = backend.end_offset("ev", shard)
    for raw in backend.read_range("ev", shard, 0, end).decode().splitlines():
        recs.append(json.loads(raw))
    assert [r["seq"] for r in recs] == list(range(len(recs)))


def test_group_offsets_survive_backend_reopen(tmp_path):
    # FS-specific durability: a fresh backend instance over the same
    # root sees the committed offsets (process restart survival).
    from deathmetal_datalake_spark.streaming.transport import LocalFSShardLog

    root = str(tmp_path / "b")
    b = LocalFSShardLog(root)
    b.ensure_stream("s", 1)
    with b.exclusive("s", 0) as log:
        log.append(b'{"x":1}\n')
    end = b.end_offset("s", 0)
    b.commit_offsets("s", "grp", {0: end})
    reopened = LocalFSShardLog(root)
    assert reopened.committed_offsets("s", "grp") == {0: end}


def test_group_consumer_at_least_once_and_progress(tmp_path):
    # The consumer-group contract end-to-end: redelivery until commit,
    # only-new after commit, independent groups.
    from deathmetal_datalake_spark.streaming.transport import (
        GroupConsumer,
        RecordStreamTransport,
    )

    t = RecordStreamTransport(str(tmp_path))
    t.create_stream("s", 2)
    for i in range(5):
        t.put_record("s", f"k{i}", f"v{i}")

    c = GroupConsumer(t.backend, "s", "g1")
    first = c.poll()
    assert sorted(r["data"] for r in first) == [f"v{i}" for i in range(5)]
    # Crash before commit: a fresh consumer re-reads the whole batch.
    assert len(GroupConsumer(t.backend, "s", "g1").poll()) == 5
    c.commit()
    assert GroupConsumer(t.backend, "s", "g1").poll() == []
    t.put_record("s", "k9", "v9")
    only_new = GroupConsumer(t.backend, "s", "g1").poll()
    assert [r["data"] for r in only_new] == ["v9"]
    # Another group is unaffected by g1's progress.
    assert len(GroupConsumer(t.backend, "s", "g2").poll()) == 6
    # commit() before poll() is a misuse, not a silent no-op.
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        GroupConsumer(t.backend, "s", "g3").commit()


def test_group_consumer_bounded_polls_catch_up(tmp_path):
    # fetch.max.bytes analog: a far-behind consumer catches up in
    # bounded record-aligned batches, never one giant poll; an
    # oversized single record still makes progress.
    from deathmetal_datalake_spark.streaming.transport import (
        GroupConsumer,
        RecordStreamTransport,
    )

    t = RecordStreamTransport(str(tmp_path))
    t.create_stream("s", 1)
    for i in range(20):
        t.put_record("s", "k", f"v{i:03d}")
    c = GroupConsumer(t.backend, "s", "g", max_bytes_per_shard=120)
    seen = []
    polls = 0
    while True:
        batch = c.poll()
        if not batch:
            break
        assert len(batch) < 20  # genuinely bounded
        seen.extend(r["data"] for r in batch)
        c.commit()
        polls += 1
    assert seen == [f"v{i:03d}" for i in range(20)]  # order preserved
    assert polls > 3
    # Oversized single record: cap smaller than one record.
    t.put_record("s", "k", "x" * 500)
    big = GroupConsumer(t.backend, "s", "g", max_bytes_per_shard=64).poll()
    assert len(big) == 1 and big[0]["data"] == "x" * 500


def test_record_feed_starts_from_group_offsets(spark, transport, tmp_path):
    # Batch → stream handoff: a GroupConsumer backfill commits its
    # progress, then a FRESH streaming query with
    # startingOffsets='group:<name>' begins exactly there — only
    # post-handoff records are delivered.
    from deathmetal_datalake_spark.streaming.transport import GroupConsumer

    d = transport.create_stream("ev", n_shards=2)
    transport.put_records("ev", [(f"a-{i}", f"backfill-{i}") for i in range(10)])
    backfill = GroupConsumer(transport.backend, d, "handoff")
    assert len(backfill.poll()) == 10
    backfill.commit()
    transport.put_records("ev", [(f"b-{i}", f"live-{i}") for i in range(10)])

    register_record_feed(spark)
    stream = (
        spark.readStream.format("record_feed")
        .schema(RECORD_FEED_SCHEMA)
        .option("path", d)
        .option("startingOffsets", "group:handoff")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("group_start_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.data for r in spark.table("group_start_sink").collect())
    assert got == sorted(f"live-{i}" for i in range(10))


def test_record_feed_rejects_bad_starting_offsets(spark, transport, tmp_path):
    d = transport.create_stream("ev2", n_shards=1)
    transport.put_record("ev2", "k", "v")
    register_record_feed(spark)
    stream = (
        spark.readStream.format("record_feed")
        .schema(RECORD_FEED_SCHEMA)
        .option("path", d)
        .option("startingOffsets", "bogus")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("bad_start_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    import pyspark.errors

    with pytest.raises(Exception, match="startingOffsets|STREAM_FAILED"):
        q.awaitTermination()


def test_record_feed_group_start_over_remote_backend(spark, tmp_path):
    # The batch -> stream handoff ACROSS the process boundary: backfill
    # committed via the HTTP backend, then a fresh streaming query with
    # startingOffsets='group:<name>' against the http:// locator — the
    # reader resolves the group's offsets over the wire and delivers
    # only post-handoff records.
    from deathmetal_datalake_spark.streaming.shardlog_remote import (
        RemoteShardLog,
        ShardLogServerProcess,
    )
    from deathmetal_datalake_spark.streaming.transport import (
        GroupConsumer,
        RecordStreamTransport,
    )

    with ShardLogServerProcess(str(tmp_path / "broker")) as srv:
        backend = RemoteShardLog(srv.base_url)
        t = RecordStreamTransport(srv.base_url, backend=backend)
        locator = t.create_stream("ev", n_shards=2)
        assert locator.startswith("http://")
        t.put_records("ev", [(f"a-{i}", f"backfill-{i}") for i in range(8)])
        backfill = GroupConsumer(backend, "ev", "handoff")
        assert len(backfill.poll()) == 8
        backfill.commit()
        t.put_records("ev", [(f"b-{i}", f"live-{i}") for i in range(8)])

        register_record_feed(spark)
        stream = (
            spark.readStream.format("record_feed")
            .schema(RECORD_FEED_SCHEMA)
            .option("path", locator)
            .option("startingOffsets", "group:handoff")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("remote_group_start_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r.data for r in spark.table("remote_group_start_sink").collect())
        assert got == sorted(f"live-{i}" for i in range(8))


def test_lease_table_fences_stale_holder_at_write_time(tmp_path):
    # ADVICE r5: validation happens both before AND while holding the
    # append flock. A holder that validated, then stalled past its
    # lease while another client took over, must fail the write-time
    # re-check — its token was replaced.
    import time as _time

    from deathmetal_datalake_spark.streaming.shardlog_remote import _LeaseTable

    lt = _LeaseTable(lease_s=0.2)
    t1 = lt.acquire("s", 0)
    lt.validate("s", 0, t1)  # the pre-flock check passes
    _time.sleep(0.25)  # stall past the lease (e.g. blocked on the flock)
    t2 = lt.acquire("s", 0)  # legitimate takeover
    with pytest.raises(PermissionError):
        lt.validate("s", 0, t1)  # write-time re-check rejects the stale holder
    lt.validate("s", 0, t2)  # the new holder is unaffected


_FAKE_CLUSTERS: dict = {}


class TestKafkaShardLog(ShardLogContract):
    """The backend contract over the Kafka adapter (VERDICT r5 #4):
    every operation maps to the exact kafka-python call surface against
    the in-memory fake broker — append→produce+ack, end_offset→log-end
    with byte translation, read_range→seek/poll fetch, group offsets→
    consumer-group commit/committed. Swapping the fake for a real
    client is configuration (kafka_python_clients)."""

    def make_backend(self, tmp_path):
        from deathmetal_datalake_spark.streaming.shardlog_kafka import (
            KafkaShardLog,
        )
        from deathmetal_datalake_spark.streaming.kafka_fake import FakeKafkaCluster

        cluster = _FAKE_CLUSTERS.setdefault(str(tmp_path), FakeKafkaCluster())
        return KafkaShardLog(cluster)


def test_producer_sdk_and_group_consumer_over_kafka_adapter(tmp_path):
    # The transport SDK end-to-end on the broker adapter: chunked puts
    # route and sequence exactly as on the FS backend, and a group
    # consumer's progress lands in Kafka's native consumer-group store
    # (record indexes, translated back to byte offsets on read).
    from deathmetal_datalake_spark.streaming.shardlog_kafka import KafkaShardLog
    from deathmetal_datalake_spark.streaming.transport import (
        GroupConsumer,
        RecordStreamTransport,
    )
    from deathmetal_datalake_spark.streaming.kafka_fake import FakeKafkaCluster

    cluster = FakeKafkaCluster()
    backend = KafkaShardLog(cluster)
    t = RecordStreamTransport("kafka://", backend=backend)
    t.create_stream("tx", n_shards=2)
    for i in range(10):
        t.put_record("tx", f"k{i}", {"i": i})
    gc = GroupConsumer(backend, "tx", "g1")
    got = gc.poll()
    assert sorted(r["data"]["i"] for r in got) == list(range(10))
    assert all(r["shard"] == shard_for_key(f"k{r['data']['i']}", 2) for r in got)
    gc.commit()
    # Progress survives a brand-new adapter instance over the same
    # broker (the restart story), and nothing replays.
    backend2 = KafkaShardLog(cluster)
    gc2 = GroupConsumer(backend2, "tx", "g1")
    assert gc2.poll() == []
    # The committed offsets in the broker's group store are RECORD
    # indexes — meaningful to real Kafka tooling.
    raw = {
        (g, t, p): om.offset
        for (g, t, p), om in cluster._group_offsets.items()
    }
    assert all(v <= 10 for v in raw.values()) and sum(raw.values()) == 10
