"""Kafka adapter for :class:`ShardLogBackend` — the protocol's fourth
implementation (FS, in-memory, remote-HTTP, and now broker-shaped).

The reference provisions a managed broker for exactly this role
(`/root/reference/infra/main.tf:47-124`, Kinesis stream + Firehose);
the Spark-side analog is Kafka, and this adapter is the interface-level
mapping the round-5 review prescribed:

    append       -> KafkaProducer.send(topic, value, partition).get()
    end_offset   -> KafkaConsumer.end_offsets([TopicPartition])
    read_range   -> assign/seek/poll fetch by offset
    exclusive    -> no-op critical section (the broker serializes
                    appends per partition; per-writer order comes from
                    synchronous acks)
    group ofs    -> consumer-group commit/committed (__consumer_offsets)

OFFSET TRANSLATION: the ShardLog contract hands out BYTE offsets
(``GroupConsumer`` does byte arithmetic on them: caps, boundary
floors), while Kafka's are dense record indexes. The adapter keeps a
per-(topic, partition) monotone boundary index ``B`` (``B[k]`` = byte
offset after record ``k``), built incrementally by consuming only
records it has not yet indexed — O(new records) per refresh, never a
rescan, sound because partitions are append-only and immutable below
the log end. Byte ranges map to record ranges by bisect; group commits
store the RECORD index in Kafka's native offset store (so real Kafka
tooling — lag monitors, ``kafka-consumer-groups`` — sees meaningful
values) and translate back to bytes on read.

NO BROKER SHIPS IN THIS ENVIRONMENT: construct with any object
exposing ``.admin()``, ``.producer()``, ``.consumer(group_id=)``
returning clients with the exact ``kafka-python`` call surface —
``streaming/kafka_fake.py`` provides the contract-suite fake, and
:func:`kafka_python_clients` builds the same trio from the real
``kafka`` package when it is installed (pure configuration swap).
"""

from __future__ import annotations

import bisect
import contextlib
import threading
from typing import Optional

from deathmetal_datalake_spark.streaming.transport import (
    ShardAppender,
    ShardLogBackend,
)


def kafka_python_clients(bootstrap_servers: str):
    """Client trio over the real ``kafka-python`` package (import-try:
    this environment ships no broker, so the fake is the tested path).
    Returns an object with the same ``.admin()/.producer()/.consumer()``
    factories the fake cluster exposes."""
    try:
        from kafka import KafkaAdminClient, KafkaConsumer, KafkaProducer
    except ImportError as exc:  # pragma: no cover - environment-bound
        raise ImportError(
            "kafka-python is not installed; pass a client factory with "
            "the same call surface (see streaming/kafka_fake.py)"
        ) from exc

    from kafka import TopicPartition
    from kafka.admin import NewTopic
    from kafka.structs import OffsetAndMetadata

    class _Real:  # pragma: no cover - needs a live broker
        TopicPartition = TopicPartition
        NewTopic = NewTopic
        OffsetAndMetadata = OffsetAndMetadata

        def admin(self):
            return KafkaAdminClient(bootstrap_servers=bootstrap_servers)

        def producer(self):
            return KafkaProducer(bootstrap_servers=bootstrap_servers)

        def consumer(self, group_id: Optional[str] = None):
            return KafkaConsumer(
                bootstrap_servers=bootstrap_servers,
                group_id=group_id,
                enable_auto_commit=False,
            )

    return _Real()


class _KafkaAppender(ShardAppender):
    def __init__(self, backend: "KafkaShardLog", topic: str, shard: int):
        self._b = backend
        self._topic = topic
        self._shard = shard

    def size(self) -> int:
        return self._b._end_offset_bytes(self._topic, self._shard)

    def append(self, record: bytes) -> int:
        md = (
            self._b._producer.send(
                self._topic, value=record, partition=self._shard
            ).get(timeout=30)
        )
        self._b._producer.flush()
        # Index through the acked record: its offset is authoritative,
        # so the returned end covers everything up to and including it.
        self._b._advance(self._topic, self._shard, to_records=md.offset + 1)
        return self._b._bounds(self._topic, self._shard)[-1]

    def last_record(self) -> Optional[bytes]:
        tp = self._b._tp(self._topic, self._shard)
        end = self._b._consumer.end_offsets([tp])[tp]
        if end == 0:
            return None
        recs = self._b._fetch(self._topic, self._shard, end - 1, end)
        return recs[-1]


class KafkaShardLog(ShardLogBackend):
    """``ShardLogBackend`` over a Kafka-shaped broker. ``clients`` is
    the factory trio (fake cluster or :func:`kafka_python_clients`);
    instances sharing one broker see one log, as with the other
    backends. stream -> topic ``<prefix><stream>``, shard -> partition."""

    def __init__(self, clients, topic_prefix: str = "dml-"):
        self._clients = clients
        self._prefix = topic_prefix
        self._admin = clients.admin()
        self._producer = clients.producer()
        self._consumer = clients.consumer()
        # The clients object carries its own type constructors (the
        # kafka-python names); the adapter never imports the package.
        self._tp = clients.TopicPartition
        self._om = clients.OffsetAndMetadata
        self._new_topic_cls = clients.NewTopic
        self._lock = threading.RLock()
        # (topic, partition) -> byte boundaries B: B[0]=0, B[k]=end byte
        # of record k-1; len(B)-1 records indexed so far.
        self._index: dict[tuple[str, int], list[int]] = {}
        self._group_consumers: dict[str, object] = {}

    # -- helpers -------------------------------------------------------

    def _topic(self, stream: str) -> str:
        return f"{self._prefix}{stream}"

    def _bounds(self, topic: str, shard: int) -> list[int]:
        return self._index.setdefault((topic, shard), [0])

    def _fetch(self, topic: str, shard: int, start_rec: int, end_rec: int) -> list[bytes]:
        """Record values [start_rec, end_rec) via assign/seek/poll."""
        tp = self._tp(topic, shard)
        self._consumer.assign([tp])
        self._consumer.seek(tp, start_rec)
        out: list[bytes] = []
        while len(out) < end_rec - start_rec:
            batch = self._consumer.poll(
                timeout_ms=1000, max_records=end_rec - start_rec - len(out)
            )
            recs = batch.get(tp, [])
            if not recs:
                raise RuntimeError(
                    f"broker returned no records for "
                    f"{topic}/{shard}[{start_rec}:{end_rec}) at {len(out)}"
                )
            out.extend(r.value for r in recs)
        return out

    def _advance(
        self,
        topic: str,
        shard: int,
        to_records: Optional[int] = None,
    ) -> list[int]:
        """Extend the byte-boundary index through ``to_records`` (or the
        broker log end); O(records not yet indexed)."""
        with self._lock:
            b = self._bounds(topic, shard)
            tp = self._tp(topic, shard)
            target = to_records
            if target is None:
                target = self._consumer.end_offsets([tp])[tp]
            have = len(b) - 1
            if target > have:
                for v in self._fetch(topic, shard, have, target):
                    b.append(b[-1] + len(v))
            return b

    def _end_offset_bytes(self, topic: str, shard: int) -> int:
        return self._advance(topic, shard)[-1]

    # -- ShardLogBackend -----------------------------------------------

    def ensure_stream(self, stream: str, n_shards: int) -> str:
        topic = self._topic(stream)
        try:
            self._admin.create_topics(
                [self._new_topic_cls(topic, num_partitions=n_shards,
                                     replication_factor=1)]
            )
        except Exception as exc:
            if type(exc).__name__ != "TopicAlreadyExistsError":
                raise
            have = self._consumer.partitions_for_topic(topic)
            if have is not None and len(have) != n_shards:
                raise ValueError(
                    f"stream {stream!r} exists with {len(have)} shards; "
                    f"resharding to {n_shards} is refused"
                )
        return f"kafka://{topic}"

    def n_shards(self, stream: str) -> int:
        parts = self._consumer.partitions_for_topic(self._topic(stream))
        if parts is None:
            raise ValueError(f"unknown stream {stream!r}")
        return len(parts)

    def end_offset(self, stream: str, shard: int) -> int:
        return self._end_offset_bytes(self._topic(stream), shard)

    def read_range(self, stream: str, shard: int, start: int, end: int) -> bytes:
        if end <= start:
            return b""
        topic = self._topic(stream)
        with self._lock:
            b = self._advance(topic, shard)
            while b[-1] < end:  # a racing append we have not indexed yet
                prev = b[-1]
                b = self._advance(topic, shard)
                if b[-1] == prev:
                    raise ValueError(
                        f"read_range past log end: {end} > {b[-1]}"
                    )
            # Record j spans bytes [B[j], B[j+1]); fetch the covering
            # record run, then slice to the exact byte range (the
            # contract permits mid-record starts/ends — GroupConsumer's
            # byte cap plans them before flooring).
            first = bisect.bisect_right(b, start) - 1
            last = bisect.bisect_left(b, end)
            blob = b"".join(self._fetch(topic, shard, first, last))
            lo = start - b[first]
            return blob[lo : lo + (end - start)]

    @contextlib.contextmanager
    def exclusive(self, stream: str, shard: int):
        # The broker serializes appends per partition (append atomicity
        # and non-interleaving are its log guarantees); per-producer
        # order comes from the synchronous ack in append(). The local
        # lock only keeps THIS instance's size/append sequences
        # self-consistent.
        with self._lock:
            yield _KafkaAppender(self, self._topic(stream), shard)

    # -- consumer-group offsets ---------------------------------------

    def _group_consumer(self, group: str):
        c = self._group_consumers.get(group)
        if c is None:
            c = self._clients.consumer(group_id=group)
            self._group_consumers[group] = c
        return c

    def _byte_to_record(self, topic: str, shard: int, byte_off: int) -> int:
        b = self._advance(topic, shard)
        i = bisect.bisect_left(b, byte_off)
        if i == len(b) or b[i] != byte_off:
            raise ValueError(
                f"offset {byte_off} is not a record boundary of "
                f"{topic}/{shard}"
            )
        return i

    def committed_offsets(self, stream: str, group: str) -> dict[int, int]:
        topic = self._topic(stream)
        gc = self._group_consumer(group)
        out: dict[int, int] = {}
        for shard in range(self.n_shards(stream)):
            idx = gc.committed(self._tp(topic, shard))
            if idx is None:
                continue
            b = self._advance(topic, shard, to_records=idx)
            out[shard] = b[idx]
        return out

    def commit_offsets(self, stream: str, group: str, offsets: dict[int, int]) -> None:
        topic = self._topic(stream)
        n = self.n_shards(stream)
        translated = {}
        for shard, byte_off in offsets.items():
            if not 0 <= int(shard) < n:
                raise ValueError(f"shard {shard} out of range (n={n})")
            if byte_off < 0:
                raise ValueError(f"negative offset {byte_off}")
            end = self.end_offset(stream, int(shard))
            if byte_off > end:
                raise ValueError(
                    f"offset {byte_off} beyond log end {end} for shard {shard}"
                )
            idx = self._byte_to_record(topic, int(shard), int(byte_off))
            translated[self._tp(topic, int(shard))] = self._om(idx, "")
        self._group_consumer(group).commit(translated)
