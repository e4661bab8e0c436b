"""In-memory fake of the ``kafka-python`` client surface, call-exact —
the broker stand-in for environments without a broker (this one), the
Kafka sibling of :class:`transport.InMemoryShardLog`.

The :class:`deathmetal_datalake_spark.streaming.shardlog_kafka.KafkaShardLog`
adapter is written against exactly the names and signatures below —
``KafkaProducer.send(topic, value=, partition=).get()``,
``KafkaConsumer.assign/seek/poll/end_offsets/partitions_for_topic/
commit/committed``, ``KafkaAdminClient.create_topics`` with
``NewTopic`` and ``TopicAlreadyExistsError`` — so swapping this fake
for the real ``kafka`` package is pure configuration (no broker ships
in this environment; reference analog: the Kinesis provisioning in
``infra/main.tf:47-124``).

Broker semantics modeled faithfully where the adapter depends on them:
per-partition logs are append-only and atomic (the broker serializes
producers — why ``exclusive`` maps to a no-op), offsets are dense
record indexes, ``end_offsets`` is the log-end (next-to-write) offset,
consumer-group commits are last-write-wins per (group, topic,
partition).
"""

from __future__ import annotations

import threading
from collections import namedtuple
from typing import Optional

TopicPartition = namedtuple("TopicPartition", ["topic", "partition"])
OffsetAndMetadata = namedtuple("OffsetAndMetadata", ["offset", "metadata"])
ConsumerRecord = namedtuple(
    "ConsumerRecord", ["topic", "partition", "offset", "key", "value"]
)
RecordMetadata = namedtuple("RecordMetadata", ["topic", "partition", "offset"])


class KafkaError(Exception):
    pass


class TopicAlreadyExistsError(KafkaError):
    pass


class NewTopic:
    def __init__(self, name: str, num_partitions: int, replication_factor: int = 1):
        self.name = name
        self.num_partitions = num_partitions
        self.replication_factor = replication_factor


class FakeKafkaCluster:
    """The shared broker state: {topic: [partition logs of (key, value)]}
    plus consumer-group offsets. Thread-safe; every client built from
    one cluster sees the same logs (the multi-instance contract).

    Carries the kafka-python type constructors as attributes — the
    adapter takes them from here (and from the real package via
    ``kafka_python_clients``) so it never imports either module."""

    TopicPartition = TopicPartition
    OffsetAndMetadata = OffsetAndMetadata
    NewTopic = NewTopic

    def __init__(self):
        self._lock = threading.RLock()
        self._topics: dict[str, list[list[tuple[Optional[bytes], bytes]]]] = {}
        self._group_offsets: dict[tuple[str, str, int], OffsetAndMetadata] = {}

    # -- client factories (the adapter's injection points) ------------
    def admin(self) -> "FakeKafkaAdmin":
        return FakeKafkaAdmin(self)

    def producer(self) -> "FakeKafkaProducer":
        return FakeKafkaProducer(self)

    def consumer(self, group_id: Optional[str] = None) -> "FakeKafkaConsumer":
        return FakeKafkaConsumer(self, group_id=group_id)


class FakeKafkaAdmin:
    def __init__(self, cluster: FakeKafkaCluster):
        self._c = cluster

    def create_topics(self, new_topics, validate_only: bool = False):
        with self._c._lock:
            for t in new_topics:
                if t.name in self._c._topics:
                    raise TopicAlreadyExistsError(t.name)
                if not validate_only:
                    self._c._topics[t.name] = [
                        [] for _ in range(t.num_partitions)
                    ]

    def close(self):
        pass


class _FakeFuture:
    def __init__(self, md: RecordMetadata):
        self._md = md

    def get(self, timeout=None) -> RecordMetadata:
        return self._md


class FakeKafkaProducer:
    def __init__(self, cluster: FakeKafkaCluster):
        self._c = cluster

    def send(self, topic, value=None, key=None, partition=None) -> _FakeFuture:
        with self._c._lock:
            parts = self._c._topics.get(topic)
            if parts is None:
                raise KafkaError(f"unknown topic {topic!r}")
            if partition is None:
                partition = 0
            log = parts[partition]
            log.append((key, bytes(value)))
            return _FakeFuture(RecordMetadata(topic, partition, len(log) - 1))

    def flush(self, timeout=None):
        pass

    def close(self):
        pass


class FakeKafkaConsumer:
    def __init__(self, cluster: FakeKafkaCluster, group_id: Optional[str] = None):
        self._c = cluster
        self._group = group_id
        self._assigned: list[TopicPartition] = []
        self._pos: dict[TopicPartition, int] = {}

    def partitions_for_topic(self, topic) -> Optional[set]:
        with self._c._lock:
            parts = self._c._topics.get(topic)
            return None if parts is None else set(range(len(parts)))

    def assign(self, partitions):
        self._assigned = list(partitions)
        for tp in self._assigned:
            self._pos.setdefault(tp, 0)

    def seek(self, tp: TopicPartition, offset: int):
        self._pos[tp] = int(offset)

    def end_offsets(self, partitions) -> dict:
        with self._c._lock:
            out = {}
            for tp in partitions:
                parts = self._c._topics.get(tp.topic)
                if parts is None:
                    raise KafkaError(f"unknown topic {tp.topic!r}")
                out[tp] = len(parts[tp.partition])
            return out

    def poll(self, timeout_ms: int = 0, max_records: Optional[int] = None) -> dict:
        with self._c._lock:
            out: dict[TopicPartition, list[ConsumerRecord]] = {}
            budget = max_records if max_records is not None else 500
            for tp in self._assigned:
                if budget <= 0:
                    break
                log = self._c._topics[tp.topic][tp.partition]
                pos = self._pos.get(tp, 0)
                batch = []
                while pos < len(log) and budget > 0:
                    key, value = log[pos]
                    batch.append(
                        ConsumerRecord(tp.topic, tp.partition, pos, key, value)
                    )
                    pos += 1
                    budget -= 1
                if batch:
                    self._pos[tp] = pos
                    out[tp] = batch
            return out

    def commit(self, offsets: dict):
        if self._group is None:
            raise KafkaError("commit() requires group_id")
        with self._c._lock:
            for tp, om in offsets.items():
                self._c._group_offsets[(self._group, tp.topic, tp.partition)] = om

    def committed(self, tp: TopicPartition):
        if self._group is None:
            raise KafkaError("committed() requires group_id")
        with self._c._lock:
            om = self._c._group_offsets.get((self._group, tp.topic, tp.partition))
            # kafka-python 2.x returns the bare int offset.
            return None if om is None else om.offset

    def close(self):
        pass
