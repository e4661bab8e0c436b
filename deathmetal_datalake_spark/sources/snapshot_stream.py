"""Snapshot table as a STREAMING SOURCE — the Delta Change-Data-Feed /
Iceberg incremental-scan analog (docs/NEXT.md round-3 item #4), built
on PySpark 4's Python Data Source API (`pyspark.sql.datasource`).

``readStream.format("snapshot_feed")`` tails a
:class:`~deathmetal_datalake_spark.sources.snapshots.SnapshotTable`'s
manifest log: each micro-batch delivers exactly the rows APPENDED by
snapshots committed since the last checkpointed offset. Because the
offset is a snapshot id and manifests are immutable, replay after any
failure re-reads the identical file set — the source is exactly-once
end-to-end with a checkpointed sink.

Commit isolation: the feed reads the MANIFEST LOG, never the data
directory listing, so in-flight writes (data staged before the refs
swap, orphans of failed jobs, open transactions of
``sources/transactions.py``) are invisible until their snapshot is
published. A plain file-stream over ``data/*/`` could not promise
that.

Semantics:

- ``path`` (required): the snapshot table root.
- ``branch`` (default ``main``): which ref to tail.
- ``catalog`` + ``table`` (optional, together): the table is bound to
  a :class:`~deathmetal_datalake_spark.sources.transactions.SnapshotCatalog`,
  whose tables keep ALL branch refs in the shared
  ``<catalog>/_catalog/refs.json`` (keyed ``table::branch``) instead
  of a per-table refs file. Pass the catalog root and table name so
  the feed tails the shared ref — this also means a multi-table
  transaction's publish becomes visible to the feed atomically with
  every other table it committed.
- ``anchor`` (default deliver-everything): snapshot id the consumer has
  already seen; the first batch starts AFTER it (same contract as
  ``SnapshotTable.read_appends``).
- ``max_snapshots_per_batch`` (default unlimited): admission control —
  a STEADY-STATE micro-batch advances the offset at most this many
  snapshots, bounding per-batch work while tailing a live producer
  (the ``maxFilesPerTrigger`` analog). The first batch after a
  (re)start is uncapped: Spark probes ``latestOffset()`` before the
  reader can learn the stream's true position (the Python API passes
  no start offset), and emitting a capped offset from a guessed
  position could land BEHIND a restart checkpoint — Spark would then
  run a backward batch and re-deliver data. The cap therefore engages
  only from positions learned via ``partitions``/``commit``. Use with
  a processing-time trigger; ``availableNow`` captures the head once
  at start and would stop at the first capped batch.
- ``change_feed`` (default false): CDC mode — stream row-level change
  EVENTS instead of raw appended rows. Each event carries
  ``_change_type`` ('insert' | 'delete') and ``_commit_snapshot_id``;
  insert events are the appended rows of their snapshot, delete
  events are the deleted KEYS (non-key columns NULL — covered data
  files are never opened, keeping the feed O(delta)). The user schema
  must lead with those two columns (see :func:`cdc_schema`).
- Overwrite/compaction snapshots after the anchor RAISE in both
  modes: that delta is not row-expressible — consumers must re-anchor
  (Delta CDF fails the same way when the log is vacuumed past).

Scale notes: ``latestOffset``/``partitions`` are O(#new snapshots)
driver-side JSON reads; each input partition is ONE parquet file of an
appended directory, so a big append fans out across the cluster, and
executors read with pyarrow straight from shared storage. No listing
of the base table ever happens — cost is O(delta), which is what makes
a 100 TB table tailable.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

_MAIN = "main"


def _load_manifest(meta_dir: str, snapshot_id: int) -> dict:
    with open(os.path.join(meta_dir, f"snap-{snapshot_id}.json")) as f:
        return json.load(f)


def _read_refs(meta_dir: str) -> dict[str, int]:
    path = os.path.join(meta_dir, "refs.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {k: int(v) for k, v in json.load(f).items()}


class _FilePartition(InputPartition):
    """One parquet file to deliver. ``change_type``/``commit_id`` are
    set only in CDC mode; ``key_col`` only for delete partitions (the
    file then holds deleted KEYS, and every other column is NULL)."""

    def __init__(
        self,
        file_path: str,
        change_type: str = "insert",
        commit_id: int = 0,
        key_col: str | None = None,
    ):
        self.file_path = file_path
        self.change_type = change_type
        self.commit_id = commit_id
        self.key_col = key_col


class SnapshotFeedStreamReader(DataSourceStreamReader):
    """Offsets are ``{"snapshot_id": N}``; N=anchor means 'delivered
    through snapshot N'. Micro-batch (start, end] delivers the data
    dirs that append-snapshots in that id range introduced."""

    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("snapshot_feed requires .option('path', <table root>)")
        self._meta_dir = os.path.join(path, "metadata")
        self._branch = options.get("branch", _MAIN)
        # Catalog-bound tables (sources/transactions.py) keep refs in
        # the catalog's shared store keyed "table::branch"; manifests
        # stay per-table, so only ref resolution changes.
        catalog = options.get("catalog")
        table = options.get("table")
        if bool(catalog) != bool(table):
            raise ValueError(
                "snapshot_feed: options 'catalog' and 'table' must be "
                "provided together"
            )
        if catalog:
            self._refs_dir = os.path.join(catalog, "_catalog")
            self._refs_key = f"{table}::{self._branch}"
        else:
            self._refs_dir = self._meta_dir
            self._refs_key = self._branch
        self._anchor = int(options.get("anchor", 0))
        self._max_snaps = int(options.get("max_snapshots_per_batch", 0))  # 0 = off
        # CDC mode: stream row-level change events (insert AND delete)
        # instead of raising on delete snapshots. The user schema must
        # then lead with _change_type (string) and _commit_snapshot_id
        # (long) followed by the table columns.
        self._cdc = str(options.get("change_feed", "false")).lower() == "true"
        self._schema = schema
        # Admission-control bookkeeping: the last offset this reader
        # KNOWS the stream has reached, learned ONLY from planned
        # batches (partitions) and commits — never guessed from the
        # anchor, which after a restart could sit behind the
        # checkpoint and make a capped latestOffset go backward.
        self._known: int | None = None

    # -- offset bookkeeping (driver side) ---------------------------------

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._anchor}

    def latestOffset(self) -> dict:
        head = _read_refs(self._refs_dir).get(self._refs_key)
        if head is None:
            return {"snapshot_id": self._anchor}
        if self._max_snaps and self._known is not None and self._known < head:
            # Cap the batch at K snapshots PAST the known position,
            # walking the real lineage (ids need not be consecutive).
            ids = [m["snapshot_id"] for m in self._lineage(head)]
            newer = [i for i in ids if i > self._known]
            if newer:
                return {"snapshot_id": newer[: self._max_snaps][-1]}
        return {"snapshot_id": head}

    def _lineage(self, head: int) -> list[dict]:
        """Manifests from oldest retained to ``head``."""
        out = []
        sid: int | None = head
        while sid is not None:
            try:
                m = _load_manifest(self._meta_dir, sid)
            except FileNotFoundError:
                break  # retention horizon
            out.append(m)
            sid = m["parent_id"]
        return list(reversed(out))

    def partitions(self, start: dict, end: dict):
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        self._known = max(self._known or 0, hi)  # this batch WILL deliver hi
        if hi <= lo:
            return []
        lineage = self._lineage(hi)
        ids = [m["snapshot_id"] for m in lineage]
        if lo != 0 and lo not in ids:
            raise ValueError(
                f"offset snapshot {lo} is not in branch {self._branch!r}'s "
                "lineage (expired by retention or rolled back); re-anchor "
                "the consumer"
            )
        newer = [m for m in lineage if m["snapshot_id"] > lo]
        if not newer:
            return []
        if self._cdc:
            return self._cdc_partitions(lineage, newer, lo)
        bad = [m["snapshot_id"] for m in newer if m["mode"] != "append"]
        if bad:
            raise ValueError(
                f"snapshots {bad} after offset {lo} are overwrites/deletes; "
                "the change feed is append-only — re-anchor after "
                "compaction/deletes, stream with .option('change_feed', "
                "'true'), or use flows.catalog.snapshot_diff"
            )
        seen: set[str] = set()
        if lo != 0:
            seen.update(_load_manifest(self._meta_dir, lo)["data_dirs"])
        new_dirs = [d for d in newer[-1]["data_dirs"] if d not in seen]
        parts: list[_FilePartition] = []
        for d in new_dirs:
            for name in sorted(os.listdir(d)):
                if name.endswith(".parquet"):
                    parts.append(_FilePartition(os.path.join(d, name)))
        return parts

    def _cdc_partitions(self, lineage: list[dict], newer: list[dict], lo: int):
        """Row-level change events: each snapshot in (lo, hi] yields
        its OWN delta — appended files as inserts, new delete-key files
        as deletes — so events carry the committing snapshot id."""
        parts: list[_FilePartition] = []
        idx0 = lineage.index(newer[0])
        prev: dict | None = lineage[idx0 - 1] if idx0 > 0 else None
        for m in newer:
            sid = m["snapshot_id"]
            if m["mode"] == "overwrite":
                raise ValueError(
                    f"snapshot {sid} after offset {lo} is an overwrite; "
                    "the delta is not row-expressible — re-anchor or use "
                    "flows.catalog.snapshot_diff"
                )
            prev_dirs = set(prev["data_dirs"]) if prev else set()
            prev_dels = {
                e["dir"] for e in (prev.get("deletes", []) if prev else [])
            }
            if m["mode"] == "append":
                for d in m["data_dirs"]:
                    if d in prev_dirs:
                        continue
                    for name in sorted(os.listdir(d)):
                        if name.endswith(".parquet"):
                            parts.append(
                                _FilePartition(
                                    os.path.join(d, name), "insert", sid
                                )
                            )
            elif m["mode"] == "delete":
                for e in m.get("deletes", []):
                    if e["dir"] in prev_dels:
                        continue
                    for name in sorted(os.listdir(e["dir"])):
                        if name.endswith(".parquet"):
                            parts.append(
                                _FilePartition(
                                    os.path.join(e["dir"], name),
                                    "delete",
                                    sid,
                                    e["key"],
                                )
                            )
            prev = m
        return parts

    # -- data plane (executor side) ---------------------------------------

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        names = [f.name for f in self._schema.fields]
        if not self._cdc:
            table = pq.read_table(partition.file_path, columns=names)
            yield from table.to_batches()
            return
        # CDC: synthesize the event envelope around the file's columns.
        # Delete partitions read a KEY file — every non-key column is a
        # typed NULL array (the O(delta) contract: covered data files
        # are never opened).
        from pyspark.sql.pandas.types import to_arrow_type

        raw = pq.read_table(partition.file_path)
        n = raw.num_rows
        cols = []
        for f in self._schema.fields:
            at = to_arrow_type(f.dataType)
            if f.name == "_change_type":
                cols.append(pa.array([partition.change_type] * n, type=at))
            elif f.name == "_commit_snapshot_id":
                cols.append(pa.array([partition.commit_id] * n, type=at))
            elif f.name in raw.column_names and (
                partition.key_col is None or f.name == partition.key_col
            ):
                cols.append(raw.column(f.name).combine_chunks().cast(at))
            else:
                cols.append(pa.nulls(n, type=at))
        yield from pa.Table.from_arrays(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        # Progress lives in the sink checkpoint; tracking it here only
        # feeds the admission-control cap.
        self._known = max(self._known or 0, end["snapshot_id"])


class SnapshotFeedDataSource(DataSource):
    """``spark.dataSource.register(SnapshotFeedDataSource)`` then
    ``spark.readStream.format("snapshot_feed").schema(s)
    .option("path", root).load()``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_feed"

    def schema(self):
        # Schema inference would need a manifest read at plan time; the
        # table contract is explicit schemas (schemas.py), so require
        # one rather than guess.
        raise NotImplementedError(
            "snapshot_feed requires an explicit .schema(...) — the table "
            "contract (deathmetal_datalake_spark.schemas) is the source of truth"
        )

    def streamReader(self, schema: StructType) -> SnapshotFeedStreamReader:
        return SnapshotFeedStreamReader(schema, dict(self.options))


def register_snapshot_feed(spark) -> None:
    """Idempotent registration of the data source with a session."""
    spark.dataSource.register(SnapshotFeedDataSource)


def cdc_schema(table_schema: StructType) -> StructType:
    """The schema a ``change_feed='true'`` stream must declare: the
    event envelope (_change_type, _commit_snapshot_id) followed by the
    table's columns."""
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("_change_type", StringType()),
            StructField("_commit_snapshot_id", LongType()),
            # Delete events NULL every non-key column, so the table
            # fields must be nullable regardless of how they were
            # declared at write time.
            *[
                StructField(f.name, f.dataType, nullable=True)
                for f in table_schema.fields
            ],
        ]
    )
