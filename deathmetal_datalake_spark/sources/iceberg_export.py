"""One-way Iceberg-style metadata export for :class:`SnapshotTable`.

The native table format covers Iceberg's semantics (snapshots, branches,
tags, time travel, hidden partitioning, delete vectors, manifest stats)
but its on-disk JSON manifests are not Iceberg-compatible, so external
engines (the reference's Trino role — ``cluster/trino-catalogs/
nessie.properties``; ``flows_iceberg/bronze_iceberg.py:15-19,40-44``)
cannot mount the lake. ``export_iceberg_metadata`` writes an
Iceberg-v2-SHAPED metadata tree for a branch's lineage under
``<table>/metadata/``:

- ``v<N>.metadata.json`` — format-version 2 layout: table-uuid
  (deterministic uuid5 of the table path), schemas with assigned
  field-ids (preorder, the Iceberg fresh-table assignment), the
  partition spec with field-ids from 1000 (the Iceberg convention) and
  the same transform vocabulary (identity/bucket[n]/year/month/day),
  snapshots with sequence numbers + manifest-list pointers,
  snapshot-log, and refs (branches AND tags, typed).
- ``snap-<id>.manifest-list.json`` — one per snapshot, referencing the
  shared per-data-dir manifests (manifest reuse, as Iceberg does:
  an append's new snapshot re-lists prior manifests, it does not
  rewrite them).
- ``manifest-<hash>.json`` — one per data dir, carrying data-file
  entries: file path/format/size, record counts from the harvested
  footer stats, the dir's hidden-partition values, and per-field
  lower/upper bounds keyed by field-id. Delete commits export as
  content=2 (equality-delete) manifests with ``equality_ids``.

DOCUMENTED DEVIATIONS (each marked in the emitted JSON):

- Files are JSON, not Avro — this environment ships no Avro writer.
  The logical content matches field-for-field; a production deployment
  swaps the serializer (``"file-codec": "json"`` marks every file).
- Bounds are plain JSON values (``"bounds-encoding": "json"``), not
  Iceberg's binary single-value serialization, for the same reason.

The export is read-only over the native manifests: it never moves a
ref or touches data files, so it can run against a live table
(concurrent commits simply aren't in the exported lineage).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from typing import Optional

_ICEBERG_NS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # uuid5 DNS ns


# ---------------------------------------------------------------------------
# Arrow schema -> Iceberg schema (field-ids assigned preorder)
# ---------------------------------------------------------------------------


def _arrow_to_iceberg_type(t, next_id) -> object:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        element_id = next_id()
        return {
            "type": "list",
            "element-id": element_id,
            "element": _arrow_to_iceberg_type(t.value_type, next_id),
            "element-required": False,
        }
    if pa.types.is_struct(t):
        fields = []
        for f in t:
            fid = next_id()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _arrow_to_iceberg_type(f.type, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"cannot map arrow type {t} to an Iceberg type")


def _schema_from_parquet(
    path: str, preassigned: Optional[dict[str, int]] = None
) -> tuple[dict, dict[str, int], int]:
    """(iceberg schema dict, top-level name->field-id, last-column-id).

    ``preassigned`` — the table's column registry (rename/drop schema
    evolution): its permanent field ids take precedence for top-level
    columns, and fresh ids (nested element/struct fields, unregistered
    columns) are minted ABOVE its last id so the two series never
    collide."""
    import pyarrow.parquet as pq

    arrow = pq.read_schema(path)
    counter = {"v": max(preassigned.values(), default=0) if preassigned else 0}

    def next_id() -> int:
        counter["v"] += 1
        return counter["v"]

    fields, name_to_id = [], {}
    for f in arrow:
        fid = (preassigned or {}).get(f.name) or next_id()
        name_to_id[f.name] = fid
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _arrow_to_iceberg_type(f.type, next_id),
            }
        )
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    return schema, name_to_id, counter["v"]


def _first_parquet(d: str) -> Optional[str]:
    try:
        names = sorted(os.listdir(d))
    except FileNotFoundError:
        return None
    for n in names:
        if n.endswith(".parquet"):
            return os.path.join(d, n)
    return None


# ---------------------------------------------------------------------------
# Manifests
# ---------------------------------------------------------------------------


def _dir_manifest_name(d: str) -> str:
    return f"manifest-{hashlib.md5(d.encode()).hexdigest()[:16]}.json"


def _bounds_for(stats: dict, name_to_id: dict[str, int]) -> tuple[dict, dict, dict]:
    lower, upper, nulls = {}, {}, {}
    for col, ent in (stats or {}).items():
        fid = name_to_id.get(col)
        if fid is None or not isinstance(ent, dict):
            continue
        if ent.get("min") is not None:
            lower[str(fid)] = ent["min"]
        if ent.get("max") is not None:
            upper[str(fid)] = ent["max"]
        if ent.get("nulls") is not None:
            nulls[str(fid)] = ent["nulls"]
    return lower, upper, nulls


def _write_json(path: str, payload: dict) -> int:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return os.path.getsize(path)


def export_iceberg_metadata(table, branch: str = "main") -> str:
    """Write the Iceberg-shaped metadata tree for ``branch``'s lineage;
    returns the path of the new ``v<N>.metadata.json``."""
    head_id = table.current_snapshot_id(branch)
    if head_id is None:
        raise ValueError(f"branch {branch!r} has no snapshots to export")
    lineage = table.history(branch)  # oldest -> newest
    head = lineage[-1]

    meta_dir = os.path.join(table.base_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    # Schema from the head snapshot's newest data dir (schema evolution
    # is add-column; the newest dir carries the widest schema).
    sample = None
    for d in reversed(head.data_dirs):
        sample = _first_parquet(d)
        if sample:
            break
    if sample is None:
        raise ValueError("no parquet files in the head snapshot")
    registry = (
        table._read_column_registry()
        if hasattr(table, "_read_column_registry")
        else None
    )
    preassigned = (
        {c["name"]: c["id"] for c in registry["epochs"][-1]["columns"]}
        if registry
        else None
    )
    schema, name_to_id, last_column_id = _schema_from_parquet(sample, preassigned)

    # Partition spec (field-ids from 1000, Iceberg's convention).
    spec_fields = []
    for i, ent in enumerate(table.partition_spec()):
        spec_fields.append(
            {
                "field-id": 1000 + i,
                "name": ent["name"],
                "transform": ent["transform"],
                "source-id": name_to_id.get(ent["source"], -1),
            }
        )
    last_partition_id = 1000 + len(spec_fields) - 1 if spec_fields else 999

    seq_of = {s.snapshot_id: i + 1 for i, s in enumerate(lineage)}
    # Which snapshot first ADDED each dir (for manifest added_snapshot_id
    # and entry status): walk the lineage oldest-first.
    added_by: dict[str, int] = {}
    for s in lineage:
        for d in s.data_dirs:
            added_by.setdefault(d, s.snapshot_id)

    # Shared per-dir data manifests.
    manifest_meta: dict[str, dict] = {}  # dir -> {"path", "length", ...}
    for s in lineage:
        for d in s.data_dirs:
            if d in manifest_meta:
                continue
            adder = added_by[d]
            entries = []
            fstats = s.file_stats.get(d, {}) if isinstance(s.file_stats, dict) else {}
            dstats = s.dir_stats.get(d, {}) if isinstance(s.dir_stats, dict) else {}
            files = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            ) if os.path.isdir(d) else []
            for rel in files:
                fpath = os.path.join(d, rel)
                st = fstats.get(rel, {})
                lower, upper, nulls = _bounds_for(st or dstats, name_to_id)
                rows = None
                for ent in (st or dstats).values():
                    if isinstance(ent, dict) and ent.get("rows") is not None:
                        rows = ent["rows"]
                        break
                entries.append(
                    {
                        "status": 1,  # ADDED (in the adding snapshot)
                        "snapshot_id": adder,
                        "sequence_number": seq_of[adder],
                        "data_file": {
                            "content": 0,
                            "file_path": fpath,
                            "file_format": "PARQUET",
                            "partition": dict(
                                (s.dir_partitions or {}).get(d, {})
                            ),
                            "record_count": rows,
                            "file_size_in_bytes": os.path.getsize(fpath)
                            if os.path.exists(fpath)
                            else None,
                            "lower_bounds": lower,
                            "upper_bounds": upper,
                            "null_value_counts": nulls,
                            "bounds-encoding": "json",
                        },
                    }
                )
            mpath = os.path.join(meta_dir, _dir_manifest_name(d))
            length = _write_json(
                mpath,
                {
                    "file-codec": "json",
                    "content": "data",
                    "added-snapshot-id": adder,
                    "sequence-number": seq_of[adder],
                    "entries": entries,
                },
            )
            manifest_meta[d] = {
                "path": mpath,
                "length": length,
                "adder": adder,
                "n_files": len(entries),
                "n_rows": sum(e["data_file"]["record_count"] or 0 for e in entries),
            }

    # Equality-delete manifests (content=2), one per delete commit entry.
    delete_manifests: dict[tuple, dict] = {}
    for s in lineage:
        for ddir, key, covers in s.deletes:
            k = (ddir, key)
            if k in delete_manifests:
                continue
            files = sorted(
                f for f in os.listdir(ddir) if f.endswith(".parquet")
            ) if os.path.isdir(ddir) else []
            entries = [
                {
                    "status": 1,
                    "snapshot_id": s.snapshot_id,
                    "sequence_number": seq_of[s.snapshot_id],
                    "data_file": {
                        "content": 2,  # EQUALITY_DELETES
                        "file_path": os.path.join(ddir, rel),
                        "file_format": "PARQUET",
                        "partition": {},
                        "equality_ids": [name_to_id.get(key, -1)],
                        "record_count": None,
                        "file_size_in_bytes": os.path.getsize(
                            os.path.join(ddir, rel)
                        ),
                        "bounds-encoding": "json",
                    },
                }
                for rel in files
            ]
            mpath = os.path.join(
                meta_dir, f"delete-{hashlib.md5(ddir.encode()).hexdigest()[:16]}.json"
            )
            length = _write_json(
                mpath,
                {
                    "file-codec": "json",
                    "content": "deletes",
                    "added-snapshot-id": s.snapshot_id,
                    "sequence-number": seq_of[s.snapshot_id],
                    "equality-key": key,
                    "covers": list(covers),
                    "entries": entries,
                },
            )
            delete_manifests[k] = {
                "path": mpath,
                "length": length,
                "adder": s.snapshot_id,
            }

    # Manifest lists, one per snapshot.
    snap_entries = []
    for s in lineage:
        manifests = []
        for d in s.data_dirs:
            mm = manifest_meta[d]
            manifests.append(
                {
                    "manifest_path": mm["path"],
                    "manifest_length": mm["length"],
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq_of[mm["adder"]],
                    "min_sequence_number": seq_of[mm["adder"]],
                    "added_snapshot_id": mm["adder"],
                    "added_files_count": mm["n_files"]
                    if mm["adder"] == s.snapshot_id
                    else 0,
                    "existing_files_count": 0
                    if mm["adder"] == s.snapshot_id
                    else mm["n_files"],
                    "added_rows_count": mm["n_rows"]
                    if mm["adder"] == s.snapshot_id
                    else 0,
                }
            )
        for (ddir, key), dm in delete_manifests.items():
            if any(ddir == x[0] for x in s.deletes):
                manifests.append(
                    {
                        "manifest_path": dm["path"],
                        "manifest_length": dm["length"],
                        "partition_spec_id": 0,
                        "content": 1,  # deletes
                        "sequence_number": seq_of[dm["adder"]],
                        "min_sequence_number": seq_of[dm["adder"]],
                        "added_snapshot_id": dm["adder"],
                    }
                )
        ml_path = os.path.join(meta_dir, f"snap-{s.snapshot_id}.manifest-list.json")
        _write_json(
            ml_path,
            {"file-codec": "json", "manifests": manifests},
        )
        snap_entries.append(
            {
                "snapshot-id": s.snapshot_id,
                "parent-snapshot-id": s.parent_id,
                "sequence-number": seq_of[s.snapshot_id],
                "timestamp-ms": int(s.committed_at * 1000),
                "manifest-list": ml_path,
                "schema-id": 0,
                "summary": {
                    "operation": {
                        "overwrite": "overwrite",
                        "append": "append",
                        "delete": "delete",
                    }.get(s.mode, s.mode),
                },
            }
        )

    refs = {
        name: {"snapshot-id": sid, "type": "branch"}
        for name, sid in table.branches().items()
    }
    for name, sid in table.tags().items():
        refs[name] = {"snapshot-id": sid, "type": "tag"}

    # Version: one past any existing vN.metadata.json (re-export safe).
    existing = [
        int(n[1:].split(".")[0])
        for n in os.listdir(meta_dir)
        if n.startswith("v") and n.endswith(".metadata.json")
        and n[1:].split(".")[0].isdigit()
    ]
    version = max(existing, default=0) + 1

    metadata = {
        "format-version": 2,
        "file-codec": "json",
        "table-uuid": str(uuid.uuid5(_ICEBERG_NS, os.path.abspath(table.base_path))),
        "location": os.path.abspath(table.base_path),
        "last-sequence-number": seq_of[head.snapshot_id],
        "last-updated-ms": int(head.committed_at * 1000),
        "last-column-id": last_column_id,
        "schemas": [schema],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": last_partition_id,
        "sort-orders": [
            {
                "order-id": 0,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": name_to_id.get(c, -1),
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                    for c in (
                        table.sort_order() if hasattr(table, "sort_order") else []
                    )
                ],
            }
        ],
        "default-sort-order-id": 0,
        "snapshots": snap_entries,
        "current-snapshot-id": head.snapshot_id,
        "refs": refs,
        "snapshot-log": [
            {"snapshot-id": e["snapshot-id"], "timestamp-ms": e["timestamp-ms"]}
            for e in snap_entries
        ],
        "metadata-log": [],
    }
    out = os.path.join(meta_dir, f"v{version}.metadata.json")
    _write_json(out, metadata)
    return out
