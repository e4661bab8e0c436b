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

SERIALIZATION: ``codec="json"`` (default) writes every file as JSON —
hermetically inspectable, marked ``"file-codec": "json"`` (bounds stay
JSON values there, a documented deviation of the inspection format).
``codec="avro"`` writes manifest lists and manifests as REAL Avro
object container files through the JVM's org.apache.avro (the
avro-1.12 jar Spark ships, reached via py4j — no Python Avro package
needed) with the ICEBERG-SPEC schemas: spec field names and field-ids
(manifest_entry 0/1/3/4/2; data_file 134/100/101/102/103/104/110/125/
128/135; manifest_file 500-517), the key/value-record array encoding
for non-string-key maps, the typed r102 partition struct with 1000+
ids, and BINARY single-value bounds per spec Appendix D. The only
Avro-codec deviations are spec-cited optional-field omissions (see
the serialization section comment) — readers fill defaults via
standard Avro schema resolution. metadata.json itself stays JSON, as
in Iceberg proper.

The export is read-only over the native manifests: it never moves a
ref or touches data files, so it can run against a live table
(concurrent commits simply aren't in the exported lineage).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import re
import struct
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


_SIMPLE_TO_ICEBERG = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
}


def _declared_to_iceberg_type(s: str) -> Optional[str]:
    """Registry-declared simple type (widen_column vocabulary) to the
    Iceberg type string; None when unknown."""
    import re as _re

    if s in _SIMPLE_TO_ICEBERG:
        return _SIMPLE_TO_ICEBERG[s]
    m = _re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)}, {m.group(2)})"
    return None


def _physical_name(epochs: list[dict], epoch_idx: int, fid: int) -> Optional[str]:
    """The name field ``fid`` had at registry epoch ``epoch_idx`` (what
    a dir stamped with that epoch physically stores), or None when the
    field did not exist yet at that epoch."""
    if not 0 <= epoch_idx < len(epochs):
        epoch_idx = min(max(epoch_idx, 0), len(epochs) - 1)
    for c in epochs[epoch_idx]["columns"]:
        if c["id"] == fid:
            return c["name"]
    return None


def _schema_from_registry(head, registry) -> tuple[dict, dict[str, int], int]:
    """(iceberg schema dict, top-level logical name->field-id,
    last-column-id) built from the registry's CURRENT epoch — permanent
    ids + logical names. A rename/drop with no subsequent data write is
    pure metadata, so the head's newest footer still carries the OLD
    physical names; sampling it (the pre-round-6 behavior) exported a
    stale name under a fresh id, omitted the current logical name, and
    resurfaced dropped columns. Types resolve per column: the declared
    registry type (widen_column) wins; otherwise the newest dir whose
    write-epoch mapping contains the field id supplies its physical
    arrow field."""
    import pyarrow.parquet as pq

    epochs = registry["epochs"]
    current = epochs[-1]["columns"]
    dir_schemas = []  # newest first: (epoch_idx, arrow schema)
    for d in reversed(head.data_dirs):
        f0 = _first_parquet(d)
        if f0:
            dir_schemas.append(
                (int(head.dir_epochs.get(d, 0)), pq.read_schema(f0))
            )
    counter = {
        "v": int(
            registry.get("last_field_id")
            or max((c["id"] for c in current), default=0)
        )
    }

    def next_id() -> int:
        counter["v"] += 1
        return counter["v"]

    fields, name_to_id = [], {}
    for c in current:
        fid, name = int(c["id"]), c["name"]
        name_to_id[name] = fid
        itype, required = None, False
        declared = c.get("type")
        if declared:
            itype = _declared_to_iceberg_type(declared)
        if itype is None:
            for epoch_idx, sch in dir_schemas:
                phys = _physical_name(epochs, epoch_idx, fid)
                if phys is None:
                    continue
                i = sch.get_field_index(phys)
                if i >= 0:
                    f = sch.field(i)
                    itype = _arrow_to_iceberg_type(f.type, next_id)
                    required = not f.nullable
                    break
        if itype is None:
            raise ValueError(
                f"column {name!r} (field id {fid}) has no declared type and "
                "no data dir materializes it; cannot export its schema"
            )
        fields.append(
            {"id": fid, "name": name, "required": required, "type": itype}
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


def _json_default(o):
    if isinstance(o, (bytes, bytearray)):
        import base64

        return {"b64": base64.b64encode(bytes(o)).decode()}
    raise TypeError(f"not JSON-serializable: {type(o)}")


def _write_json(path: str, payload: dict) -> int:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True, default=_json_default)
    os.replace(tmp, path)
    return os.path.getsize(path)




# ---------------------------------------------------------------------------
# Avro serialization (opt-in codec="avro"): real Apache Avro object
# container files written through the JVM's org.apache.avro (the
# avro-1.12 jar Spark ships), reached via py4j — no Python Avro
# package needed. metadata.json stays JSON (it IS JSON in Iceberg).
#
# SPEC-EXACT (round 6): field names, Iceberg "field-id" props, the
# key/value-record array encoding for non-string-key maps
# (logicalType "map", the spec's Avro representation of
# map<int, binary>), the r102 typed partition struct with the 1000+
# partition field ids, file_sequence_number, the full v2
# manifest_file field set (ids 500-517), and BINARY single-value
# bounds per the spec's Appendix D serialization (little-endian
# ints/longs/floats/doubles, UTF-8 strings, date as days-from-epoch
# int, timestamp as micros-from-epoch long, decimal as minimal
# big-endian two's-complement unscaled value). Remaining deviations,
# spec-cited: OPTIONAL data_file fields we have no source for are
# omitted from the writer schema (column_sizes 108, value_counts 109,
# nan_value_counts 137, key_metadata 131, split_offsets 132,
# sort_order_id 140 — manifest_file key_metadata 519) — Avro schema
# resolution fills reader defaults
# for writer-absent optional fields, the evolution rule Iceberg
# itself relies on.
# ---------------------------------------------------------------------------


def _kv_map(record_name: str, key_id: int, value_type, value_id: int) -> dict:
    """Iceberg's Avro encoding of a non-string-key map: an array of
    key/value records with logicalType "map" (spec: Avro schemas for
    map<int, ...>)."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": record_name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }


def _data_file_fields(partition_fields: list[dict]) -> list[dict]:
    return [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": partition_fields},
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {
            "name": "null_value_counts",
            "type": _kv_map("k121_v122", 121, "long", 122),
            "field-id": 110,
        },
        {
            "name": "lower_bounds",
            "type": _kv_map("k126_v127", 126, "bytes", 127),
            "field-id": 125,
        },
        {
            "name": "upper_bounds",
            "type": _kv_map("k129_v130", 129, "bytes", 130),
            "field-id": 128,
        },
    ]


# Two content-specific entry schemas (as Iceberg manifests are per
# content kind): delete entries carry a REQUIRED equality_ids array.
# Top-level scalar fields avoid unions — py4j auto-unboxes
# java.lang.Long back to Python ints, and Avro's union resolution is
# strict by class while plain numeric fields accept any Number.
# (Iceberg's optional long fields accept a writer-required long via
# standard schema resolution, so required-with-value stays mountable.)
# The one union is the nullable partition value, where null is a real
# state (__HIVE_DEFAULT_PARTITION__) and class-based resolution is
# unambiguous.


def _entry_schema(partition_fields: list[dict], with_equality: bool) -> str:
    fields = _data_file_fields(partition_fields)
    if with_equality:
        fields = fields + [
            {
                "name": "equality_ids",
                "type": {"type": "array", "items": "int", "element-id": 136},
                "field-id": 135,
            }
        ]
    return json.dumps(
        {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {"name": "snapshot_id", "type": "long", "field-id": 1},
                {"name": "sequence_number", "type": "long", "field-id": 3},
                {"name": "file_sequence_number", "type": "long", "field-id": 4},
                {
                    "name": "data_file",
                    "type": {"type": "record", "name": "r2", "fields": fields},
                    "field-id": 2,
                },
            ],
        }
    )


_AVRO_MANIFEST_FILE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
            {
                # Per-partition-field summaries (spec field_summary):
                # lets an external planner prune manifests without
                # opening them. One manifest = one partition-value dir
                # here, so lower == upper == that dir's value.
                "name": "partitions",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "element-id": 508,
                        "items": {
                            "type": "record",
                            "name": "r508",
                            "fields": [
                                {
                                    "name": "contains_null",
                                    "type": "boolean",
                                    "field-id": 509,
                                },
                                {
                                    "name": "contains_nan",
                                    "type": ["null", "boolean"],
                                    "default": None,
                                    "field-id": 518,
                                },
                                {
                                    "name": "lower_bound",
                                    "type": ["null", "bytes"],
                                    "default": None,
                                    "field-id": 510,
                                },
                                {
                                    "name": "upper_bound",
                                    "type": ["null", "bytes"],
                                    "default": None,
                                    "field-id": 511,
                                },
                            ],
                        },
                    },
                ],
                "default": None,
                "field-id": 507,
            },
        ],
    }
)


def _spec_result_type(sf: dict, schema: dict) -> Optional[str]:
    """Iceberg result type of a partition-spec field (what its
    field_summary bounds encode as): bucket/year/month/day -> int
    (day's spec type is `date`, whose Appendix-D encoding is the same
    4-byte LE days-since-epoch int), identity -> the source column's
    primitive type."""
    t = sf["transform"]
    if t.startswith("bucket") or t in ("year", "month", "day"):
        return "int"
    src = next(
        (f for f in schema["fields"] if f["id"] == sf["source-id"]), None
    )
    ty = src.get("type") if src else None
    return ty if isinstance(ty, str) else None


def _spec_partition_value(transform: str, raw):
    """Dir-name partition render → Iceberg spec partition VALUE.

    The table format renders date transforms as ISO prefixes in dir
    names ("2024" / "2024-01" / "2024-01-05") but the spec encodes
    their partition values as ints: years/months SINCE EPOCH, days as
    the date ordinal. bucket/identity renders pass through. Round-7
    find: without this conversion the avro export crashed on any
    year/month/day-partitioned table (int("2024-01")) and summaries
    silently omitted bounds — only bucket specs had test coverage."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return raw
    s = str(raw)
    try:
        if transform == "year":
            return int(s) - 1970
        if transform == "month":
            y, m = s.split("-")
            return (int(y) - 1970) * 12 + int(m) - 1
        if transform == "day":
            d = datetime.date.fromisoformat(s[:10])
            return (d - datetime.date(1970, 1, 1)).days
    except (ValueError, TypeError):
        return raw
    return raw


def _partition_summaries(
    spec_fields: list[dict], schema: dict, raw_part: dict
) -> list[dict]:
    """field_summary rows for ONE dir's partition values (raw strings
    from the dir name; Hive's sentinel means null)."""
    out = []
    for sf in spec_fields:
        raw = (raw_part or {}).get(sf["name"])
        is_null = raw is None or raw == "__HIVE_DEFAULT_PARTITION__"
        b = None
        if not is_null:
            b = _single_value_bytes(
                _spec_result_type(sf, schema),
                _spec_partition_value(sf["transform"], raw),
            )
        out.append(
            {
                "contains_null": bool(is_null),
                "contains_nan": None,
                "lower_bound": b,
                "upper_bound": b,
            }
        )
    return out


def _avro_partition_fields(
    spec_fields: list[dict], schema: dict
) -> list[dict]:
    """The r102 partition-struct Avro fields for the table's spec:
    spec result types (bucket/year/month/day → int; identity → the
    source column's primitive), nullable (__HIVE_DEFAULT_PARTITION__
    is a real state), carrying the 1000+ partition field ids."""
    by_id = {f["id"]: f for f in schema["fields"]}
    out = []
    for sf in spec_fields:
        transform = sf["transform"]
        if transform == "day":
            # Spec result type `date`: int days with the date logical.
            avro_t: object = {"type": "int", "logicalType": "date"}
        elif transform.startswith("bucket") or transform in ("year", "month"):
            avro_t = "int"
        else:  # identity
            src = by_id.get(sf["source-id"], {})
            itype = src.get("type")
            avro_t = {
                "boolean": "boolean",
                "int": "int",
                "long": "long",
                "float": "float",
                "double": "double",
                "string": "string",
                "date": {"type": "int", "logicalType": "date"},
            }.get(itype if isinstance(itype, str) else None, "string")
        out.append(
            {
                "name": sf["name"],
                "type": ["null", avro_t],
                "default": None,
                "field-id": sf["field-id"],
            }
        )
    return out


def _partition_java_value(avro_field: dict, raw):
    """Convert a dir-name partition value (always a string, possibly
    Hive's null sentinel) to the typed value its Avro field expects."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = [x for x in avro_field["type"] if x != "null"][0]
    logical = t.get("logicalType") if isinstance(t, dict) else None
    base = t["type"] if isinstance(t, dict) else t
    if logical == "date":
        if isinstance(raw, int):  # already spec-converted (day transform)
            return raw
        d = datetime.date.fromisoformat(str(raw)[:10])
        return (d - datetime.date(1970, 1, 1)).days
    if base in ("int", "long"):
        return int(raw)
    if base in ("float", "double"):
        return float(raw)
    if base == "boolean":
        return str(raw).lower() in ("true", "1")
    return str(raw)


def _single_value_bytes(itype: Optional[str], v) -> Optional[bytes]:
    """Iceberg single-value serialization (spec Appendix D) for the
    bound value ``v`` of column type ``itype``; None = not encodable
    (bounds are optional, omitting is always safe)."""
    if v is None or itype is None or not isinstance(itype, str):
        return None
    try:
        if itype == "boolean":
            return b"\x01" if v in (True, "true", "True", 1) else b"\x00"
        if itype == "int":
            return struct.pack("<i", int(v))
        if itype == "long":
            return struct.pack("<q", int(v))
        if itype == "float":
            return struct.pack("<f", float(v))
        if itype == "double":
            return struct.pack("<d", float(v))
        if itype == "date":
            d = datetime.date.fromisoformat(str(v)[:10])
            return struct.pack("<i", (d - datetime.date(1970, 1, 1)).days)
        if itype.startswith("timestamp"):
            s = str(v).replace("Z", "+00:00")
            dt = datetime.datetime.fromisoformat(s)
            if dt.tzinfo is not None:
                dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            micros = (dt - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
                microseconds=1
            )
            return struct.pack("<q", micros)
        if itype == "string":
            return str(v).encode("utf-8")
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", itype)
        if m:
            from decimal import Decimal

            unscaled = int(
                Decimal(str(v)).scaleb(int(m.group(2))).to_integral_value()
            )
            n = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(n, "big", signed=True)
    except (ValueError, OverflowError, ArithmeticError):
        return None
    return None


def _jvm(table):
    spark = getattr(table, "spark", None)
    if spark is None:
        raise ValueError("codec='avro' needs the table's SparkSession (JVM avro)")
    return spark._jvm


def _parquet_rows(path: str) -> int:
    """Row count straight from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    try:
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return 0


def _avro_write(jvm, path: str, schema_json: str, records, meta: dict, build) -> int:
    """Write one Avro OCF of ``records`` (python dicts) at ``path``;
    ``build(jvm, schema, d)`` produces the GenericRecord; ``meta`` goes
    into the OCF file metadata. Returns the byte length."""
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    for k, v in meta.items():
        dfw.setMeta(str(k), str(v))
    dfw.create(schema, jvm.java.io.File(path))
    try:
        for d in records:
            dfw.append(build(jvm, schema, d))
    finally:
        dfw.close()
    return os.path.getsize(path)


def _kv_list(jvm, item_schema, pairs) -> object:
    """ArrayList of key/value GenericRecords — the Avro value for a
    _kv_map field. ``pairs``: iterable of (int key, java-ready value);
    pairs whose value is None are omitted."""
    arr = jvm.java.util.ArrayList()
    for k, v in pairs:
        if v is None:
            continue
        kv = jvm.org.apache.avro.generic.GenericData.Record(item_schema)
        kv.put("key", int(k))
        kv.put("value", v)
        arr.add(kv)
    return arr


def _build_manifest_entry(jvm, schema, d, fid_types: dict, part_fields: list) -> object:
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("status", int(d["status"]))
    rec.put("snapshot_id", int(d["snapshot_id"]))
    rec.put("sequence_number", int(d["sequence_number"]))
    # Entries are written by their adding snapshot, so the data
    # sequence number IS the file sequence number (spec: inherited
    # from the manifest's sequence number at ADDED status).
    rec.put("file_sequence_number", int(d["sequence_number"]))
    df_schema = schema.getField("data_file").schema()
    f = d["data_file"]
    sub = jvm.org.apache.avro.generic.GenericData.Record(df_schema)
    sub.put("content", int(f["content"]))
    sub.put("file_path", str(f["file_path"]))
    sub.put("file_format", str(f["file_format"]))
    part_schema = df_schema.getField("partition").schema()
    part = jvm.org.apache.avro.generic.GenericData.Record(part_schema)
    raw_part = f.get("partition") or {}
    for pf in part_fields:
        part.put(pf["name"], _partition_java_value(pf, raw_part.get(pf["name"])))
    sub.put("partition", part)
    rows = f.get("record_count")
    if rows is None:
        rows = _parquet_rows(f["file_path"])
    sub.put("record_count", int(rows))
    size = f.get("file_size_in_bytes")
    if size is None:
        size = os.path.getsize(f["file_path"]) if os.path.exists(f["file_path"]) else 0
    sub.put("file_size_in_bytes", int(size))
    nvc_item = df_schema.getField("null_value_counts").schema().getElementType()
    sub.put(
        "null_value_counts",
        _kv_list(
            jvm,
            nvc_item,
            ((int(k), int(v)) for k, v in (f.get("null_value_counts") or {}).items()),
        ),
    )
    for fld, src in (("lower_bounds", "lower_bounds"), ("upper_bounds", "upper_bounds")):
        item = df_schema.getField(fld).schema().getElementType()
        pairs = []
        for k, v in (f.get(src) or {}).items():
            b = _single_value_bytes(fid_types.get(int(k)), v)
            if b is not None:
                pairs.append((int(k), jvm.java.nio.ByteBuffer.wrap(b)))
        sub.put(fld, _kv_list(jvm, item, pairs))
    if df_schema.getField("equality_ids") is not None:
        arr = jvm.java.util.ArrayList()
        for x in f.get("equality_ids") or []:
            arr.add(int(x))
        sub.put("equality_ids", arr)
    rec.put("data_file", sub)
    return rec


def _build_manifest_file(jvm, schema, d) -> object:
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("manifest_path", str(d["manifest_path"]))
    rec.put("manifest_length", int(d["manifest_length"]))
    rec.put("partition_spec_id", int(d["partition_spec_id"]))
    rec.put("content", int(d["content"]))
    rec.put("sequence_number", int(d["sequence_number"]))
    rec.put("min_sequence_number", int(d["min_sequence_number"]))
    rec.put("added_snapshot_id", int(d["added_snapshot_id"]))
    for k in (
        "added_files_count",
        "existing_files_count",
        "deleted_files_count",
        "added_rows_count",
        "existing_rows_count",
        "deleted_rows_count",
    ):
        rec.put(k, int(d.get(k) or 0))
    summaries = d.get("partitions")
    if summaries is not None and schema.getField("partitions") is not None:
        # ["null", array<r508>] union: take the array branch's element.
        arr_schema = [
            s
            for s in schema.getField("partitions").schema().getTypes()
            if s.getType().getName() == "array"
        ][0]
        item = arr_schema.getElementType()
        arr = jvm.java.util.ArrayList()
        for s in summaries:
            r = jvm.org.apache.avro.generic.GenericData.Record(item)
            r.put("contains_null", bool(s["contains_null"]))
            r.put("contains_nan", s.get("contains_nan"))
            for b in ("lower_bound", "upper_bound"):
                v = s.get(b)
                r.put(b, None if v is None else jvm.java.nio.ByteBuffer.wrap(v))
            arr.add(r)
        rec.put("partitions", arr)
    return rec


def read_avro_records(spark, path: str) -> tuple[list[dict], dict]:
    """Read back an exported .avro file (validation/tests): returns
    (records as JSON-parsed dicts via Avro's own toString, file meta)."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        out = []
        while reader.hasNext():
            out.append(json.loads(reader.next().toString()))
        meta = {}
        for k in (
            "content",
            "sequence-number",
            "format-version",
            "partition-spec-id",
            "snapshot-id",
        ):
            v = reader.getMetaString(k)
            if v is not None:
                meta[k] = v
        # The writer schema (Avro stores it in the OCF header) — what a
        # mounting engine actually resolves against; the structural
        # spec test asserts its field names/ids.
        meta["avro.schema"] = json.loads(reader.getSchema().toString())
        return out, meta
    finally:
        reader.close()


def export_iceberg_metadata(
    table, branch: str = "main", codec: str = "json"
) -> str:
    """Write the Iceberg-shaped metadata tree for ``branch``'s lineage;
    returns the path of the new ``v<N>.metadata.json``. ``codec``:
    ``"json"`` (hermetically inspectable, the default) or ``"avro"``
    (real Avro OCF manifests via the JVM's org.apache.avro — the
    serialization Iceberg itself uses for manifests)."""
    if codec not in ("json", "avro"):
        raise ValueError(f"codec must be json|avro, got {codec!r}")
    jvm = _jvm(table) if codec == "avro" else None
    head_id = table.current_snapshot_id(branch)
    if head_id is None:
        raise ValueError(f"branch {branch!r} has no snapshots to export")
    lineage = table.history(branch)  # oldest -> newest
    head = lineage[-1]

    meta_dir = os.path.join(table.base_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    registry = (
        table._read_column_registry()
        if hasattr(table, "_read_column_registry")
        else None
    )
    if registry:
        # Registry-honoring schema (ADVICE r5): current epoch's
        # permanent ids + LOGICAL names — correct even when the last
        # commit was a pure-metadata rename/drop/widen with no data
        # write (the footer still carries old physical names then).
        schema, name_to_id, last_column_id = _schema_from_registry(head, registry)
    else:
        # No registry (no evolution ever declared): schema from the
        # head snapshot's newest data dir (schema evolution without a
        # registry is add-column; the newest dir carries the widest
        # schema).
        sample = None
        for d in reversed(head.data_dirs):
            sample = _first_parquet(d)
            if sample:
                break
        if sample is None:
            raise ValueError("no parquet files in the head snapshot")
        schema, name_to_id, last_column_id = _schema_from_parquet(sample, None)

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

    # Dir-name partition renders → spec values per field (date
    # transforms encode as ints; see _spec_partition_value).
    _transform_by_name = {f["name"]: f["transform"] for f in spec_fields}

    # Avro-codec machinery: per-export entry schemas (the partition
    # struct is table-specific) and the field-id→type map that drives
    # binary single-value bound serialization.
    fid_types = {
        f["id"]: f["type"] for f in schema["fields"] if isinstance(f["type"], str)
    }
    part_avro_fields = _avro_partition_fields(spec_fields, schema)
    entry_schema_json = _entry_schema(part_avro_fields, False)
    delete_entry_schema_json = _entry_schema(part_avro_fields, True)

    def _entry_builder(jvm_, sch, d):
        return _build_manifest_entry(jvm_, sch, d, fid_types, part_avro_fields)

    seq_of = {s.snapshot_id: i + 1 for i, s in enumerate(lineage)}
    # Which snapshot first ADDED each dir (for manifest added_snapshot_id
    # and entry status): walk the lineage oldest-first.
    added_by: dict[str, int] = {}
    for s in lineage:
        for d in s.data_dirs:
            added_by.setdefault(d, s.snapshot_id)

    # Shared per-dir data manifests. Harvested stats are keyed by each
    # dir's PHYSICAL column names (its write epoch), so bounds for
    # pre-rename dirs must map through that epoch's naming — the
    # current-name map would silently drop them.
    current_ids = set(name_to_id.values())

    def _ids_for_dir(snap, d: str) -> dict[str, int]:
        if not registry:
            return name_to_id
        epochs = registry["epochs"]
        ep = int((snap.dir_epochs or {}).get(d, 0))
        if not 0 <= ep < len(epochs):
            ep = len(epochs) - 1
        return {
            c["name"]: int(c["id"])
            for c in epochs[ep]["columns"]
            if int(c["id"]) in current_ids
        }

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
                lower, upper, nulls = _bounds_for(st or dstats, _ids_for_dir(s, d))
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
                            "partition": {
                                pn: _spec_partition_value(
                                    _transform_by_name.get(pn, "identity"), pv
                                )
                                for pn, pv in (
                                    (s.dir_partitions or {}).get(d, {})
                                ).items()
                            },
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
            if codec == "avro":
                mpath = mpath[: -len(".json")] + ".avro"
                length = _avro_write(
                    jvm,
                    mpath,
                    entry_schema_json,
                    entries,
                    {
                        # The OCF metadata keys Iceberg itself writes
                        # on manifests, plus lineage breadcrumbs.
                        "schema": json.dumps(schema),
                        "partition-spec": json.dumps(spec_fields),
                        "partition-spec-id": 0,
                        "format-version": 2,
                        "content": "data",
                        "added-snapshot-id": adder,
                        "sequence-number": seq_of[adder],
                    },
                    _entry_builder,
                )
            else:
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
                "partitions": _partition_summaries(
                    spec_fields, schema, (s.dir_partitions or {}).get(d, {})
                )
                if spec_fields
                else None,
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
            ext = "avro" if codec == "avro" else "json"
            mpath = os.path.join(
                meta_dir, f"delete-{hashlib.md5(ddir.encode()).hexdigest()[:16]}.{ext}"
            )
            if codec == "avro":
                length = _avro_write(
                    jvm,
                    mpath,
                    delete_entry_schema_json,
                    entries,
                    {
                        "schema": json.dumps(schema),
                        "partition-spec": json.dumps(spec_fields),
                        "partition-spec-id": 0,
                        "format-version": 2,
                        "content": "deletes",
                        "added-snapshot-id": s.snapshot_id,
                        "sequence-number": seq_of[s.snapshot_id],
                        "equality-key": key,
                    },
                    _entry_builder,
                )
            else:
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
                    "deleted_files_count": 0,
                    "added_rows_count": mm["n_rows"]
                    if mm["adder"] == s.snapshot_id
                    else 0,
                    "existing_rows_count": 0
                    if mm["adder"] == s.snapshot_id
                    else mm["n_rows"],
                    "deleted_rows_count": 0,
                    "partitions": mm["partitions"],
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
        ext = "avro" if codec == "avro" else "json"
        ml_path = os.path.join(
            meta_dir, f"snap-{s.snapshot_id}.manifest-list.{ext}"
        )
        if codec == "avro":
            _avro_write(
                jvm,
                ml_path,
                _AVRO_MANIFEST_FILE_SCHEMA,
                manifests,
                {
                    "format-version": 2,
                    "snapshot-id": s.snapshot_id,
                    "sequence-number": seq_of[s.snapshot_id],
                    "parent-snapshot-id": s.parent_id
                    if s.parent_id is not None
                    else "null",
                },
                _build_manifest_file,
            )
        else:
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
                        # Iceberg renders row-replacing commits (MERGE)
                        # as an overwrite operation.
                        "merge": "overwrite",
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
        "file-codec": codec,
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
