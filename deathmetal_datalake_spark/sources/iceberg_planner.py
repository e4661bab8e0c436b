"""External-planner-shaped read path over the exported Iceberg tree.

This module consumes ONLY what a mounting engine (pyiceberg, Trino's
Iceberg connector) would read — ``vN.metadata.json``, the Avro manifest
list, the Avro manifests — and plans a pruned scan from that metadata
alone: manifest-list ``field_summaries`` (r508) prune whole manifests,
per-file partition values and Appendix-D column bounds prune data
files. No data file is opened at plan time (the acceptance test proves
it by hiding the data directories while planning).

Reference parity: the reference mounts its catalog through Trino
(``/root/reference/cluster/trino-catalogs/nessie.properties:1-9``,
``/root/reference/scripts/trino_create_tables.sql``); this planner is
the same read contract exercised against our export, which is the
strongest in-environment acceptance available (no external engine
ships here).

Spec record classes mirror the Iceberg v2 spec's field ids (schema
evolution happens by id, so the ids ARE the contract):
``manifest_file`` 500-517 with ``field_summary`` r508 (509/518/510/511),
``manifest_entry`` 0/1/3/4/2, ``data_file`` r2 (134/100/101/102/103/
104/110/125/128/135). Appendix-D single-value deserialization inverts
``iceberg_export._single_value_bytes``.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import struct
from dataclasses import dataclass, field
from typing import Optional

from deathmetal_datalake_spark.sources.iceberg_export import read_avro_records

# ---------------------------------------------------------------------------
# Appendix-D single-value deserialization.
# ---------------------------------------------------------------------------


def _raw_bytes(v) -> Optional[bytes]:
    """Avro's JSON rendering of ``bytes`` is an ISO-8859-1-escaped
    string (sometimes union-wrapped as ``{"bytes": ...}``)."""
    if v is None:
        return None
    if isinstance(v, dict):
        v = v.get("bytes")
        if v is None:
            return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode("latin-1")


def decode_single_value(itype: Optional[str], raw):
    """Iceberg single-value deserialization (spec Appendix D); the
    inverse of ``iceberg_export._single_value_bytes``."""
    data = _raw_bytes(raw)
    if data is None or itype is None:
        return None
    if itype == "boolean":
        return data != b"\x00"
    if itype == "int":
        return struct.unpack("<i", data)[0]
    if itype == "long":
        return struct.unpack("<q", data)[0]
    if itype == "float":
        return struct.unpack("<f", data)[0]
    if itype == "double":
        return struct.unpack("<d", data)[0]
    if itype == "date":
        return datetime.date(1970, 1, 1) + datetime.timedelta(
            days=struct.unpack("<i", data)[0]
        )
    if itype.startswith("timestamp"):
        micros = struct.unpack("<q", data)[0]
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=micros)
    if itype == "string":
        return data.decode("utf-8")
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", itype)
    if m:
        from decimal import Decimal

        unscaled = int.from_bytes(data, "big", signed=True)
        return Decimal(unscaled).scaleb(-int(m.group(2)))
    return None


# ---------------------------------------------------------------------------
# Spec record classes (field ids in comments are the spec's).
# ---------------------------------------------------------------------------


@dataclass
class FieldSummary:  # r508: 509 contains_null, 518 contains_nan, 510/511 bounds
    contains_null: bool
    contains_nan: Optional[bool]
    lower_bound: Optional[bytes]
    upper_bound: Optional[bytes]


@dataclass
class ManifestFile:  # manifest_file: 500-517
    manifest_path: str  # 500
    manifest_length: int  # 501
    partition_spec_id: int  # 502
    content: int  # 517: 0=data, 1=deletes
    sequence_number: int  # 515
    min_sequence_number: int  # 516
    added_snapshot_id: int  # 503
    partitions: Optional[list[FieldSummary]]  # 507

    @classmethod
    def from_record(cls, r: dict) -> "ManifestFile":
        summaries = None
        parts = r.get("partitions")
        if isinstance(parts, dict):  # union-wrapped
            parts = parts.get("array")
        if parts is not None:
            summaries = [
                FieldSummary(
                    contains_null=bool(p.get("contains_null")),
                    contains_nan=p.get("contains_nan"),
                    lower_bound=_raw_bytes(p.get("lower_bound")),
                    upper_bound=_raw_bytes(p.get("upper_bound")),
                )
                for p in parts
            ]
        return cls(
            manifest_path=r["manifest_path"],
            manifest_length=r["manifest_length"],
            partition_spec_id=r.get("partition_spec_id", 0),
            content=r.get("content", 0),
            sequence_number=r.get("sequence_number", 0),
            min_sequence_number=r.get("min_sequence_number", 0),
            added_snapshot_id=r.get("added_snapshot_id", 0),
            partitions=summaries,
        )


def _kv_map(v) -> dict:
    """Spec k/v-record array encoding (non-string-key map) → dict."""
    if v is None:
        return {}
    if isinstance(v, dict):
        v = v.get("array", [])
    return {kv["key"]: kv["value"] for kv in v}


@dataclass
class DataFile:  # r2: 134 content, 100 path, 101 format, 102 partition, ...
    content: int
    file_path: str
    file_format: str
    partition: dict
    record_count: Optional[int]
    file_size_in_bytes: Optional[int]
    lower_bounds: dict  # 125: field-id → Appendix-D bytes
    upper_bounds: dict  # 128
    null_value_counts: dict  # 110
    equality_ids: Optional[list[int]]  # 135
    # Data sequence number (entry field 3, inherited from the manifest
    # when null — spec §"Sequence number inheritance"). Carried onto the
    # planned file so execute() can scope equality deletes: a v2
    # equality delete applies only to data files with data sequence
    # number STRICTLY LESS than the delete's.
    sequence_number: int = 0


@dataclass
class ManifestEntry:  # manifest_entry: 0 status, 1 snapshot_id, 3 seq, 2 file
    status: int
    snapshot_id: Optional[int]
    sequence_number: Optional[int]
    data_file: DataFile

    @classmethod
    def from_record(cls, r: dict) -> "ManifestEntry":
        df = r["data_file"]
        part = df.get("partition") or {}
        if isinstance(part, dict) and set(part) == {"fields"}:  # defensive
            part = part["fields"]
        eq = df.get("equality_ids")
        if isinstance(eq, dict):
            eq = eq.get("array")
        return cls(
            status=r.get("status", 1),
            snapshot_id=r.get("snapshot_id"),
            sequence_number=r.get("sequence_number"),
            data_file=DataFile(
                content=df.get("content", 0),
                file_path=df["file_path"],
                file_format=df.get("file_format", "PARQUET"),
                partition={k: (v if not isinstance(v, dict) else list(v.values())[0])
                           for k, v in (part or {}).items()},
                record_count=df.get("record_count"),
                file_size_in_bytes=df.get("file_size_in_bytes"),
                lower_bounds=_kv_map(df.get("lower_bounds")),
                upper_bounds=_kv_map(df.get("upper_bounds")),
                null_value_counts=_kv_map(df.get("null_value_counts")),
                equality_ids=eq,
            ),
        )


@dataclass
class EqualityDelete:
    file_path: str
    equality_ids: list[int]
    sequence_number: int


@dataclass
class ScanPlan:
    data_files: list[DataFile]
    deletes: list[EqualityDelete]
    n_manifests_total: int = 0
    n_manifests_pruned: int = 0
    n_files_total: int = 0
    n_files_pruned: int = 0
    snapshot_id: Optional[int] = None
    notes: list[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# The planner.
# ---------------------------------------------------------------------------

# Python-side partition transforms (shared convention with
# sources.snapshots._transform_value — the 60-bit md5 bucket is the
# engine's portable hash).


def _coerce_value(itype: Optional[str], v):
    """Coerce a user predicate value to the column's Iceberg type so it
    compares against Appendix-D-decoded bounds; None = un-coercible
    (no pruning on that term — pruning is optional, never a filter)."""
    if v is None or itype is None:
        return None
    try:
        if itype in ("int", "long"):
            return int(v)
        if itype in ("float", "double"):
            return float(v)
        if itype == "date" and not isinstance(v, datetime.date):
            return datetime.date.fromisoformat(str(v)[:10])
        if itype.startswith("timestamp") and not isinstance(v, datetime.datetime):
            return datetime.datetime.fromisoformat(str(v))
    except (TypeError, ValueError):
        return None
    return v


def _transform_value(transform: str, v, source_itype: Optional[str] = None):
    """Predicate value → Iceberg SPEC partition value (the encoding
    field_summaries and manifest partition structs carry): bucket →
    the engine's 60-bit md5 bucket, year/month → ints since epoch,
    day → the date ordinal (all ordered ints, so range pruning on date
    transforms is plain integer comparison). identity → the SOURCE
    type (field summaries encode identity bounds in the source type,
    so a str(v) here would compare int-vs-str and crash planning —
    round-8 ADVICE fix)."""
    import hashlib

    if transform == "identity":
        return _coerce_value(source_itype, v)
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % int(m.group(1))
    if transform in ("year", "month", "day"):
        if isinstance(v, str):
            v = datetime.date.fromisoformat(v[:10])
        if transform == "year":
            return v.year - 1970
        if transform == "month":
            return (v.year - 1970) * 12 + v.month - 1
        return (
            datetime.date(v.year, v.month, v.day) - datetime.date(1970, 1, 1)
        ).days
    return None


def _identity_file_value(tv):
    """Manifest r102 partition-struct rendering of an identity value
    (the Avro-typed form ``iceberg_export._avro_partition_fields``
    writes): dates as epoch-day ints; numerics/strings/booleans as
    themselves. Identity timestamps are rendered as raw strings by the
    export, so no file-level term (summary-level pruning still runs)."""
    if tv is None:
        return None
    if isinstance(tv, datetime.datetime):
        return None
    if isinstance(tv, datetime.date):
        return (tv - datetime.date(1970, 1, 1)).days
    return tv


def _partition_field_itype(transform: str, source_itype: Optional[str]) -> Optional[str]:
    """Appendix-D decode type of a partition field's summary bounds:
    bucket/year/month/day all encode as 4-byte LE ints (day's spec
    type is `date`, same physical encoding); identity follows the
    source column."""
    if transform == "identity":
        return source_itype
    if transform.startswith("bucket[") or transform in ("year", "month", "day"):
        return "int"
    return None


class IcebergScanPlanner:
    """Plans pruned scans from the exported metadata tree alone.

    ``predicates`` (plan_scan) is a conjunction of per-column terms:
    ``{col: ("eq", v)}`` or ``{col: ("range", lo, hi)}`` (closed
    interval; either bound may be None). Equality terms on partition
    source columns prune manifests through field_summaries and files
    through their typed partition values; all terms prune files through
    Appendix-D column bounds. Missing metadata always keeps — pruning
    is an optimization, never a filter.
    """

    def __init__(self, spark, metadata_path: str):
        self.spark = spark
        with open(metadata_path) as f:
            self.meta = json.load(f)
        if self.meta.get("file-codec") != "avro":
            raise ValueError(
                "IcebergScanPlanner consumes the codec='avro' export "
                f"(got file-codec={self.meta.get('file-codec')!r})"
            )
        schema = self.meta["schemas"][0]
        self.name_to_id = {f["name"]: f["id"] for f in schema["fields"]}
        self.id_to_itype = {
            f["id"]: f["type"] for f in schema["fields"] if isinstance(f["type"], str)
        }
        self.id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
        spec_id = self.meta.get("default-spec-id", 0)
        self.spec_fields = next(
            s["fields"] for s in self.meta["partition-specs"] if s["spec-id"] == spec_id
        )

    # -- snapshots ---------------------------------------------------------

    def snapshot(self, snapshot_id: Optional[int] = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.meta["current-snapshot-id"]
        for s in self.meta["snapshots"]:
            if s["snapshot-id"] == sid:
                return s
        raise KeyError(f"snapshot {sid} not in metadata")

    def manifest_list(self, snapshot_id: Optional[int] = None) -> list[ManifestFile]:
        snap = self.snapshot(snapshot_id)
        records, _ = read_avro_records(self.spark, snap["manifest-list"])
        return [ManifestFile.from_record(r) for r in records]

    # -- pruning -----------------------------------------------------------

    def _manifest_survives(self, mf: ManifestFile, part_preds: list[tuple]) -> bool:
        """field_summaries check: prune only when a summary range
        provably excludes the predicate's transformed interval."""
        if mf.partitions is None:
            return True
        for idx, itype, t_lo, t_hi in part_preds:
            if idx >= len(mf.partitions):
                continue
            s = mf.partitions[idx]
            lo = decode_single_value(itype, s.lower_bound)
            hi = decode_single_value(itype, s.upper_bound)
            try:
                if lo is not None and t_hi is not None and lo > t_hi:
                    return False
                if hi is not None and t_lo is not None and hi < t_lo:
                    return False
            except TypeError:
                continue  # incomparable rendering: keep (pruning never filters)
        return True

    def _file_survives(self, df: DataFile, part_preds, bound_preds) -> bool:
        for pname, t_lo, t_hi in part_preds:
            got = df.partition.get(pname)
            if got is None:
                continue
            ref = t_lo if t_lo is not None else t_hi
            try:
                if isinstance(ref, bool):  # eq-only
                    if t_lo == t_hi and str(got).lower() != str(t_lo).lower():
                        return False
                elif isinstance(ref, int):
                    g = int(got)
                    if t_lo is not None and g < t_lo:
                        return False
                    if t_hi is not None and g > t_hi:
                        return False
                elif isinstance(ref, float):
                    g = float(got)
                    if t_lo is not None and g < t_lo:
                        return False
                    if t_hi is not None and g > t_hi:
                        return False
                elif isinstance(ref, str):
                    g = str(got)
                    if t_lo is not None and g < t_lo:
                        return False
                    if t_hi is not None and g > t_hi:
                        return False
                elif t_lo is not None and t_lo == t_hi and str(got) != str(t_lo):
                    return False
            except (TypeError, ValueError):
                continue  # unknown rendering: keep (pruning is optional)
        for fid, itype, lo_p, hi_p in bound_preds:
            f_lo = decode_single_value(itype, df.lower_bounds.get(fid))
            f_hi = decode_single_value(itype, df.upper_bounds.get(fid))
            try:
                if f_lo is not None and hi_p is not None and f_lo > hi_p:
                    return False
                if f_hi is not None and lo_p is not None and f_hi < lo_p:
                    return False
            except TypeError:
                continue  # incomparable: keep
        return True

    def plan_scan(
        self,
        predicates: Optional[dict] = None,
        snapshot_id: Optional[int] = None,
    ) -> ScanPlan:
        predicates = predicates or {}
        snap = self.snapshot(snapshot_id)
        manifests = self.manifest_list(snap["snapshot-id"])

        # Partition-level terms: (summary index, result itype,
        # transformed lo, transformed hi) per spec field whose source
        # has an applicable term. Equality applies to every transform;
        # RANGE terms apply to order-preserving transforms —
        # year/month/day (spec ints since epoch) and identity (typed
        # source values after the round-8 coercion fix; string identity
        # orders lexicographically like the source). bucket scrambles
        # order and stays eq-only.
        _RANGE_SAFE = ("year", "month", "day", "identity")
        mf_part_preds: list[tuple] = []
        file_part_preds: list[tuple] = []
        for idx, sf in enumerate(self.spec_fields):
            src = self.id_to_name.get(sf["source-id"])
            term = predicates.get(src)
            if not term:
                continue
            src_itype = self.id_to_itype.get(sf["source-id"])
            itype = _partition_field_itype(sf["transform"], src_itype)
            is_identity = sf["transform"] == "identity"
            if term[0] == "eq":
                tval = _transform_value(sf["transform"], term[1], src_itype)
                if tval is None:
                    continue
                mf_part_preds.append((idx, itype, tval, tval))
                fval = _identity_file_value(tval) if is_identity else tval
                if fval is not None:
                    file_part_preds.append((sf["name"], fval, fval))
            elif term[0] == "range" and sf["transform"] in _RANGE_SAFE:
                t_lo = (
                    _transform_value(sf["transform"], term[1], src_itype)
                    if term[1] is not None
                    else None
                )
                t_hi = (
                    _transform_value(sf["transform"], term[2], src_itype)
                    if term[2] is not None
                    else None
                )
                if t_lo is None and t_hi is None:
                    continue
                mf_part_preds.append((idx, itype, t_lo, t_hi))
                f_lo = _identity_file_value(t_lo) if is_identity else t_lo
                f_hi = _identity_file_value(t_hi) if is_identity else t_hi
                if f_lo is not None or f_hi is not None:
                    file_part_preds.append((sf["name"], f_lo, f_hi))

        # File-level bound terms: (field id, itype, lo, hi) — predicate
        # values coerced to the column's type so they compare against
        # Appendix-D-decoded bounds.
        def _coerce(itype: str, v):
            if v is None:
                return None
            try:
                if itype in ("int", "long"):
                    return int(v)
                if itype in ("float", "double"):
                    return float(v)
                if itype == "date" and not isinstance(v, datetime.date):
                    return datetime.date.fromisoformat(str(v)[:10])
                if itype.startswith("timestamp") and not isinstance(
                    v, datetime.datetime
                ):
                    return datetime.datetime.fromisoformat(str(v))
            except (TypeError, ValueError):
                return None  # un-coercible: no bound pruning on this term
            return v

        bound_preds = []
        for col, term in predicates.items():
            fid = self.name_to_id.get(col)
            itype = self.id_to_itype.get(fid)
            if fid is None or itype is None:
                continue
            if term[0] == "eq":
                v = _coerce(itype, term[1])
                bound_preds.append((fid, itype, v, v))
            elif term[0] == "range":
                bound_preds.append(
                    (fid, itype, _coerce(itype, term[1]), _coerce(itype, term[2]))
                )

        plan = ScanPlan(data_files=[], deletes=[], snapshot_id=snap["snapshot-id"])
        plan.n_manifests_total = sum(1 for m in manifests if m.content == 0)
        for mf in manifests:
            if mf.content == 1:  # delete manifest: never pruned by data preds
                entries, _ = read_avro_records(self.spark, mf.manifest_path)
                for e in (ManifestEntry.from_record(r) for r in entries):
                    if e.data_file.content == 2:
                        plan.deletes.append(
                            EqualityDelete(
                                file_path=e.data_file.file_path,
                                equality_ids=list(e.data_file.equality_ids or []),
                                # Same inheritance rule as the data-file path:
                                # an EXPLICIT 0 is a real sequence number, only
                                # null inherits the manifest's.
                                sequence_number=(
                                    e.sequence_number
                                    if e.sequence_number is not None
                                    else mf.sequence_number
                                ),
                            )
                        )
                continue
            if not self._manifest_survives(mf, mf_part_preds):
                plan.n_manifests_pruned += 1
                continue
            entries, _ = read_avro_records(self.spark, mf.manifest_path)
            for e in (ManifestEntry.from_record(r) for r in entries):
                if e.data_file.content != 0:
                    continue
                # Sequence-number inheritance (spec): an entry with a
                # null seq inherits its manifest's. Carried so execute()
                # can scope equality deletes by data sequence number.
                e.data_file.sequence_number = (
                    e.sequence_number
                    if e.sequence_number is not None
                    else mf.sequence_number
                )
                plan.n_files_total += 1
                if self._file_survives(e.data_file, file_part_preds, bound_preds):
                    plan.data_files.append(e.data_file)
                else:
                    plan.n_files_pruned += 1
        return plan

    # -- execution (the only stage that opens data files) -------------------

    def execute(self, plan: ScanPlan):
        """Run the planned scan: plain parquet read of the surviving
        files, then SEQUENCE-SCOPED equality-delete anti-joins (v2
        merge-on-read). Spec: an equality delete applies only to data
        files whose data sequence number is STRICTLY LESS than the
        delete's — a key re-inserted after a delete must survive
        (round-8 ADVICE fix; same DELETE-then-INSERT semantics as the
        native reader's ``snapshots.delete_keys``)."""
        if not plan.data_files:
            raise ValueError("empty scan plan (all files pruned)")
        from pyspark.sql import functions as F

        # Group the planned files by data sequence number and tag each
        # group with a literal __seq column (a handful of groups — one
        # per appending snapshot — so the union stays shallow).
        by_seq: dict[int, list[str]] = {}
        for f in plan.data_files:
            by_seq.setdefault(f.sequence_number or 0, []).append(f.file_path)
        raw_parts = [
            (seq, self.spark.read.parquet(*paths))
            for seq, paths in sorted(by_seq.items())
        ]
        # Collision-checked tag name: a table may legitimately own a
        # "__seq" data column; never overwrite user data with the tag.
        data_cols = {c for _, p in raw_parts for c in p.columns}
        seq_col = "__seq"
        while seq_col in data_cols:
            seq_col = "_" + seq_col
        parts = [p.withColumn(seq_col, F.lit(seq)) for seq, p in raw_parts]
        df = parts[0]
        for p in parts[1:]:
            # allowMissingColumns: sequence groups may span a schema
            # evolution (columns added in a later snapshot read NULL
            # from older files — the same semantics one mixed
            # read.parquet(*all) call gave before seq-grouping).
            df = df.unionByName(p, allowMissingColumns=True)
        # One anti-join per (key-columns, delete sequence) group,
        # applied only to the strictly-older slice of the scan.
        by_key: dict[tuple, list[str]] = {}
        for d in plan.deletes:
            cols = tuple(self.id_to_name[i] for i in d.equality_ids)
            by_key.setdefault((cols, d.sequence_number), []).append(d.file_path)
        for (cols, dseq), paths in sorted(by_key.items(), key=lambda kv: kv[0][1]):
            if not any(seq < dseq for seq in by_seq):
                continue  # no planned file is older than this delete
            dels = self.spark.read.parquet(*paths).select(*cols).distinct()
            older = df.filter(F.col(seq_col) < F.lit(dseq)).join(
                dels, on=list(cols), how="left_anti"
            )
            newer = df.filter(F.col(seq_col) >= F.lit(dseq))
            df = older.unionByName(newer)
        return df.drop(seq_col)
