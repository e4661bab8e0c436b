"""Iceberg-metadata export: layout assertions over a real table.

Builds a SnapshotTable with a hidden partition spec, an append, a
row-level delete, and a tag, then asserts the exported tree walks like
an Iceberg v2 table: metadata.json fields, preorder field-ids, the
1000+ partition-field-id convention, per-snapshot manifest lists with
monotonic sequence numbers, shared data manifests whose record counts
sum to the table count, equality-delete manifests (content=2), and
typed refs for branches and tags — the pyiceberg-style structural
round-trip the export promises (no pyiceberg runtime needed; files are
JSON by documented deviation, marked ``file-codec: json``).
"""

from __future__ import annotations

import json
import os

import pytest

@pytest.fixture()
def table(spark, tmp_path):
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.set_partition_spec([("bucket[4]", "user_id")])
    df = spark.range(100).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 10).alias("grp"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    t.write(df, mode="overwrite")
    t.write(df.filter(F.col("user_id") < 10), mode="append")
    t.delete_keys(df.filter(F.col("user_id").isin(3, 7)).select("user_id"), "user_id")
    t.create_tag("v1")
    return t


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_export_layout_walks_like_iceberg(table):
    meta_path = table.export_iceberg_metadata()
    assert os.path.basename(meta_path).startswith("v")
    meta = _load(meta_path)

    # Top-level v2 metadata fields.
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == table.current_snapshot_id()
    assert meta["last-sequence-number"] == len(meta["snapshots"])
    assert meta["file-codec"] == "json"  # documented Avro deviation

    # Schema: preorder field-ids, 1..last-column-id, names intact.
    fields = meta["schemas"][0]["fields"]
    assert [f["name"] for f in fields] == ["user_id", "grp", "name"]
    assert [f["id"] for f in fields] == [1, 2, 3]
    assert meta["last-column-id"] == 3
    assert fields[0]["type"] == "long" and fields[2]["type"] == "string"

    # Partition spec: iceberg transform vocabulary, field-ids from 1000,
    # source-id resolves to the schema field.
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [
        {
            "field-id": 1000,
            "name": spec[0]["name"],
            "transform": "bucket[4]",
            "source-id": 1,
        }
    ]
    assert meta["last-partition-id"] == 1000

    # Snapshots: one per commit (overwrite, append, delete), sequence
    # numbers monotonic from 1, operations mapped, lineage linked.
    snaps = meta["snapshots"]
    assert [s["sequence-number"] for s in snaps] == [1, 2, 3]
    assert [s["summary"]["operation"] for s in snaps] == [
        "overwrite",
        "append",
        "delete",
    ]
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur["parent-snapshot-id"] == prev["snapshot-id"]

    # Refs: main branch + the tag, typed.
    assert meta["refs"]["main"] == {
        "snapshot-id": meta["current-snapshot-id"],
        "type": "branch",
    }
    assert meta["refs"]["v1"]["type"] == "tag"

    # snapshot-log mirrors the lineage timestamps.
    assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [
        s["snapshot-id"] for s in snaps
    ]


def test_manifest_lists_and_manifests_resolve(table):
    meta = _load(table.export_iceberg_metadata())
    head = meta["snapshots"][-1]
    ml = _load(head["manifest-list"])
    assert ml["manifests"], "head manifest list is empty"

    data_rows = 0
    saw_delete = False
    for m in ml["manifests"]:
        mf = _load(m["manifest_path"])
        assert m["manifest_length"] == os.path.getsize(m["manifest_path"])
        assert m["sequence_number"] >= 1
        for entry in mf["entries"]:
            df = entry["data_file"]
            assert os.path.exists(df["file_path"])  # every path resolves
            assert df["file_format"] == "PARQUET"
            assert df["bounds-encoding"] == "json"  # documented deviation
            if df["content"] == 0:
                data_rows += df["record_count"]
                # Hidden-partition value recorded per file.
                assert set(df["partition"]) == {"user_id_bucket4"} or df[
                    "partition"
                ], "partition values missing"
                # Bounds keyed by FIELD-ID strings.
                assert "1" in df["lower_bounds"]
            elif df["content"] == 2:
                saw_delete = True
                assert df["equality_ids"] == [1]  # user_id's field id
    assert saw_delete, "equality-delete manifest missing from head"
    # Record counts in the manifests sum to the PRE-delete physical rows
    # (100 overwrite + 10 append); the delete manifest is what external
    # readers apply on top, exactly like Iceberg v2 merge-on-read.
    assert data_rows == 110
    # And the native reader agrees post-delete: 110 - 2*2 deleted keys.
    assert table.read().count() == 106


def test_export_uses_registry_field_ids_after_rename(spark, tmp_path):
    # Rename evolution: the exported schema shows the NEW name under the
    # ORIGINAL field id (Iceberg's id permanence), not a re-numbered one.
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.write(df, mode="overwrite")
    t.rename_column("v", "value")
    t.write(
        spark.range(10, 15).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("value")
        ),
        mode="append",
    )
    meta = _load(t.export_iceberg_metadata())
    fields = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert fields == {"k": 1, "value": 2}  # renamed, id preserved
    assert meta["last-column-id"] == 2


def test_reexport_bumps_version_and_is_stable(table):
    p1 = table.export_iceberg_metadata()
    p2 = table.export_iceberg_metadata()
    v1 = int(os.path.basename(p1)[1:].split(".")[0])
    v2 = int(os.path.basename(p2)[1:].split(".")[0])
    assert v2 == v1 + 1
    a, b = _load(p1), _load(p2)
    assert a["table-uuid"] == b["table-uuid"]  # deterministic identity
    assert a["snapshots"] == b["snapshots"]  # same lineage, same export


def test_sort_order_declared_compacted_and_exported(spark, tmp_path):
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl3"))
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    # Unsorted-ish writes, then a declared order: compact() with no
    # explicit clustering must use it, giving each output file a narrow
    # k-range (file stats line up with k predicates).
    t.write(df.orderBy(F.rand(seed=7)), mode="overwrite")
    t.set_sort_order(["k"])
    assert t.sort_order() == ["k"]
    t.compact(target_files=4)
    kept, pruned = t.scan_files(filters=[("k", ">=", 900)])
    assert pruned, "sorted compaction should let file stats prune"
    assert t.read(filters=[("k", ">=", 900)]).count() == 100

    meta = _load(t.export_iceberg_metadata())
    so = meta["sort-orders"][0]
    assert so["fields"] == [
        {
            "transform": "identity",
            "source-id": 1,
            "direction": "asc",
            "null-order": "nulls-first",
        }
    ]


def test_avro_codec_writes_real_ocf_manifests(table, spark):
    # codec="avro": manifests and manifest lists are genuine Avro
    # object container files written by the JVM's org.apache.avro —
    # OCF magic bytes, round-trip through Avro's own reader, file-level
    # metadata, and field values matching the JSON export bit-for-bit.
    from deathmetal_datalake_spark.sources.iceberg_export import read_avro_records

    meta = _load(table.export_iceberg_metadata(codec="avro"))
    assert meta["file-codec"] == "avro"
    head_ml = meta["snapshots"][-1]["manifest-list"]
    assert head_ml.endswith(".avro")
    with open(head_ml, "rb") as f:
        assert f.read(4) == b"Obj\x01"  # Avro OCF magic (spec 1.x)

    manifests, _ = read_avro_records(spark, head_ml)
    assert manifests, "empty manifest list"
    data_rows = 0
    saw_delete = False
    for m in manifests:
        assert m["manifest_length"] == os.path.getsize(m["manifest_path"])
        entries, fmeta = read_avro_records(spark, m["manifest_path"])
        if fmeta.get("content") == "deletes":
            saw_delete = True
            assert all(
                e["data_file"]["equality_ids"] == [1] for e in entries
            )
            continue
        assert fmeta.get("content") == "data"
        for e in entries:
            df = e["data_file"]
            assert os.path.exists(df["file_path"])
            data_rows += df["record_count"]
            # Bounds are the spec's k/v-record arrays with BINARY
            # single-value payloads; user_id (field id 1) is a long —
            # 8 bytes little-endian (Avro's toString renders bytes as
            # an ISO-8859-1-escaped JSON string).
            lb = {kv["key"]: kv["value"] for kv in df["lower_bounds"]}
            assert 1 in lb
            import struct as _struct

            lo = _struct.unpack("<q", lb[1].encode("latin-1"))[0]
            assert 0 <= lo < 100  # user_id range in the fixture
    assert saw_delete
    assert data_rows == 110  # same physical rows as the JSON export


_SPEC_ENTRY_IDS = {
    "status": 0,
    "snapshot_id": 1,
    "sequence_number": 3,
    "file_sequence_number": 4,
    "data_file": 2,
}
_SPEC_DATA_FILE_IDS = {
    "content": 134,
    "file_path": 100,
    "file_format": 101,
    "partition": 102,
    "record_count": 103,
    "file_size_in_bytes": 104,
    "null_value_counts": 110,
    "lower_bounds": 125,
    "upper_bounds": 128,
}
_SPEC_MANIFEST_FILE_IDS = {
    "manifest_path": 500,
    "manifest_length": 501,
    "partition_spec_id": 502,
    "content": 517,
    "sequence_number": 515,
    "min_sequence_number": 516,
    "added_snapshot_id": 503,
    "added_files_count": 504,
    "existing_files_count": 505,
    "deleted_files_count": 506,
    "added_rows_count": 512,
    "existing_rows_count": 513,
    "deleted_rows_count": 514,
    "partitions": 507,
}


def test_avro_schemas_match_iceberg_spec_field_ids(table, spark):
    # VERDICT r5 #3 done-criterion: structural validation of the Avro
    # export against the Iceberg spec's record/field names and ids (no
    # pyiceberg runtime needed — the writer schemas embedded in the OCF
    # headers are what a mounting engine resolves against).
    from deathmetal_datalake_spark.sources.iceberg_export import read_avro_records

    meta = _load(table.export_iceberg_metadata(codec="avro"))
    head_ml = meta["snapshots"][-1]["manifest-list"]
    _, ml_meta = read_avro_records(spark, head_ml)
    ml_schema = ml_meta["avro.schema"]
    assert ml_schema["name"] == "manifest_file"
    got = {f["name"]: f["field-id"] for f in ml_schema["fields"]}
    assert got == _SPEC_MANIFEST_FILE_IDS

    # field_summary (r508): spec ids 509/518/510/511 under partitions.
    part_field = next(f for f in ml_schema["fields"] if f["name"] == "partitions")
    arr = [t for t in part_field["type"] if isinstance(t, dict)][0]
    assert arr["element-id"] == 508
    fs = {f["name"]: f["field-id"] for f in arr["items"]["fields"]}
    assert fs == {
        "contains_null": 509,
        "contains_nan": 518,
        "lower_bound": 510,
        "upper_bound": 511,
    }

    manifests, _ = read_avro_records(spark, head_ml)
    data_m = [m for m in manifests if m["content"] == 0][0]
    # The summary VALUE: one bucket[4] field, lower == upper == the
    # dir's bucket, int32 little-endian.
    summ = data_m["partitions"][0]
    assert summ["contains_null"] is False
    import struct as _struct2

    bucket = _struct2.unpack("<i", summ["lower_bound"]["bytes"].encode("latin-1"))[0] \
        if isinstance(summ["lower_bound"], dict) else \
        _struct2.unpack("<i", summ["lower_bound"].encode("latin-1"))[0]
    assert 0 <= bucket < 4
    assert summ["lower_bound"] == summ["upper_bound"]
    del_m = [m for m in manifests if m["content"] == 1][0]
    _, fmeta = read_avro_records(spark, data_m["manifest_path"])
    entry = fmeta["avro.schema"]
    assert entry["name"] == "manifest_entry"
    got = {f["name"]: f["field-id"] for f in entry["fields"]}
    assert got == _SPEC_ENTRY_IDS
    df_schema = next(f for f in entry["fields"] if f["name"] == "data_file")["type"]
    assert df_schema["name"] == "r2"
    got = {f["name"]: f["field-id"] for f in df_schema["fields"]}
    assert got == _SPEC_DATA_FILE_IDS

    # Non-string-key maps use the spec's k/v-record array encoding.
    by_name = {f["name"]: f["type"] for f in df_schema["fields"]}
    for fld, (kid, vid, vtype) in {
        "null_value_counts": (121, 122, "long"),
        "lower_bounds": (126, 127, "bytes"),
        "upper_bounds": (129, 130, "bytes"),
    }.items():
        t = by_name[fld]
        assert t["type"] == "array" and t.get("logicalType") == "map"
        kv = {f["name"]: (f["field-id"], f["type"]) for f in t["items"]["fields"]}
        assert kv["key"] == (kid, "int") and kv["value"] == (vid, vtype)

    # Partition struct r102: typed fields carrying the 1000+ spec ids.
    part = by_name["partition"]
    assert part["name"] == "r102"
    pf = part["fields"][0]
    assert pf["field-id"] == 1000 and pf["type"] == ["null", "int"]  # bucket[4]

    # Delete manifests: equality_ids with spec ids 135/136.
    _, dmeta = read_avro_records(spark, del_m["manifest_path"])
    ddf = next(
        f for f in dmeta["avro.schema"]["fields"] if f["name"] == "data_file"
    )["type"]
    eq = next(f for f in ddf["fields"] if f["name"] == "equality_ids")
    assert eq["field-id"] == 135
    assert eq["type"]["items"] == "int" and eq["type"]["element-id"] == 136


def test_export_honors_registry_without_subsequent_write(spark, tmp_path):
    # ADVICE r5 (medium): a rename/drop/widen with NO data write after it
    # is a pure-metadata commit — the newest footer still carries the old
    # physical names. The export must follow the registry's current
    # epoch: new logical name under the ORIGINAL field id, dropped
    # column absent, declared widened type honored — and the pre-rename
    # dir's bounds still keyed to the permanent field id.
    from pyspark.sql import functions as F

    from deathmetal_datalake_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl3"))
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"),
        F.lit("x").alias("junk"),
    )
    t.write(df, mode="overwrite")
    t.rename_column("v", "value")
    t.drop_column("junk")
    t.widen_column("value", "long")
    # NO write after the evolution: export must not sample the footer.
    meta = _load(t.export_iceberg_metadata())
    fields = {f["name"]: f for f in meta["schemas"][0]["fields"]}
    assert set(fields) == {"k", "value"}  # logical names; junk gone
    assert fields["value"]["id"] == 2  # permanent id preserved
    assert fields["value"]["type"] == "long"  # declared widening wins
    assert fields["k"]["type"] == "long"
    # Bounds in the (pre-rename) dir's manifest resolve via the write
    # epoch's physical naming to the permanent id of `value` (2).
    mdir = os.path.join(t.base_path, "metadata")
    manifests = [f for f in os.listdir(mdir) if f.startswith("manifest-")]
    assert manifests
    saw_value_bound = False
    for m in manifests:
        doc = _load(os.path.join(mdir, m))
        for e in doc.get("entries", []):
            lb = e["data_file"].get("lower_bounds") or {}
            saw_value_bound = saw_value_bound or "2" in {str(k) for k in lb}
    assert saw_value_bound, "pre-rename dir bounds lost their field-id mapping"
