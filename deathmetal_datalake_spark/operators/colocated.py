"""Bucket-colocated joins over hidden-partitioned snapshot tables —
the storage-partitioned-join pattern (Spark SPJ / Iceberg
bucket-transform joins, Hive bucketed joins) re-expressed over the
native snapshot format.

Two tables declared with the SAME ``bucket[n]`` transform on their join
keys route equal keys to equal bucket values by construction (the
transform is the engine's shared 60-bit md5 convention — see
``sources/snapshots._transform_column``). A join can therefore run as
``n`` INDEPENDENT per-bucket joins, each reading only the two dirs that
can possibly match, unioned:

- **No full-table shuffle**: the classic hash join exchanges BOTH
  tables across the cluster on the key; here the bucket dirs are the
  pre-shuffled layout, so each sub-join's inputs are bucket-sized. On
  a 100 TB pair this converts the dominant network cost of the join
  into local scans (with co-located bucket placement, node-local ones).
- Locally each bucket-sized sub-join is small enough that Spark plans
  a broadcast — the executed plan contains no hashpartitioning
  exchange and no sort-merge of either full table
  (``tests/test_colocated.py`` pins this).

Scope contract (validated, with actionable errors): both heads fully
bucket-partitioned on the join keys with equal n (pre-spec dirs →
``compact()`` re-buckets under the current spec), and no pending
delete vectors (``fold_deletes()`` first — automatic past the
threshold). ``how`` supports ``inner`` and ``left``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from deathmetal_datalake_spark.sources.snapshots import SnapshotTable, _parse_transform


def _bucket_entry(tbl: SnapshotTable, key: str) -> tuple[str, int]:
    """(partition name, n) of the bucket transform on ``key`` in the
    table's CURRENT spec."""
    for e in tbl.partition_spec():
        kind, arg = _parse_transform(e["transform"])
        if kind == "bucket" and e["source"] == key:
            return e["name"], arg
    raise ValueError(
        f"table {tbl.base_path!r} has no bucket[...] partition spec on "
        f"{key!r}; declare set_partition_spec([('bucket[n]', {key!r})]) "
        "and rewrite (compact) first"
    )


def _bucket_dirs(tbl: SnapshotTable, pname: str) -> dict[str, list[str]]:
    """bucket value → data dirs of the head, validating full coverage."""
    head = tbl._load_snapshot(tbl.current_snapshot_id())
    if head.deletes:
        raise ValueError(
            f"table {tbl.base_path!r} has pending delete vectors; run "
            "fold_deletes() before a colocated join (reads outside "
            "read() cannot replay them)"
        )
    out: dict[str, list[str]] = {}
    for d in head.data_dirs:
        pv = head.dir_partitions.get(d, {})
        if pname not in pv:
            raise ValueError(
                f"data dir {d!r} predates the bucket spec; compact() the "
                "table to re-bucket it before a colocated join"
            )
        out.setdefault(pv[pname], []).append(d)
    return out


def bucket_colocated_join(
    left: SnapshotTable,
    right: SnapshotTable,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucket-partitioned snapshot tables as a union of
    per-bucket joins — equal keys share a bucket value by construction,
    so cross-bucket pairs cannot exist and are never read."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    lname, ln = _bucket_entry(left, left_key)
    rname, rn = _bucket_entry(right, right_key)
    if ln != rn:
        raise ValueError(
            f"bucket counts differ ({ln} vs {rn}); co-location requires "
            "the same bucket[n] on both sides"
        )
    spark = left.spark
    ldirs = _bucket_dirs(left, lname)
    rdirs = _bucket_dirs(right, rname)
    empty_right = right.read().limit(0)
    parts: list[DataFrame] = []
    for bucket, dl in sorted(ldirs.items()):
        lf = spark.read.option("mergeSchema", "true").parquet(*dl)
        dr = rdirs.get(bucket)
        if dr is None:
            if how == "left":
                rf = empty_right
            else:
                continue  # inner: a left-only bucket contributes nothing
        else:
            rf = spark.read.option("mergeSchema", "true").parquet(*dr)
        parts.append(lf.join(rf, on=lf[left_key] == rf[right_key], how=how))
    if not parts:
        le = left.read().limit(0)
        return le.join(empty_right, le[left_key] == empty_right[right_key], how)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
