"""Manifest Bloom filters: point-lookup dir skipping where range stats
can't prune (fully interleaved keys), with the no-false-negative
guarantee that makes the skip safe."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row

from deathmetal_datalake_spark.sources.snapshots import (
    SnapshotTable,
    _bloom_may_contain,
)


def _mk(spark, tmp_path, name="t"):
    return SnapshotTable(spark, str(tmp_path / name))


def _rows(spark, keys, tag):
    return spark.createDataFrame([Row(k=int(k), tag=tag) for k in keys])


def test_point_lookup_prunes_interleaved_dirs(spark, tmp_path):
    # Two dirs with fully overlapping [min, max] ranges (even/odd keys):
    # range stats alone keep both for every lookup; blooms must prune.
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["k"])
    evens = list(range(0, 100, 2))
    odds = list(range(1, 100, 2))
    tbl.write(_rows(spark, evens, "even"), "overwrite")
    tbl.write(_rows(spark, odds, "odd"), "append")

    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    assert len(snap.data_dirs) == 2
    blooms = {
        d: snap.dir_stats[d]["k"]["bloom"] for d in snap.data_dirs
    }  # harvested for every dir

    pruned_any = 0
    for key in range(100):
        kept, pruned = tbl.scan_dirs([("k", "=", key)])
        # No false negative: the dir truly holding the key is kept.
        holder = snap.data_dirs[key % 2 == 1]  # write order: even, odd
        assert holder in kept
        # scan_dirs honors exactly the stored bloom's verdict.
        expect_kept = {
            d for d in snap.data_dirs if _bloom_may_contain(blooms[d], key)
        }
        assert set(kept) == expect_kept
        pruned_any += len(pruned)
    # The filter genuinely prunes (interleaved keys defeat range stats,
    # so every pruned dir here is the bloom's work).
    assert pruned_any > 50


def test_bloom_pruned_read_equals_plain_filter(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["k"])
    tbl.write(_rows(spark, range(0, 60, 2), "even"), "overwrite")
    tbl.write(_rows(spark, range(1, 60, 2), "odd"), "append")
    full = tbl.read()
    for key in (0, 1, 17, 58, 999):  # incl. a key present nowhere
        got = sorted(map(tuple, tbl.read(filters=[("k", "=", key)]).collect()))
        want = sorted(map(tuple, full.filter(full.k == key).collect()))
        assert got == want


def test_in_list_uses_bloom(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["k"])
    tbl.write(_rows(spark, range(0, 50, 2), "even"), "overwrite")
    tbl.write(_rows(spark, range(1, 50, 2), "odd"), "append")
    # IN over keys from one dir only: the other dir may be pruned, and
    # the result must still be exact.
    got = sorted(
        r.k for r in tbl.read(filters=[("k", "in", [2, 4, 6])]).collect()
    )
    assert got == [2, 4, 6]
    kept, _pruned = tbl.scan_dirs([("k", "in", [2, 4, 6])])
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    assert snap.data_dirs[0] in kept  # the even dir always survives


def test_pre_declaration_dirs_scan_conservatively(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.write(_rows(spark, range(0, 60, 3), "mod0"), "overwrite")  # no bloom
    tbl.set_bloom_columns(["k"])
    tbl.write(_rows(spark, range(1, 60, 3), "mod1"), "append")
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    pre, post = snap.data_dirs
    assert "bloom" not in snap.dir_stats[pre]["k"]
    assert "bloom" in snap.dir_stats[post]["k"]
    # Key 20 (≡ 2 mod 3) lies INSIDE both dirs' [min, max] but exists
    # in neither: range stats keep both; the bloomless pre dir must be
    # kept (conservative) while the bloomed dir is free to prune. The
    # read is exact either way.
    kept, _ = tbl.scan_dirs([("k", "=", 20)])
    assert pre in kept
    assert tbl.read(filters=[("k", "=", 20)]).count() == 0


def test_string_column_eligible_float_column_not(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["name", "score"])
    df = spark.createDataFrame(
        [Row(name=f"user-{i}", score=i + 0.5) for i in range(20)]
    )
    tbl.write(df, "overwrite")
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    st = snap.dir_stats[snap.data_dirs[0]]
    assert "bloom" in st["name"]
    assert "bloom" not in st["score"]  # float: not bloom-eligible
    got = tbl.read(filters=[("name", "=", "user-7")]).collect()
    assert [r.name for r in got] == ["user-7"]


def test_bloom_survives_manifest_reload(spark, tmp_path):
    # The bloom must round-trip through the manifest JSON: a FRESH
    # table handle (new process analog) prunes identically.
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["k"])
    tbl.write(_rows(spark, range(0, 30, 2), "even"), "overwrite")
    tbl.write(_rows(spark, range(1, 30, 2), "odd"), "append")
    fresh = SnapshotTable(spark, tbl.base_path)
    kept_a, pruned_a = tbl.scan_dirs([("k", "=", 4)])
    kept_b, pruned_b = fresh.scan_dirs([("k", "=", 4)])
    assert (sorted(kept_a), sorted(pruned_a)) == (sorted(kept_b), sorted(pruned_b))


def test_compact_backfills_blooms(spark, tmp_path):
    # Dirs written before the declaration carry no bloom; compact()
    # rewrites the head through the normal write path, which harvests
    # blooms for the declared column — the backfill path.
    tbl = _mk(spark, tmp_path)
    tbl.write(_rows(spark, range(0, 40, 2), "even"), "overwrite")
    tbl.write(_rows(spark, range(1, 40, 2), "odd"), "append")
    tbl.set_bloom_columns(["k"])
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    assert all("bloom" not in snap.dir_stats[d]["k"] for d in snap.data_dirs)
    tbl.compact(target_files=2)
    snap2 = tbl._load_snapshot(tbl.current_snapshot_id())
    assert all("bloom" in snap2.dir_stats[d]["k"] for d in snap2.data_dirs)
    # And the backfilled blooms are live: exact read + real pruning
    # machinery on the compacted layout.
    got = sorted(r.k for r in tbl.read(filters=[("k", "=", 8)]).collect())
    assert got == [8]


# ---- property: blooms never false-negative, across types ------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from deathmetal_datalake_spark.sources.snapshots import _bloom_positions

_key = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=24
    ),
)


@settings(max_examples=300, deadline=None)
@given(keys=st.sets(_key, min_size=1, max_size=200), probe=_key)
def test_bloom_membership_property(keys, probe):
    """Pure-layer property behind the filesystem tests: build the
    position set exactly as the harvest does, then (a) every inserted
    key is always contained (no false negative — the correctness side
    of pruning), and (b) containment is str()-canonical, so an int and
    a string with the same rendering collide only in the SAFE
    direction (kept, never pruned)."""
    m = 1 << ((max(len(keys), 2) - 1).bit_length() + 3)
    pos: set[int] = set()
    for k in keys:
        pos.update(_bloom_positions(k, m))
    bloom = {"m": m, "k": 2, "pos": sorted(pos)}
    for k in keys:
        assert _bloom_may_contain(bloom, k)
    # A probe whose str() matches an inserted key's str() must be
    # contained (the type-collision safety direction).
    if any(str(probe) == str(k) for k in keys):
        assert _bloom_may_contain(bloom, probe)


def test_per_file_blooms_prune_within_a_dir(spark, tmp_path):
    # File-level blooms: inside ONE surviving dir, scan_files consults
    # each file's own bloom — the parquet/puffin row-group analog that
    # keeps skipping alive after appends land as multi-file dirs.
    tbl = _mk(spark, tmp_path)
    tbl.set_bloom_columns(["k"])
    # One write, several files (shuffled partitions).
    tbl.write(_rows(spark, range(200), "x").repartition(4), "overwrite")
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    (d,) = snap.data_dirs
    fs = snap.file_stats[d]
    with_bloom = [rel for rel in fs if "bloom" in fs[rel].get("k", {})]
    assert with_bloom, "per-file blooms must be harvested"
    # Every key's true file is always kept; scan_files equals the
    # stored file blooms' own verdict (wiring, not luck).
    from deathmetal_datalake_spark.sources.snapshots import _dir_may_match

    pruned_total = 0
    for key in range(0, 200, 17):
        kept, pruned = tbl.scan_files([("k", "=", key)])
        expect = {
            os.path.join(d, rel)
            for rel in fs
            if _dir_may_match(fs[rel], [("k", "=", key)])
        }
        assert set(kept) == expect
        pruned_total += len(pruned)
        got = [r.k for r in tbl.read(filters=[("k", "=", key)]).collect()]
        assert got == [key]
    assert pruned_total > 0  # file-level skipping genuinely happens


def test_blooms_compose_with_hidden_partitioning(spark, tmp_path):
    # A declared partition spec writes per-value subdirs; blooms must
    # be harvested per PARTITION dir and compose with spec pruning —
    # a lookup first prunes by spec arithmetic, then by bloom, and the
    # read stays exact.
    from pyspark.sql import Row as R

    tbl = _mk(spark, tmp_path)
    tbl.set_partition_spec([("bucket[2]", "grp")])
    tbl.set_bloom_columns(["k"])
    rows = [R(grp=i % 4, k=int(i), tag="x") for i in range(80)]
    tbl.write(spark.createDataFrame(rows), "overwrite")
    snap = tbl._load_snapshot(tbl.current_snapshot_id())
    assert len(snap.data_dirs) >= 2  # per-bucket dirs
    assert all(
        "bloom" in snap.dir_stats[d]["k"] for d in snap.data_dirs
    )  # every partition dir harvested
    for key in (0, 7, 33, 79, 555):
        got = sorted(r.k for r in tbl.read(filters=[("k", "=", key)]).collect())
        assert got == ([key] if key < 80 else [])


def test_bitset_representation_equivalence():
    # Dense filters auto-pack into base64 bitsets; the membership
    # verdict must be identical to the list form for every key and
    # for absent probes.
    import base64

    from deathmetal_datalake_spark.sources.snapshots import _bloom_from_distinct

    keys = set(range(5000))
    bloom = _bloom_from_distinct(keys)
    assert "bits" in bloom and "pos" not in bloom  # packed by default
    # Rebuild the equivalent list form from the bitset and compare
    # verdicts across inserted keys and a band of absent probes.
    raw = base64.b64decode(bloom["bits"])
    pos = [
        i * 8 + b for i, byte in enumerate(raw) for b in range(8) if byte >> b & 1
    ]
    as_list = {"m": bloom["m"], "k": bloom["k"], "pos": pos}
    for probe in list(keys)[:500] + list(range(100000, 100200)):
        assert _bloom_may_contain(bloom, probe) == _bloom_may_contain(
            as_list, probe
        )
    for k in keys:
        assert _bloom_may_contain(bloom, k)  # never a false negative


def test_legacy_list_form_still_honored():
    # Manifests written before packing landed carry position LISTS;
    # the membership check must keep honoring them forever (old
    # snapshots stay time-travelable).
    from deathmetal_datalake_spark.sources.snapshots import _bloom_positions

    m = 256
    pos = sorted({p for k in (1, 2, 3) for p in _bloom_positions(k, m)})
    legacy = {"m": m, "k": 2, "pos": pos}
    for k in (1, 2, 3):
        assert _bloom_may_contain(legacy, k)
    assert not all(_bloom_may_contain(legacy, k) for k in range(50, 90))
