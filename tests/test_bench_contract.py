"""Pin the bench stdout contract (round-13 verdict #1).

The driver's stdout capture keeps only the LAST 2000 characters and
parses exactly one JSON line from it. Rounds 12-13 ran blind because the
old two-step degrade dropped the ``queries`` dict once 58 headline
queries overflowed the 1950-char budget. ``render_compact_line`` now
sheds precision and derivable envelope fields level by level and never
drops ``queries`` — these tests pin that against the REAL
``BENCH_QUERIES`` names at realistic and pessimistic magnitudes.

No SparkSession is needed: importing bench only imports pyspark.
"""

from __future__ import annotations

import json

import bench


def _payload(qval: float, scale_qval: float | None = None) -> dict:
    med = {n: qval for n in bench.BENCH_QUERIES}
    p = {
        "metric": "headline_queries_total",
        "value": round(sum(med.values()), 3),
        "value_min": round(sum(med.values()) * 0.9, 3),
        "core30_total": round(qval * len(bench.CORE_QUERIES), 3),
        "core30_min": round(qval * len(bench.CORE_QUERIES) * 0.9, 3),
        "canary": 0.403,
        "canary_min": 0.301,
        "canary2": 0.131,
        "canary2_min": 0.121,
        "host_cpus": 32,
        "host_load1": 1.25,
        "unit": "sec",
        "queries": med,
        "queries_min": {n: round(qval * 0.9, 3) for n in med},
        "reps": 3,
        "sf": 0.1,
    }
    if scale_qval is not None:
        smed = {n: scale_qval for n in bench.BENCH_QUERIES}
        p["scale"] = {
            "metric": "headline_queries_total_scale",
            "value": round(sum(smed.values()), 3),
            "value_min": round(sum(smed.values()) * 0.9, 3),
            "core30_total": round(scale_qval * len(bench.CORE_QUERIES), 3),
            "core30_min": round(scale_qval * len(bench.CORE_QUERIES) * 0.9, 3),
            "canary": 0.397,
            "canary_min": 0.29,
            "canary2": 0.115,
            "canary2_min": 0.106,
            "host_load1": 1.25,
            "unit": "sec",
            "queries": smed,
            "queries_min": {n: round(scale_qval * 0.9, 3) for n in smed},
            "reps": 2,
            "sf": "0.1x10",
            "ratio_vs_base": round(sum(smed.values()) / sum(med.values()), 3),
        }
    return p


def test_realistic_two_scale_line_fits_and_keeps_queries():
    # Round-13 magnitudes: base ~2 s/query, 10x ~6 s/query.
    line = bench.render_compact_line(_payload(2.345, 5.897))
    assert len(line) <= 1950
    d = json.loads(line)
    assert set(d["queries"]) == set(bench.BENCH_QUERIES)
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
    # Envelope fields the driver normalizes/judges by must survive.
    assert d["metric"] == "headline_queries_total"
    assert d["unit"] == "sec" and d["sf"] == 0.1
    assert "value" in d and "canary" in d
    # The scale block may degrade to a pointer under uniform-worst-case
    # value widths (real records keep it — pinned below), but one of
    # the two must be present.
    if "scale" in d:
        assert d["scale"]["sf"] == "0.1x10" and "ratio_vs_base" in d["scale"]
    else:
        assert d["scale_in"] == "docs/BENCH_FULL.json"


def test_pessimistic_magnitudes_still_fit():
    # Every query at ~100 s on both scales (a 5800 s bench — far beyond
    # anything recorded) must still render <= 1950 with all names.
    line = bench.render_compact_line(_payload(99.994, 99.994))
    assert len(line) <= 1950
    d = json.loads(line)
    assert set(d["queries"]) == set(bench.BENCH_QUERIES)


def test_absolute_floor_never_drops_queries_and_fits_capture():
    # Even at an absurd 1000 s/query the floor keeps the per-query dict
    # and stays inside the driver's 2000-char tail capture.
    line = bench.render_compact_line(_payload(999.994, 999.994))
    assert len(line) < 2000
    d = json.loads(line)
    assert set(d["queries"]) == set(bench.BENCH_QUERIES)


def test_small_payload_uses_full_precision_medians():
    p = _payload(2.345, 5.897)
    p["queries"] = {"tpch_q1_pricing_summary": 1.234}
    p["queries_min"] = {"tpch_q1_pricing_summary": 1.111}
    d = json.loads(bench.render_compact_line(p))
    # Level 0: medians at 2dp, full envelope incl. value_min + core30.
    assert d["queries"] == {"tpch_q1_pricing_summary": 1.23}
    assert "value_min" in d and "core30" in d
    assert "qstat" not in d
    assert "core30" in d["scale"]


def test_no_scale_block_payload():
    line = bench.render_compact_line(_payload(2.345))
    d = json.loads(line)
    assert len(line) <= 1950
    assert "scale" not in d and "scale_in" not in d
    assert set(d["queries"]) == set(bench.BENCH_QUERIES)


def test_degrade_marks_minima_with_qstat():
    # At realistic 58-query magnitudes the medians-at-2dp level
    # overflows, so the line carries minima and must say so.
    d = json.loads(bench.render_compact_line(_payload(2.345, 5.897)))
    assert d["qstat"] == "min"
    # minima at 1dp, not medians: 2.345*0.9 = 2.1105 -> 2.1
    assert d["queries"]["tpch_q1_pricing_summary"] == 2.1


def test_canary_survives_every_level():
    # The cross-record normalizer is most needed exactly when the host
    # is dirty and query times (hence the line) are long: it must
    # survive even the absolute floor.
    for qv in (2.345, 99.994, 999.994):
        d = json.loads(bench.render_compact_line(_payload(qv, qv)))
        assert d["canary"] == 0.4


def test_real_r13_records_keep_scale_summary():
    # The committed round-13 full records are the realistic worst
    # cases observed so far; both must keep at least the reduced scale
    # block (value + ratio_vs_base) alongside 1dp per-query minima.
    import os

    for fname in ("BENCH_ROUNDEND_r13opt.json", "BENCH_FULL.json"):
        path = os.path.join(os.path.dirname(bench.__file__), "docs", fname)
        with open(path) as fh:
            p = json.load(fh)
        line = bench.render_compact_line(p)
        assert len(line) <= 1950
        d = json.loads(line)
        assert set(d["queries"]) == set(p["queries_min"])
        assert "canary" in d
        assert "value" in d["scale"] and "ratio_vs_base" in d["scale"]
