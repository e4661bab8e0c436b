"""Contract tests for the corpus-gate operators added in round 4:
Bloom prefilter (no false negatives — the property that makes a Bloom
gate safe to put in front of an exact join), BPE merge-step weighting,
and the EWMA smoother's fixed points.

The oracle-parity suite already pins full value equality vs DuckDB;
these tests pin the SEMANTIC invariants on engineered inputs where the
interesting cases (cross-source duplicates, constant series) are
guaranteed to occur.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.dedup import dedup_bloom_prefilter
from deathmetal_datalake_spark.plans.events import events_ewma_smoothed
from deathmetal_datalake_spark.plans.text import text_bpe_merge_step


def _write_documents(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _doc(i, text, source):
    return Row(doc_id=i, text=text, lang="en", source=source, n_chars=len(text))


def test_bloom_prefilter_no_false_negatives(spark, tmp_path):
    """Every true member must be a bloom hit: per source,
    n_bloom_hits - n_false_pos == n_members exactly. Engineered corpus
    guarantees cross-source duplicates (members > 0) so the invariant
    is exercised, not vacuous."""
    rows = []
    # Reference sources src0/src1: 40 distinct texts.
    for i in range(40):
        rows.append(_doc(i, f"reference document number {i} with unique content", f"src{i % 2}"))
    # Candidates in src10: 10 exact copies of reference texts (members)
    # + 30 fresh texts.
    for i in range(10):
        rows.append(_doc(100 + i, f"reference document number {i} with unique content", "src10"))
    for i in range(30):
        rows.append(_doc(200 + i, f"candidate only text {i} never referenced", "src10"))
    d = _write_documents(spark, tmp_path, rows)
    out = {r["source"]: r for r in dedup_bloom_prefilter(spark, d).collect()}
    from deathmetal_datalake_spark.plans.registry import release_caches

    release_caches()
    assert set(out) == {"src10"}
    r = out["src10"]
    assert r["n_docs"] == 40
    assert r["n_members"] == 10  # the engineered duplicates
    # No false negatives: hits that are members == all members.
    assert r["n_bloom_hits"] - r["n_false_pos"] == r["n_members"]
    # Audit consistency: FPs are a subset of non-members.
    assert 0 <= r["n_false_pos"] <= r["n_docs"] - r["n_members"]


def test_bpe_merge_step_weighted_by_word_count(spark, tmp_path):
    """'ab ab ab' contributes the (a,b) pair 3x (word frequency), not
    1x (vocab presence) — the weighting that makes the merge choice
    match what a BPE trainer computes on the raw corpus."""
    rows = [
        _doc(1, "ab ab ab", "src0"),
        _doc(2, "cd", "src0"),
    ]
    d = _write_documents(spark, tmp_path, rows)
    out = {(r["left_sym"], r["right_sym"]): r["pair_count"] for r in text_bpe_merge_step(spark, d).collect()}
    assert out[("a", "b")] == 3
    assert out[("c", "d")] == 1


def test_ewma_fixed_points(spark, tmp_path):
    """First event: ewma == value (renormalized single tap). Constant
    series: ewma == the constant at every position (any weighting of a
    constant is the constant)."""
    d = str(tmp_path)
    rows = [
        Row(event_id=i, ts=i * 1_000_000_000, user_id=7, event_type="t", value=42.25, props="{}")
        for i in range(6)
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    out = events_ewma_smoothed(spark, d).orderBy("event_id").collect()
    assert len(out) == 6
    for r in out:
        assert r["ewma_value"] == pytest.approx(42.25, abs=0.0)
