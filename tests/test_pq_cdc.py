"""Structural invariants for the PQ ANN family and content-defined
chunking — properties the value-hash oracle can't state directly
(tiling, bounds, monotonicity), checked at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from deathmetal_datalake_spark.plans.dedup import dedup_content_chunks
from deathmetal_datalake_spark.plans.similarity import (
    _PQ_M,
    _PQ_SUB,
    _pq_codebook,
    _pq_codes,
    embedding_pq_distortion,
    similarity_pq_adc_topk,
    similarity_pq_recall,
    _as_double,
)
from deathmetal_datalake_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _vecs(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", _as_double("embedding").alias("emb")
    )


def test_pq_codes_cover_every_vector_and_subspace(spark):
    vecs = _vecs(spark)
    n = vecs.count()
    codes = _pq_codes(vecs)
    # Exactly one code per (vector, subspace); M subspaces per vector.
    assert codes.count() == n * _PQ_M
    per_vec = codes.groupBy("vec_id").agg(
        F.countDistinct("m").alias("nm"), F.count(F.lit(1)).alias("nc")
    )
    assert per_vec.filter((F.col("nm") != _PQ_M) | (F.col("nc") != _PQ_M)).count() == 0


def test_pq_codes_point_into_codebook(spark):
    vecs = _vecs(spark)
    cb = _pq_codebook(vecs).select("m", F.col("cid").alias("code")).distinct()
    codes = _pq_codes(vecs).select("m", "code").distinct()
    assert codes.join(cb, ["m", "code"], "left_anti").count() == 0


def test_pq_codeword_subvector_width(spark):
    cb = _pq_codebook(_vecs(spark))
    bad = cb.filter(F.size("cwsub") != _PQ_SUB)
    assert bad.count() == 0


def test_pq_seed_vectors_have_zero_distortion(spark):
    """A codeword's own source vector quantizes to itself: d == 0."""
    vecs = _vecs(spark)
    seed_ids = {r.cid for r in _pq_codebook(vecs).select("cid").distinct().collect()}
    assert seed_ids, "no seeds at this SF"
    codes = _pq_codes(vecs).filter(F.col("vec_id").isin(list(seed_ids)))
    assert codes.filter((F.col("code") != F.col("vec_id")) | (F.col("d") != 0.0)).count() == 0


def test_pq_adc_ranks_are_dense_per_query(spark):
    top = similarity_pq_adc_topk(spark, SF_SMOKE)
    per_q = top.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.min("approx_dist").alias("dmin"),
    )
    rows = per_q.collect()
    assert rows
    for r in rows:
        assert r.rmin == 1 and r.rmax == r.k  # dense 1..k
        assert r.dmin >= 0.0  # L2² is non-negative

    # Ranks follow approx_dist ascending with vec_id tie-break.
    w_ok = top.withColumn(
        "ok",
        F.lead("approx_dist").over(Window.partitionBy("query_id").orderBy("rank"))
        >= F.col("approx_dist"),
    )
    assert w_ok.filter(F.col("ok") == False).count() == 0  # noqa: E712


def test_pq_recall_bounded(spark):
    rec = similarity_pq_recall(spark, SF_SMOKE).collect()
    assert rec
    for r in rec:
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0 <= r.n_hits <= 10


def test_pq_distortion_rows_and_bounds(spark):
    rows = embedding_pq_distortion(spark, SF_SMOKE).collect()
    assert {r.m for r in rows} == set(range(_PQ_M))
    n = _vecs(spark).count()
    for r in rows:
        assert r.mean_sq_err >= 0.0
        assert r.n_vecs == n
        assert 1 <= r.n_codes_used <= 16


def test_cdc_chunks_tile_documents_exactly(spark):
    """bytes_total == Σ doc lengths: chunk spans tile every document
    with no gap or overlap (the defining CDC property)."""
    row = dedup_content_chunks(spark, SF_SMOKE).collect()[0]
    total_chars = (
        load_table(spark, SF_SMOKE, "documents")
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    assert row.bytes_total == total_chars
    assert row.n_docs == load_table(spark, SF_SMOKE, "documents").count()
    assert row.bytes_dedup <= row.bytes_total
    assert row.n_distinct_chunks <= row.n_chunks
    assert 0.0 < row.dedup_ratio <= 1.0


# ---- CDC reference implementation + the byte-shift-locality property ----

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

_WIN, _DIV = 8, 64


def _ref_bounds(text: str) -> list[int]:
    """Interior boundary positions (1-based), the Python mirror of the
    Spark/DuckDB expression in plans.dedup._cdc_chunks."""
    n = len(text)
    out = []
    for i in range(1, max(n - (_WIN - 1), 1) + 1):
        h = int(hashlib.md5(text[i - 1 : i - 1 + _WIN].encode()).hexdigest()[:15], 16)
        if h % _DIV == 0:
            out.append(i)
    return out


def _ref_chunks(text: str) -> list[tuple[int, int]]:
    b = [1] + _ref_bounds(text) + [len(text) + 1]
    return [(b[j], b[j + 1] - b[j]) for j in range(len(b) - 1) if b[j + 1] > b[j]]


def test_cdc_spark_matches_python_reference(spark):
    """Pin the Spark expression chunker to the reference byte-for-byte
    on real documents, so the hypothesis properties below transfer."""
    from deathmetal_datalake_spark.plans.dedup import _cdc_chunks
    from deathmetal_datalake_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(20)
    got = {
        (r.doc_id, r.ln, r.ch)
        for r in _cdc_chunks(docs).collect()
    }
    want = set()
    for r in docs.collect():
        for st_, ln in _ref_chunks(r.text):
            chunk = r.text[st_ - 1 : st_ - 1 + ln]
            ch = int(hashlib.md5(chunk.encode()).hexdigest()[:15], 16)
            want.add((r.doc_id, ln, ch))
    assert got == want


@given(
    st.text(alphabet="abcdefgh ", min_size=_WIN, max_size=300),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_cdc_boundary_locality_under_insertion(text, data):
    """The defining CDC property: inserting one character only disturbs
    boundaries whose hash window overlaps the insertion point —
    everything before shifts not at all, everything after shifts by
    exactly one. (Fixed-width blocks fail this: one insert realigns
    every later block.)"""
    p = data.draw(st.integers(min_value=0, max_value=len(text)))
    c = data.draw(st.sampled_from("abcdefgh "))
    text2 = text[:p] + c + text[p:]
    b1, b2 = set(_ref_bounds(text)), set(_ref_bounds(text2))
    lo = p - _WIN + 1  # windows entirely before the insert
    assert {b for b in b1 if b <= lo} == {b for b in b2 if b <= lo}
    assert {b + 1 for b in b1 if b >= p + 1} == {b for b in b2 if b >= p + 2}


@given(st.text(alphabet="abcdefgh ", min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_cdc_chunks_tile_any_string(text):
    chunks = _ref_chunks(text)
    assert sum(ln for _, ln in chunks) == len(text)
    pos = 1
    for st_, ln in chunks:
        assert st_ == pos and ln > 0
        pos += ln
