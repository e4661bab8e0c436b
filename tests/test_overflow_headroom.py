"""Catalog-wide 2^63 overflow-headroom gate (round-11, VERDICT r10 #4).

The r9 LM-surprisal finding was a CLASS, not an instance: Spark wraps
BIGINT arithmetic silently while DuckDB promotes to HUGEINT, so an
integer sum/product that fits at test scale can diverge (or corrupt)
at 100 TB. This gate executes every registered oracle at sf0.001 and
asserts that each integer-typed output column, scaled LINEARLY to the
100 TB design point (1 MB -> 100 TB is ~1e8x rows), stays inside
2^62 — one spare bit below the BIGINT boundary.

Linear growth is the conservative default for sums and counts; columns
whose magnitude is bounded by CONSTRUCTION rather than data volume
(fixed-width hashes, time spans, bit-widths, bounded domains) are
exempted one-by-one with the bounding argument. A new query whose
integer output exceeds the limit fails here until it either
accumulates in DECIMAL(38,0) (the LM-surprisal /
catalog_type_widening_read convention: exact to ~1e38, rendered as
VARCHAR for the hasher) or lands on this list with a reason.

Output columns are a proxy for accumulation maxima: sum-shaped queries
surface their largest intermediate as (or adjacent to) an output. The
intermediates Spark never materializes (e.g. pre-division numerators)
are covered by the same convention at the code-review layer — every
DECIMAL(19,0)->DECIMAL(38,0) product site cites it.
"""

from __future__ import annotations

from deathmetal_datalake_spark.plans import ORACLES
from tests.oracle_harness import duckdb_connection

SF_DIR = "/root/testdata/sf0.001"

# 1 MB (sf0.001) -> 100 TB is ~1e8x the rows; keep one spare bit.
SCALE_TO_100TB = 10**8
LIMIT = (1 << 62) // SCALE_TO_100TB

INT_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT", "UBIGINT"}

# (query, column) -> why the value is bounded by construction, not by
# data volume (so linear scaling does not apply).
BOUNDED_BY_CONSTRUCTION = {
    # 60-bit md5-prefix hashes: the VALUE is domain-bounded at 2^60
    # regardless of corpus size; they are keys, never accumulated.
    ("dedup_exact", "content_hash"): "60-bit hash value, never summed",
    ("dedup_cluster_canonical", "content_hash"): "60-bit hash value",
    ("streaming_dedup_exact_replay", "content_hash"): "60-bit hash value",
    ("text_chunk_sliding_windows", "chunk_hash"): "60-bit hash value",
    ("text_blocklist_scrub", "redacted_hash"): "60-bit hash value",
    ("text_fingerprint", "fingerprint"): "60-bit winnowing hash value",
    ("sample_bottomk_uniform", "hash_key"): "60-bit hash sort key",
    # Per-user event gap in microseconds: bounded by the corpus TIME
    # SPAN (a 300-year span is ~1e16 us < 2^63), not by row count.
    ("events_lag_delta", "gap_micros"): "time-span-bounded gap",
    # KMV sketch state: the k-th smallest 60-bit hash VALUE — domain-
    # bounded at 2^60 and monotonically NON-INCREASING in row count
    # (more rows can only lower a minimum), never accumulated.
    ("streaming_kmv_distinct_replay", "min_hv"): "60-bit hash minimum",
}


def test_every_integer_output_has_100tb_headroom():
    con = duckdb_connection(SF_DIR)
    offenders = {}
    try:
        for name, sql in ORACLES.items():
            if sql is None:
                continue
            rel = con.sql(sql)
            ints = [
                c
                for c, t in zip(rel.columns, [str(t) for t in rel.types])
                if t in INT_TYPES
            ]
            if not ints:
                continue
            sel = ", ".join(
                f'MAX(ABS(CAST("{c}" AS HUGEINT))) AS "{c}"' for c in ints
            )
            row = con.sql(f"SELECT {sel} FROM ({sql})").fetchone()
            for c, v in zip(ints, row):
                if v is None or int(v) <= LIMIT:
                    continue
                if (name, c) in BOUNDED_BY_CONSTRUCTION:
                    continue
                offenders[(name, c)] = int(v)
    finally:
        con.close()
    assert not offenders, (
        "integer outputs without 2^63 headroom at 100 TB under linear "
        "scaling — accumulate in DECIMAL(38,0) (VARCHAR-rendered) or "
        f"annotate the bounding argument: {offenders}"
    )


def test_exception_list_entries_are_live():
    # Every annotated exception must still correspond to a registered
    # query — stale entries hide regressions behind dead names.
    for name, _col in BOUNDED_BY_CONSTRUCTION:
        assert name in ORACLES and ORACLES[name] is not None, name


def test_gate_would_catch_an_unsafe_sum():
    # Sanity: the detector flags a sum whose sf0.001 magnitude already
    # implies a 100 TB BIGINT wrap (the widening demo's old shape).
    con = duckdb_connection(SF_DIR)
    try:
        v = con.sql(
            "SELECT MAX(ABS(CAST(s AS HUGEINT))) FROM (SELECT "
            "CAST(SUM(o_custkey + 3000000000) AS BIGINT) AS s FROM orders)"
        ).fetchone()[0]
    finally:
        con.close()
    assert int(v) > LIMIT
