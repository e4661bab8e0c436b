"""Corpus-assembly medallion: dedup -> quality -> sample -> pack, with a
DuckDB replica of every stage asserting exact end-to-end agreement."""

from __future__ import annotations

import duckdb

from deathmetal_datalake_spark.flows.corpus import (
    _DEFAULT_RATE,
    _MIN_TOKENS,
    _PACK_BUDGET,
    _SAMPLE_RATES,
    corpus_flow,
)
from deathmetal_datalake_spark.sources.tables import load_table
from deathmetal_datalake_spark.plans.registry import sql_hash60

SF = "/root/testdata/sf0.001"


def test_corpus_flow_stages(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = corpus_flow(spark, docs, str(tmp_path / "corpus"))
    assert set(out) == {"deduped", "quality", "sampled", "packed"}

    counts = {name: spark.read.parquet(path).count() for name, path in out.items()}
    assert counts["deduped"] <= docs.count()
    assert counts["quality"] <= counts["deduped"]
    assert counts["sampled"] <= counts["quality"]
    assert counts["packed"] == counts["sampled"]
    assert counts["sampled"] > 0

    # DuckDB replica of the full chain over the same input parquet.
    rate_case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items()
    ) + f" ELSE {_DEFAULT_RATE} END"
    con = duckdb.connect()
    want = con.execute(rf"""
        WITH docs AS (
            SELECT * FROM read_parquet('{SF}/documents.parquet')
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY {sql_hash60('text')} ORDER BY doc_id
                ) AS rn FROM docs
            ) WHERE rn = 1
        ),
        quality AS (
            SELECT doc_id, lang, source,
                   LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_tokens,
                   text
            FROM deduped
            WHERE LENGTH(string_split_regex(TRIM(text), '\s+')) >= {_MIN_TOKENS}
              AND CAST(LENGTH(TRIM(text)) - (LENGTH(string_split_regex(TRIM(text), '\s+')) - 1) AS DOUBLE)
                  / LENGTH(string_split_regex(TRIM(text), '\s+')) <= 12.0
        ),
        sampled AS (
            SELECT * FROM quality
            WHERE {sql_hash60('CAST(doc_id AS VARCHAR)')} % 100 < {rate_case}
        )
        SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // {_PACK_BUDGET} AS BIGINT) AS pack_id
        FROM sampled
        ORDER BY doc_id
    """).fetchall()
    got = sorted(
        (r["doc_id"], r["lang"], r["source"], r["n_tokens"], r["pack_id"])
        for r in spark.read.parquet(out["packed"]).collect()
    )
    assert got == [tuple(r) for r in want]
