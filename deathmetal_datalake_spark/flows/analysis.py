"""Ad-hoc analysis chain — the reference's ``main.py:13-86`` flagship.

Three sorted scans → rename → J1 left join → project → J3 right join →
project → J5 left join → project → two ``!= 'None'`` filters. The
reference re-executes every upstream plan at each of its six ``.show()``
calls (SURVEY.md §3.2); here intermediate marts are returned lazily and
the caller decides what to materialize (Spark caches shared subplans on
request via ``.cache()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.cleaning import clean_none_rows


def bands_albums(albums: DataFrame, bands: DataFrame) -> DataFrame:
    """`main.py:37-52`: albums ⟕ bands (differing key names band↔id)."""
    b = bands.withColumnRenamed("name", "band_name")
    return albums.join(b, albums.band == b.id, "left").select(
        albums.id.alias("album_id"),
        F.col("title").alias("album_title"),
        F.col("year").alias("year"),
        F.col("band_name").alias("band_name"),
        F.col("country").alias("country"),
    )


def albums_reviews(reviews: DataFrame, albums: DataFrame) -> DataFrame:
    """`main.py:54-67`: reviews ⟖ albums (right join on album↔id)."""
    return reviews.join(albums, reviews.album == albums.id, "right").select(
        reviews.id.alias("review_id"),
        albums.id.alias("album_id"),
        reviews.title.alias("review_title"),
        F.col("score").alias("score"),
    )


def full_dataset(bands_albums_df: DataFrame, albums_reviews_df: DataFrame) -> DataFrame:
    """`main.py:69-86`: J5 left join + projection + `!= 'None'` filters."""
    joined = bands_albums_df.join(albums_reviews_df, "album_id", "left").select(
        "album_id",
        "album_title",
        "year",
        "band_name",
        "country",
        "review_id",
        "score",
    )
    return clean_none_rows(joined, "band_name", "album_title")


def analysis_chain(albums: DataFrame, bands: DataFrame, reviews: DataFrame) -> DataFrame:
    """The full flagship chain over silver entity tables."""
    ba = bands_albums(albums.orderBy("id"), bands.orderBy("id"))
    ar = albums_reviews(reviews.orderBy("id"), albums.orderBy("id"))
    return full_dataset(ba, ar)
