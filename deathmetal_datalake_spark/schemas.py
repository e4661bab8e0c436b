"""Single-sourced entity schemas for the deathmetal medallion pipeline.

The reference keeps three divergent schema regimes (inferred bronze,
per-task dicts in silver, Trino DDL — SURVEY.md §1.2) and its DDL
contradicts its flows (e.g. DDL reviews has reviewer/created_at while
the data has title/content; DDL music_catalog omits theme). Per
SURVEY.md §1.2 the flows are the behavioral source of truth; these
StructTypes encode exactly the silver-typed shapes of
``flows/silver.py:57-62`` (albums), ``:73-95`` (bands), ``:100-115``
(reviews) and the mart projections ``:119-145``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# Silver entity contracts (post-cast). `flows/silver.py:57-62,73-95,100-115`.
ALBUMS = _st(
    ("id", LongType()),
    ("title", StringType()),
    ("band", LongType()),
    ("year", LongType()),
)

BANDS = _st(
    ("id", LongType()),
    ("name", StringType()),
    ("country", StringType()),
    ("genre", StringType()),
    ("theme", StringType()),
    ("status", StringType()),
    ("formed_in", LongType()),
    ("active", StringType()),
    ("start_year", LongType()),
)

REVIEWS = _st(
    ("id", LongType()),
    ("album", LongType()),
    ("title", StringType()),
    ("score", DoubleType()),
    ("content", StringType()),
)

# Silver marts. `flows/silver.py:119-134` and `:138-145`.
MUSIC_CATALOG = _st(
    ("album_id", LongType()),
    ("album_title", StringType()),
    ("year", LongType()),
    ("band_id", LongType()),
    ("band_name", StringType()),
    ("country", StringType()),
    ("genre", StringType()),
    ("theme", StringType()),
)

ALBUM_REVIEWS = _st(
    ("review_id", LongType()),
    ("album_id", LongType()),
    ("album_title", StringType()),
    ("score", DoubleType()),
    ("content", StringType()),
)

# Required input columns per entity (presence-only validation —
# `flows/silver.py:48-52`).
REQUIRED_COLUMNS = {
    "albums": ["id", "title", "band", "year"],
    "bands": ["id", "name", "country", "genre", "theme", "status", "formed_in", "active"],
    # `title` intentionally absent: the reference validates reviews on
    # {id, album, score, content} only (flows/silver.py:100-105).
    "reviews": ["id", "album", "score", "content"],
}

DATASETS = ("albums", "bands", "reviews")
