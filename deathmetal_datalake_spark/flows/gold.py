"""Gold flow: the four analytical marts + the ranking view.

Reference: ``flows/gold.py:76-167`` and the Trino view
``scripts/trino_create_tables.sql:114-121``. Determinism fixes applied
per SURVEY.md §7.4: O5's head(10)-after-sort becomes row_number with a
band_id tie-break; O1/O2's sort-direction disagreement resolves to the
Daft variant (country asc, count desc); counts are row-counts.

The reference materializes music/reviews twice (once for the empty
guard, once per mart — ``flows/gold.py:151`` then ``:62``); here the
two inputs are cached once and every mart reuses the cached plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deathmetal_datalake_spark.operators.aggregates import grouped_stats
from deathmetal_datalake_spark.operators.cleaning import normalize_country
from deathmetal_datalake_spark.operators.topk import top_n_per_group

_BRAZIL_VARIANTS = ["brazil", "brasil"]


def _reviews_with_bands(reviews: DataFrame, music: DataFrame) -> DataFrame:
    """J4 enrichment (`flows/gold.py:85,101`): album_reviews ⟕ music_catalog."""
    return reviews.join(
        music.select("album_id", "band_id", "band_name", "country"), "album_id", "left"
    )


def top10_by_country(reviews: DataFrame, music: DataFrame) -> DataFrame:
    """G1+O2+O5 (`flows/gold.py:82-94`): per-country top-10 bands by
    review count; deterministic row_number (desc count, asc band_id)."""
    agg = _reviews_with_bands(reviews, music).groupBy("country", "band_id", "band_name").agg(
        F.count(F.lit(1)).alias("review_count"),
        F.avg("score").alias("avg_score"),
    )
    top = top_n_per_group(
        agg, ["country"], [F.desc("review_count"), F.asc("band_id")], n=10
    )
    return top.orderBy(F.asc("country"), F.desc("review_count"))


def band_avg_scores(reviews: DataFrame, music: DataFrame) -> DataFrame:
    """G2 (`flows/gold.py:97-110`): count/mean/min/max/std of score per
    band (std = stddev_samp, Polars ddof=1)."""
    return (
        grouped_stats(
            _reviews_with_bands(reviews, music),
            ["band_id", "band_name", "country"],
            "score",
            {
                "review_count": "count",
                "avg_score": "avg",
                "min_score": "min",
                "max_score": "max",
                "std_score": "std",
            },
        )
        .orderBy(F.desc("avg_score"))
    )


def brazilian_bands(scores: DataFrame) -> DataFrame:
    """G4 (`flows/gold.py:113-122`): derived ``country_normalized``
    column (the original is kept, as in the reference), isin brazil
    variants, sort by avg_score desc. Consumes G2's result
    (`flows/gold.py:161-162`)."""
    return (
        scores.withColumn("country_normalized", normalize_country("country"))
        .filter(F.col("country_normalized").isin(_BRAZIL_VARIANTS))
        .orderBy(F.desc("avg_score"))
    )


def band_album_counts(music: DataFrame) -> DataFrame:
    """G3 (`flows/gold.py:125-131`): albums per band, sorted desc."""
    return grouped_stats(
        music, ["band_id", "band_name", "country"], "band_id", {"album_count": "count"}
    ).orderBy(F.desc("album_count"))


def band_score_ranking(scores: DataFrame) -> DataFrame:
    """O6 view (`scripts/trino_create_tables.sql:114-121`): global
    top-100 by avg_score, deterministic via band_id tie-break."""
    return scores.orderBy(F.desc("avg_score"), F.asc("band_id")).limit(100)


def gold_flow(
    spark: SparkSession, silver_paths: dict[str, str], gold_dir: str
) -> dict[str, str]:
    music = spark.read.parquet(silver_paths["music_catalog"]).cache()
    reviews = spark.read.parquet(silver_paths["album_reviews"]).cache()

    # Empty guard (`flows/gold.py:63-65,151-153`) — one action on the
    # cached plans, not a separate materialization.
    if music.isEmpty() or reviews.isEmpty():
        raise ValueError("gold flow aborted: empty silver inputs")

    out: dict[str, str] = {}
    scores = band_avg_scores(reviews, music)
    marts: dict[str, DataFrame] = {
        "top10_by_country": top10_by_country(reviews, music),
        "band_avg_scores": scores,
        "brazilian_bands": brazilian_bands(scores),
        "band_album_counts": band_album_counts(music),
        "band_score_ranking": band_score_ranking(scores),
    }
    for name, df in marts.items():
        dest = os.path.join(gold_dir, name)
        df.write.mode("overwrite").option("compression", "snappy").parquet(dest)
        out[name] = dest
    music.unpersist()
    reviews.unpersist()
    return out
