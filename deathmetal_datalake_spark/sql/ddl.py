"""SQL-facing catalog surface — the Trino DDL re-expressed as Spark SQL.

Reference: ``scripts/trino_create_tables.sql`` — schemas :9-11, tables
:19-108, the ranking view :114-121. The reference's DDL types diverge
from its flow outputs (SURVEY.md §1.2); here views are registered over
the parquet the flows actually wrote, so SQL users and DataFrame users
see one schema (single-sourced via schemas.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_zone_tables(spark: SparkSession, paths: dict[str, str], prefix: str = "") -> None:
    """CREATE OR REPLACE TEMP VIEW {prefix}{name} over each zone table
    (analog of CREATE TABLE IF NOT EXISTS per zone,
    ``scripts/trino_create_tables.sql:19-108``)."""
    for name, path in paths.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {prefix}{name} "
            f"USING parquet OPTIONS (path '{path}')"
        )


RANKING_VIEW_SQL = """
CREATE OR REPLACE TEMPORARY VIEW band_score_ranking AS
SELECT band_name,
       avg_score,
       review_count,
       country
FROM {scores_view}
ORDER BY avg_score DESC, band_name ASC
LIMIT 100
"""


def create_ranking_view(spark: SparkSession, scores_view: str = "band_avg_scores") -> None:
    """The gold ranking view (``scripts/trino_create_tables.sql:114-121``)
    with the deterministic tie-break (SURVEY.md §7.4)."""
    spark.sql(RANKING_VIEW_SQL.format(scores_view=scores_view))
