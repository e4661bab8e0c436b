"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join query (the reference's
ad-hoc analysis chain, ``main.py:13-86`` → SURVEY.md §3.2) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
``deathmetal_datalake_spark.plans`` — one entry per operator family in
SURVEY.md §2 plus the training-data extensions (dedup, similarity,
text analysis, event windows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deathmetal_datalake_spark.plans import ORACLES, QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_multijoin"](spark, _SMOKE_SF_DIR)


def _with_cache_release(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the previous query's session caches before building the
    next plan: the driver runs the full catalog sequentially in one
    session, and without this each dedup-family query would pin its
    cached minhash/shingle subplan in executor storage until shutdown.
    (Caches can only be unpersisted after the *caller's* action, so the
    release happens at the next query's build, not at this one's end.)
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from deathmetal_datalake_spark.plans.registry import release_caches

        release_caches()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_cache_release(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
