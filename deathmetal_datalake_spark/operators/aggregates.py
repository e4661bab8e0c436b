"""Grouped aggregation helpers (G1-G3, SURVEY.md §2.5).

Count semantics: the reference's Polars path counts rows
(``pl.count()``, ``flows/gold.py:87``) while its Daft variant counts
non-nulls (``flows_iceberg/gold_iceberg.py:36``); we standardize on
row counts (``F.count(F.lit(1))``) per SURVEY.md §7.4. ``std`` maps to
``stddev_samp`` (Polars ddof=1 default, ``flows/gold.py:107``).

All of these are single-shuffle hash aggregations: Catalyst plans a
partial (map-side) aggregate before the exchange, so at 100 TB the
shuffle carries one row per (partition × group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STAT_FNS = {
    "count": lambda c: F.count(F.lit(1)),
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
    "sum": F.sum,
}


def grouped_stats(
    df: DataFrame,
    keys: list[str],
    value: str,
    stats: dict[str, str],
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with aliased measures.

    ``stats`` maps output alias → stat name in ``_STAT_FNS``; e.g. the
    reference's band_avg_scores (``flows/gold.py:102-109``) is
    ``grouped_stats(df, ["band_id","band_name","country"], "score",
    {"review_count": "count", "avg_score": "avg", "min_score": "min",
    "max_score": "max", "std_score": "std"})``.
    """
    aggs: list[Column] = [_STAT_FNS[s](value).alias(alias) for alias, s in stats.items()]
    return df.groupBy(*keys).agg(*aggs)
