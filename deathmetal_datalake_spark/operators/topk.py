"""Top-N per group (operator O5, SURVEY.md §2.6).

The reference sorts then takes ``group_by(g).head(10)`` — encounter-order
dependent and nondeterministic on ties (``flows/gold.py:91-93``); its two
variants even disagree on sort direction (O1 vs O2). We implement the
intended semantics deterministically: ``row_number`` over a window with
an explicit tie-break key, per SURVEY.md §7.4.

Scale note: a window with ``partitionBy`` shuffles once on the group key
and sorts within partitions — same cost envelope as the groupBy that
produced the input, and Catalyst's rank-limit pushdown
(WindowGroupLimit) truncates each partition to N during the sort instead
of ranking every row, so this survives 100× data growth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_alias: str | None = None,
) -> DataFrame:
    """Keep the first ``n`` rows per group under a total order.

    ``order_cols`` must define a total order (include a unique tie-break
    column, e.g. ``[F.desc("review_count"), F.asc("band_id")]``) for
    reproducible results.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= n)
    if rank_alias:
        return out.withColumnRenamed("__rn", rank_alias)
    return out.drop("__rn")
