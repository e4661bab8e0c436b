"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
salting is the explicit lever for *aggregation* hot keys and for joins
whose skew AQE can't see (e.g. a groupBy where one key holds 10% of a
100 TB fact). Semantics are identical to the direct operation — tests
assert exact equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Decomposition rules: how each final aggregate is computed from partial
# (per-salt) aggregates.
_MERGERS = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs`` maps output alias → (stat, column) with stat in
    count/sum/min/max (the decomposable stats; avg = sum/count at the
    call site). Phase 1 aggregates on (keys, salt) — spreading a hot key
    over ``n_salts`` reducers — phase 2 merges partials per key. For
    non-hot keys this costs one extra (tiny) shuffle stage; use it when
    a key's share of rows is large relative to 1/partitions.
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial_aggs = []
    for alias, (stat, col) in aggs.items():
        fn = F.count if stat == "count" else getattr(F, stat)
        target = F.lit(1) if stat == "count" else F.col(col)
        partial_aggs.append(fn(target).alias(f"__p_{alias}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [
        _MERGERS[stat](F.col(f"__p_{alias}")).alias(alias)
        for alias, (stat, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed fact ⨝ small-ish dim without broadcast: salt the fact key,
    explode the dim across all salts, join on (key, salt). Use when the
    dim is too big to broadcast and the fact key is skewed; cost is
    dim × n_salts replication against an even shuffle of the fact."""
    salted_fact = fact.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(exploded_dim, [key, "__salt"]).drop("__salt")
