"""Registry mapping query name → (Spark callable, optional DuckDB oracle).

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts; domain modules register via the decorator. Column
names are part of the contract: the driver sorts columns by name before
value-hashing, so the Spark DataFrame and oracle SQL must alias every
computed column identically.

Cross-engine determinism conventions used throughout the catalog:

- **Sums of doubles** go through ``DECIMAL(18,6)``: decimal addition is
  exact and associative, so Spark's partition-parallel sum and DuckDB's
  sequential sum produce bit-identical results; the final value is cast
  back to DOUBLE. Plain double sums differ in the last ulps with
  partitioning and would flip rounded digits.
- **Averages** are decimal-sum / row-count, rounded.
- **Top-k / limits** always carry a unique tie-break key.
- **64-bit hashes** are derived from ``md5`` (both engines agree on
  md5 hex): Spark ``conv(substr(md5(s),1,15),16,10)`` ≡ DuckDB
  ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)`` — 60 bits, positive.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---- shared deterministic-aggregation helpers (Spark side) ----

_DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact cross-engine sum of a double expression via decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum / row count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1)), scale).alias(alias)


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit positive hash shared with the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Matching oracle-side SQL fragments (DuckDB dialect).

def sql_dsum(expr: str, alias: str) -> str:
    # The decimal → double cast goes through VARCHAR deliberately:
    # DuckDB's direct decimal128→double conversion multiplies the
    # unscaled int by 10^-scale in floating point, which stops being
    # correctly rounded once the unscaled value exceeds 2^53 (observed
    # at the 10× scale: sum 312195134605.100000 → ...605.10004, one
    # ulp above the correctly-rounded double). String → double parsing
    # IS correctly rounded in both engines, and Spark's decimal cast
    # (BigDecimal.doubleValue, which falls back to parseDouble beyond
    # 2^52) is too — so this form agrees bit-for-bit at every scale,
    # not just while sums stay under 2^53/10^6.
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    # Same VARCHAR round-trip as sql_dsum (see note there).
    return (
        f"ROUND(CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT(*), {scale}) AS {alias}"
    )


def sql_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ---- cache bookkeeping ----
#
# Catalog functions return *lazy* plans, so a cache() protecting a
# shared subplan (minhash signatures, shingle lists) can only be
# released after the caller's action. Register every such cache here;
# long-lived callers (bench.py, notebooks) call release_caches()
# between queries to hand executor storage memory back.

_LIVE_CACHES: list[DataFrame] = []


def session_cache(df: DataFrame) -> DataFrame:
    """``cache()`` with bookkeeping for deferred release."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every cache registered since the last release."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def spread(df: "DataFrame") -> "DataFrame":
    """Repartition to full parallelism ahead of a row-multiplying or
    compute-heavy stage. Narrow/compressed tables (documents,
    embeddings) scan as 1-10 parquet splits, which would otherwise cap
    the downstream stage at scan-task parallelism (docs/SCALING.md §1).
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def spread_write(df: "DataFrame") -> "DataFrame":
    """Width for STAGING A TABLE WRITE, sized from the bytes feeding it
    (``df.inputFiles()``) instead of pinned at cluster width: a 2.6 MB
    orders frame repartitioned to ``defaultParallelism`` writes 32
    sliver files per commit — each paying task-commit, footer-harvest
    and reader-open cost — while at 100 TB the same expression yields
    thousands of ~target-size files (guide §6: aim output files at a
    size target, never at a task-count constant). Target bytes per
    output file come from ``SPARK_GRAFT_WRITE_TARGET_MB`` (default 16
    locally — small enough that the 10× bench scratch still writes
    multi-file layouts; production deployments set 128–1024).

    Conservative when the caller filters after this call (width sized
    on pre-filter bytes — same behavior as the old fixed-width spread,
    just bounded). Falls back to cluster width when no file sizes are
    visible (non-file sources)."""
    import math
    import os

    target = int(os.environ.get("SPARK_GRAFT_WRITE_TARGET_MB", "16")) * (1 << 20)
    total = 0
    try:
        for f in df.inputFiles():
            p = f[len("file:"):] if f.startswith("file:") else f
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
    except Exception:  # non-file plans: keep the old fixed-width behavior
        total = 0
    if total <= 0:
        return spread(df)
    return df.repartition(max(1, math.ceil(total / target)))
