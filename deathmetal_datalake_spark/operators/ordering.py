"""Distributed global ordering — two-phase rank / running sum.

Spark executes ``Window.orderBy(...)`` with NO ``partitionBy`` as a
single task holding the entire frame (``Exchange SinglePartition`` →
sort → window). Correct at any scale, but a scale-killer once the frame
is data-proportional: at 100 TB that one task sorts billions of rows.

``two_phase_order`` produces bit-identical ``row_number`` / inclusive
running-sum results with every phase distributed:

1. ``repartitionByRange`` on the ordering key — a sampled range
   shuffle; partition *i* holds keys strictly before partition *i+1*'s
   (ties stay together, and callers must include a unique tie-break so
   the order is total — the same requirement the global window had).
2. A window PARTITIONED by ``spark_partition_id()`` computes the local
   rank / local running sum — parallel, one task per range.
3. Per-partition totals (one hash aggregate over the reused range
   exchange) become cumulative offsets via a window over the totals
   frame — **#partitions rows, bounded by construction, never
   data-proportional** — broadcast-joined back and added to the local
   values.

The offsets window orders by the ``__bounded_pid`` marker column; the
plan-quality gate (tests/test_plan_quality.py) allows empty-partition
window specs only when they order by ``__bounded``-prefixed columns,
so this helper passes mechanically while accidental global windows
over real data still fail the gate.

Exactness: ranks are pure integer arithmetic. Running sums are exact
for integer/decimal value columns (addition is associative); plain
DOUBLE columns would pick up partitioning-dependent ulps — cast to
decimal first (the ``registry.dsum`` convention).

Reference parity: the reference's analytics notebooks rank with
Polars' ``rank``/``cum_sum`` on a single node (e.g. top-list builds in
its gold queries); this is the multi-executor equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker prefix the plan gate recognizes as "this global window's frame
# is bounded by construction" (here: one row per shuffle partition).
BOUNDED_MARKER = "__bounded"

_PID = f"{BOUNDED_MARKER}_pid"
_CNT = f"{BOUNDED_MARKER}_cnt"
_SUM = f"{BOUNDED_MARKER}_sum"
_CNT_OFF = f"{BOUNDED_MARKER}_cnt_off"
_SUM_OFF = f"{BOUNDED_MARKER}_sum_off"


def two_phase_order(
    df: DataFrame,
    order_by: list[Column],
    *,
    rank_col: str | None = None,
    cumsum: tuple[str, str] | None = None,
    n_total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a global 1-based ``row_number`` and/or inclusive running
    sum over a TOTAL order, without a single-partition sort.

    ``order_by``   sort Columns defining a total order (include a
                   unique tie-break, exactly as the global window
                   required for determinism).
    ``rank_col``   output name for the global row number (optional).
    ``cumsum``     ``(value_col, out_col)`` for an inclusive running
                   sum of an integer/decimal column (optional).
    ``n_total_col``  optional output name for the grand row count
                   (saves callers a separate count scan).
    """
    if rank_col is None and cumsum is None and n_total_col is None:
        raise ValueError("nothing to compute")
    pid = _PID
    while pid in df.columns:
        pid = "_" + pid
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_by).withColumn(
        pid, F.spark_partition_id()
    )

    aggs = [F.count(F.lit(1)).alias(_CNT)]
    if cumsum is not None:
        aggs.append(F.sum(cumsum[0]).alias(_SUM))
    totals = ranged.groupBy(pid).agg(*aggs)
    # Offsets over the totals frame: #partitions rows — the one global
    # window here is bounded by construction (see module docstring).
    w_off = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.col(pid),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0).cast("long")).alias(_CNT_OFF),
    ]
    if cumsum is not None:
        off_cols.append(F.sum(_SUM).over(w_off).alias(_SUM_OFF))
    if n_total_col is not None:
        w_all = Window.orderBy(pid).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum(_CNT).over(w_all).cast("long").alias(n_total_col))
    offsets = totals.select(*off_cols)

    w_local = Window.partitionBy(pid).orderBy(*order_by)
    out = ranged.join(F.broadcast(offsets), pid)
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (F.col(_CNT_OFF) + F.row_number().over(w_local)).cast("long"),
        )
    if cumsum is not None:
        local = F.sum(cumsum[0]).over(
            w_local.rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(
            cumsum[1], F.coalesce(F.col(_SUM_OFF), F.lit(0)) + local
        )
    return out.drop(pid, _CNT_OFF, _SUM_OFF)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) bucket from a 1-based global rank and the frame's
    row count — the distributed replacement for
    ``F.ntile(k).over(Window.orderBy(...))`` once the rank comes from
    :func:`two_phase_order`.

    SQL NTILE semantics (Spark and DuckDB agree): with ``q = n div k``
    and ``rem = n mod k``, the first ``rem`` buckets hold ``q + 1``
    rows, the rest ``q``. Integer-exact while n + k < 2^53 (floor of a
    double ratio of exact longs).
    """
    q = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    cut = rem * (q + 1)
    head = F.floor((rank + q) / (q + 1)).cast("long")
    # q = 0 only when n < k, where every rank r <= cut = n — the tail
    # branch is unreachable; NULLIF keeps its division lazy-safe under
    # ANSI mode anyway.
    q_safe = F.nullif(q, F.lit(0))
    tail = (rem + F.floor((rank - cut + q_safe - 1) / q_safe)).cast("long")
    return F.when(rank <= cut, head).otherwise(tail)
