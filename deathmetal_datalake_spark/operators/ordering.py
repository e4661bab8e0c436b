"""Distributed global ordering — two-phase rank / running sum.

Spark executes ``Window.orderBy(...)`` with NO ``partitionBy`` as a
single task holding the entire frame (``Exchange SinglePartition`` →
sort → window). Correct at any scale, but a scale-killer once the frame
is data-proportional: at 100 TB that one task sorts billions of rows.

``two_phase_order`` produces bit-identical ``row_number`` / inclusive
running-sum results with every phase distributed:

1. Bucket every row by LITERAL quantile boundaries of the leading sort
   key (collected once at plan-build time — one tiny action), so the
   bucket is a **pure function of the row's values**. This is the
   load-bearing design decision: a ``repartitionByRange`` +
   ``spark_partition_id()`` formulation is wrong in general, because
   the offsets branch gets its own column-pruned copy of the range
   exchange — no reuse — and the two RangePartitioners sample
   boundaries independently, assigning the same row different
   partition ids in each branch (observed at 10×; AQE hides it at
   test scale by coalescing to one partition). A value-derived bucket
   cannot disagree with itself.
2. A window PARTITIONED by the bucket computes the local rank / local
   running sum — parallel, one task per bucket.
3. Per-bucket totals become cumulative offsets via a window over the
   totals frame — **#buckets rows, bounded by construction, never
   data-proportional** — broadcast-joined back and added to the local
   values.

The offsets window orders by the ``__bounded``-prefixed bucket column;
the plan-quality gate (tests/test_plan_quality.py) allows
empty-partition window specs only on such columns, so this helper
passes mechanically while accidental global windows over real data
still fail the gate.

Exactness: ranks depend only on the total order, not on where the
boundaries land (boundaries affect balance, never results). Running
sums are exact for integer/decimal value columns; plain DOUBLE columns
would pick up partitioning-dependent ulps — cast to decimal first (the
``registry.dsum`` convention).

Skew note (tie-heavy leading keys): rows tying on the leading key can
never be separated by boundaries OF that key, so without further help
the worst task holds the largest tie group — fatal when the key is a
small-domain count (an RFM "frequency" of 1..20 over 1.5 B customers
puts ~all rows in ~20 buckets). ``sub_key`` closes this: pass the
numeric form of the SECOND ``order_by`` entry and heavy tie groups —
detected at plan time as boundary values hit by ≥2 quantile fractions,
i.e. holding ≥ ~1/n_parts of the frame — are SUB-bucketed by literal
quantile boundaries of ``sub_key`` computed within each tie group (one
extra batched action, skipped entirely when no heavy value exists).
The flattened (bucket, sub) pair stays a pure function of the row's
values and lexicographically monotone in the total order, so results
remain bit-identical; only balance changes. String tie-breaks go
through :func:`string_order_key`.

Callers re-evaluate ``df`` three times (boundary action, totals, main
branch) — ``session_cache`` the input when it is itself expensive to
compute.

Reference parity: the reference's analytics notebooks rank with
Polars' ``rank``/``cum_sum`` on a single node (e.g. top-list builds in
its gold queries); this is the multi-executor equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker prefix the plan gate recognizes as "this global window's frame
# is bounded by construction" (here: one row per bucket).
BOUNDED_MARKER = "__bounded"

_BKT = f"{BOUNDED_MARKER}_bkt"
_CNT = f"{BOUNDED_MARKER}_cnt"
_SUM = f"{BOUNDED_MARKER}_sum"
_CNT_OFF = f"{BOUNDED_MARKER}_cnt_off"
_SUM_OFF = f"{BOUNDED_MARKER}_sum_off"


def string_order_key(col: Column, *, nbytes: int = 7) -> Column:
    """Monotone numeric surrogate for a STRING tie-break: the first
    ``nbytes`` UTF-8 bytes as a big-endian integer (zero-padded).

    Spark compares strings byte-wise on their UTF-8 encoding
    (``UTF8String.compareTo``), and a zero-padded fixed-width prefix
    preserves that order: ``a < b`` ⇒ ``prefix(a) <= prefix(b)``.
    Monotone-not-injective is exactly what sub-bucketing needs —
    strings sharing a 7-byte prefix merely share a sub-bucket. 7 bytes
    keep the value under 2^56, exactly representable in the DOUBLE the
    bucketing casts to.
    """
    hexed = F.hex(F.substring(F.encode(col, "UTF-8"), 1, nbytes))
    return F.conv(F.rpad(hexed, 2 * nbytes, "0"), 16, 10).cast("double")


def _bucket_expr(
    df: DataFrame,
    key: Column,
    key_desc: bool,
    n_parts: int,
    sub_key: Column | None,
    sub_desc: bool,
) -> Column:
    """Value-derived bucket Column for :func:`two_phase_order` — the
    plan-time boundary actions live here. Lexicographically monotone in
    the (key, sub_key) order by construction; see the module docstring
    for why value-derived (not partition-id-derived) is load-bearing
    and the skew note for the sub-bucket design.
    """
    kd = key.cast("double")
    fracs = [i / n_parts for i in range(1, n_parts)]
    raw: list[float] = []
    if fracs:
        row = df.select(F.percentile_approx(kd, fracs, 1000).alias("bs")).first()
        got = row["bs"] if row is not None else None
        raw = [float(b) for b in (got or []) if b is not None]
    sub_bounds = None
    if sub_key is not None:
        heavy, aggs = _sub_agg_exprs(kd, sub_key.cast("double"), raw, "h")
        if heavy:
            row = df.select(*aggs).first()
            sub_bounds = _sub_bounds_from_row(row, heavy, "h", sub_desc)
    return _bucket_from_collected(key, key_desc, raw, sub_key, sub_desc, sub_bounds)


def _sub_agg_exprs(
    kd: Column, sd: Column, raw: list[float], prefix: str
) -> tuple[list[float], list[Column]]:
    """Heavy tie values of a collected boundary list + the batched
    percentile aggregates that compute their sub-boundaries. A boundary
    value hit by m >= 2 quantile fractions holds >= ~(m-1)/n_parts of
    the frame and can never be split by boundaries of the key itself —
    those are the heavy values (see the skew note)."""
    from collections import Counter

    mult = Counter(raw)
    heavy = sorted(v for v, c in mult.items() if c >= 2)
    aggs = []
    for i, v in enumerate(heavy):
        m = mult[v]
        sub_fracs = [j / (m + 1) for j in range(1, m + 1)]
        aggs.append(
            F.percentile_approx(
                F.when(kd == F.lit(v), sd), sub_fracs, 1000
            ).alias(f"{prefix}{i}")
        )
    return heavy, aggs


def _sub_bounds_from_row(
    row, heavy: list[float], prefix: str, sub_desc: bool
) -> dict[float, list[float]]:
    sub_bounds: dict[float, list[float]] = {}
    for i, v in enumerate(heavy):
        got = row[f"{prefix}{i}"] if row is not None else None
        sub_bounds[v] = sorted(
            {float(b) for b in (got or []) if b is not None}, reverse=sub_desc
        )
    return sub_bounds


def _bucket_from_collected(
    key: Column,
    key_desc: bool,
    raw: list[float],
    sub_key: Column | None,
    sub_desc: bool,
    sub_bounds: dict[float, list[float]] | None,
) -> Column:
    """Pure bucket expression from ALREADY-collected boundaries — no
    actions. Sub-bucketing of heavy tie groups: every heavy value is a
    deduped boundary, so (a) rows with key strictly before it in sort
    order land in a strictly lower primary bucket, and (b) two heavy
    values never share a primary bucket — the only cohabitants are rows
    sorting strictly AFTER the tie group, which get the sentinel
    sub-bucket nsub+2."""
    kd = key.cast("double")
    # Dedup keeps the bucket assignment strictly monotone when
    # quantiles collapse.
    bounds = sorted(set(raw), reverse=key_desc)
    if not bounds:
        return F.lit(0).cast("long")

    arr = F.lit(bounds)
    hit = (lambda b: kd <= b) if key_desc else (lambda b: kd >= b)
    bucket = F.size(F.filter(arr, hit)).cast("long")
    # NULL keys: Spark sorts them FIRST under asc (bucket 0 is
    # already right) and LAST under desc (force the last bucket).
    if key_desc:
        bucket = F.when(kd.isNull(), F.lit(len(bounds)).cast("long")).otherwise(
            bucket
        )
    else:
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))

    if sub_key is None or not sub_bounds:
        return bucket
    sd = sub_key.cast("double")
    stride = max(len(sb) for sb in sub_bounds.values()) + 3
    s_expr = F.lit(0).cast("long")
    for v, sb in sub_bounds.items():
        nsub = len(sb)
        if key_desc:
            b_of_v = sum(1 for b in bounds if b >= v)
        else:
            b_of_v = sum(1 for b in bounds if b <= v)
        if sb:
            sarr = F.lit(sb)
            shit = (lambda b: sd <= b) if sub_desc else (lambda b: sd >= b)
            # NULL sub keys inside a tie group: first under asc (a NULL
            # predicate drops the element, size 0 -> sub-bucket 1),
            # forced last under desc.
            in_tie = (F.lit(1) + F.size(F.filter(sarr, shit))).cast("long")
            if sub_desc:
                in_tie = F.when(
                    sd.isNull(), F.lit(nsub + 1).cast("long")
                ).otherwise(in_tie)
        else:
            in_tie = F.lit(1).cast("long")
        s_expr = (
            F.when(kd == F.lit(v), in_tie)
            .when(bucket == F.lit(b_of_v), F.lit(nsub + 2).cast("long"))
            .otherwise(s_expr)
        )
    return bucket * F.lit(stride).cast("long") + s_expr


def two_phase_order(
    df: DataFrame,
    order_by: list[Column],
    key: Column,
    *,
    key_desc: bool = False,
    rank_col: str | None = None,
    cumsum: tuple[str, str] | None = None,
    n_total_col: str | None = None,
    num_partitions: int | None = None,
    sub_key: Column | None = None,
    sub_desc: bool = False,
) -> DataFrame:
    """Attach a global 1-based ``row_number`` and/or inclusive running
    sum over a TOTAL order, without a single-partition sort.

    ``order_by``   sort Columns defining a total order (include a
                   unique tie-break, exactly as the global window
                   required for determinism).
    ``key``        plain (non-sort) Column expression of the LEADING
                   ``order_by`` entry — numeric, used for bucketing.
    ``key_desc``   True when the leading sort entry is descending.
    ``rank_col``   output name for the global row number (optional).
    ``cumsum``     ``(value_col, out_col)`` for an inclusive running
                   sum of an integer/decimal column (optional).
    ``n_total_col``  optional output name for the grand row count
                   (saves callers a separate count scan).
    ``sub_key``    numeric form of the SECOND ``order_by`` entry, used
                   to sub-bucket heavy tie groups of the leading key
                   (see the skew note). Pass it whenever the leading
                   key is a count / small-domain value; costs nothing
                   when the key turns out well-distributed. Strings go
                   through :func:`string_order_key`.
    ``sub_desc``   True when that second sort entry is descending.
    """
    spec = OrderSpec(
        order_by=order_by,
        key=key,
        key_desc=key_desc,
        rank_col=rank_col,
        cumsum=cumsum,
        sub_key=sub_key,
        sub_desc=sub_desc,
    )
    return two_phase_order_multi(
        df, [spec], n_total_col=n_total_col, num_partitions=num_partitions
    )


@dataclass
class OrderSpec:
    """One total-order rank/cumsum request for
    :func:`two_phase_order_multi` — same fields and semantics as the
    matching :func:`two_phase_order` arguments."""

    order_by: list[Column]
    key: Column
    key_desc: bool = False
    rank_col: str | None = None
    # One (value_col, out_col) pair, or a LIST of pairs sharing this
    # spec's total order (all computed from one bucket tag / totals
    # aggregate / offsets frame / local window).
    cumsum: "tuple[str, str] | list[tuple[str, str]] | None" = None
    sub_key: Column | None = None
    sub_desc: bool = False


def _cumsum_pairs(
    cumsum: "tuple[str, str] | list[tuple[str, str]] | None",
) -> list[tuple[str, str]]:
    """Normalize an OrderSpec.cumsum value to a list of (value_col,
    out_col) pairs. The single-pair form is detected structurally —
    exactly two strings — so a tuple OF pairs is multi-pair input, and
    anything else (a 2-tuple mixing strings with non-strings, a pair
    list containing a malformed entry) raises instead of silently
    producing wrong columns."""
    if cumsum is None:
        return []
    if (
        isinstance(cumsum, tuple)
        and len(cumsum) == 2
        and all(isinstance(e, str) for e in cumsum)
    ):
        return [cumsum]
    pairs = list(cumsum)
    for p in pairs:
        if not (
            isinstance(p, tuple)
            and len(p) == 2
            and all(isinstance(e, str) for e in p)
        ):
            raise TypeError(
                "OrderSpec.cumsum must be one (value_col, out_col) string "
                f"pair or a sequence of such pairs; got element {p!r}"
            )
    return pairs


def two_phase_order_multi(
    df: DataFrame,
    specs: list[OrderSpec],
    *,
    n_total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fused multi-order form (round-10, NEXT #3): attach the ranks /
    running sums of SEVERAL independent total orders over the same
    frame while paying at most TWO plan-build actions total — one
    batched select for every spec's boundary quantiles, one for every
    spec's heavy-tie sub-boundaries (skipped when no spec has heavy
    ties). The serial equivalent pays up to 2 actions PER spec; a
    three-order caller like the RFM quintile query drops from 6
    boundary actions to 2.

    Results are bit-identical to calling :func:`two_phase_order` once
    per spec: the batched aggregates are the SAME percentile_approx
    expressions, merely computed side-by-side in one pass, and every
    per-spec bucket stays a pure function of the row's values.
    ``n_total_col`` (the shared grand row count) is attached via the
    first spec's totals frame.
    """
    if not specs:
        raise ValueError("no specs")
    if (
        all(s.rank_col is None and s.cumsum is None for s in specs)
        and n_total_col is None
    ):
        raise ValueError("nothing to compute")
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    fracs = [i / n_parts for i in range(1, n_parts)]

    # Plan-build action 1: every spec's boundary quantiles, one select.
    raws: list[list[float]] = [[] for _ in specs]
    if fracs:
        aggs = [
            F.percentile_approx(s.key.cast("double"), fracs, 1000).alias(f"__b{i}")
            for i, s in enumerate(specs)
        ]
        row = df.select(*aggs).first()
        for i in range(len(specs)):
            got = row[f"__b{i}"] if row is not None else None
            raws[i] = [float(b) for b in (got or []) if b is not None]

    # Plan-build action 2 (only when some spec has heavy ties): every
    # spec's sub-boundaries, one select.
    heavies: dict[int, list[float]] = {}
    all_sub_aggs: list[Column] = []
    for i, s in enumerate(specs):
        if s.sub_key is None:
            continue
        heavy, sub_aggs = _sub_agg_exprs(
            s.key.cast("double"), s.sub_key.cast("double"), raws[i], f"s{i}_"
        )
        if heavy:
            heavies[i] = heavy
            all_sub_aggs.extend(sub_aggs)
    sub_row = df.select(*all_sub_aggs).first() if all_sub_aggs else None
    sub_bounds_by_spec = {
        i: _sub_bounds_from_row(sub_row, heavy, f"s{i}_", specs[i].sub_desc)
        for i, heavy in heavies.items()
    }

    # Per-spec shapes below exactly mirror the proven single-spec form
    # (tag bucket -> totals -> offsets -> broadcast join -> local
    # window -> drop), run serially over the accumulating frame; only
    # the driver-side boundary collection above is fused. Tagging each
    # bucket immediately before its own groupBy keeps the tagged frame
    # as the diamond root, the self-join shape Catalyst's attribute
    # dedup handles (pre-tagging every bucket up front made the
    # optimizer inline a bucket expression past another spec's
    # aggregation and fail binding at execution).
    out = df
    for i, s in enumerate(specs):
        bkt = f"{_BKT}{i}"
        while bkt in out.columns:
            bkt = "_" + bkt
        cnt_off = f"{_CNT_OFF}{i}"
        # A spec's ``cumsum`` may be ONE (col, out) pair or a LIST of
        # pairs sharing this spec's total order (round-12: the
        # Jonckheere-Terpstra shape needs five per-group running counts
        # over one value order — one bucket tag, one totals aggregate,
        # one offsets frame, one local window for all five, instead of
        # five full per-spec passes). The single-pair case is detected
        # STRUCTURALLY (two strings), not by tuple-ness: a tuple of
        # pairs like ``(("a","x"), ("b","y"))`` is multi-pair input and
        # must not be silently read as one (value_col, out_col) pair.
        pairs = _cumsum_pairs(s.cumsum)
        sum_offs = [f"{_SUM_OFF}{i}_{k}" for k in range(len(pairs))]
        out = out.withColumn(
            bkt,
            _bucket_from_collected(
                s.key, s.key_desc, raws[i], s.sub_key, s.sub_desc,
                sub_bounds_by_spec.get(i),
            ),
        )
        aggs = [F.count(F.lit(1)).alias(_CNT)]
        for k, (src_col, _outn) in enumerate(pairs):
            aggs.append(F.sum(src_col).alias(f"{_SUM}{k}"))
        totals = out.groupBy(bkt).agg(*aggs)
        # Offsets over the totals frame: #buckets rows — the one global
        # window here is bounded by construction (see module docstring).
        w_off = Window.orderBy(bkt).rowsBetween(Window.unboundedPreceding, -1)
        off_cols = [
            F.col(bkt),
            F.coalesce(F.sum(_CNT).over(w_off), F.lit(0).cast("long")).alias(
                cnt_off
            ),
        ]
        for k in range(len(pairs)):
            off_cols.append(F.sum(f"{_SUM}{k}").over(w_off).alias(sum_offs[k]))
        if n_total_col is not None and i == 0:
            w_all = Window.orderBy(bkt).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            off_cols.append(
                F.sum(_CNT).over(w_all).cast("long").alias(n_total_col)
            )
        offsets = totals.select(*off_cols)

        w_local = Window.partitionBy(bkt).orderBy(*s.order_by)
        out = out.join(F.broadcast(offsets), bkt)
        if s.rank_col is not None:
            out = out.withColumn(
                s.rank_col,
                (F.col(cnt_off) + F.row_number().over(w_local)).cast("long"),
            )
        for k, (src_col, out_col) in enumerate(pairs):
            local = F.sum(src_col).over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            )
            out = out.withColumn(
                out_col, F.coalesce(F.col(sum_offs[k]), F.lit(0)) + local
            )
        out = out.drop(bkt, cnt_off, *sum_offs)
    return out


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


def exact_global_quantiles(
    df: DataFrame,
    value: Column,
    fracs: list[float],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact linear-interpolated global quantiles, scale-safely.

    Spark's ``percentile()`` aggregate buffers EVERY value of the frame
    in one aggregation buffer (partials merge whole value maps; the
    final reducer holds the full column) — the same
    data-proportional-single-task class as an unpartitioned window,
    just hidden inside an aggregate. This helper computes the identical
    result by distributed selection instead: a two-phase global rank
    over the values, the bracketing rows joined to a literal fraction
    frame, and Spark's exact interpolation formula applied explicitly —
    0-indexed ``pos = (n-1)·f``, result =
    ``v_lo·(ceil(pos) − pos) + v_hi·(pos − floor(pos))`` (Percentile
    .scala's two-sided weighted form, reproduced term for term so the
    floating-point result is bit-identical to the aggregate's).

    Returns one row per fraction: ``(frac DOUBLE, q DOUBLE)``. Callers
    pivot with a conditional aggregate. NULL values are excluded first
    (the aggregate's semantics); an EMPTY frame yields zero rows —
    callers that must emit a row anyway (aggregate semantics) LEFT-join
    these quantiles onto an always-one-row count frame.

    Ties need no tie-break column here: the value at a global rank is
    invariant under any permutation of equal values.
    """
    spark = df.sparkSession
    vals = df.select(value.cast("double").alias("__q_v")).filter(
        F.col("__q_v").isNotNull()
    )
    ranked = two_phase_order(
        vals,
        [F.asc("__q_v")],
        F.col("__q_v"),
        rank_col="__q_rnk",
        n_total_col="__q_n",
        num_partitions=num_partitions,
    )
    fr = spark.createDataFrame([(float(f),) for f in fracs], "frac double")
    # pos is 0-indexed; row_number ranks are 1-indexed.
    pos = (F.col("__q_n") - 1) * F.col("frac")
    targets = fr.crossJoin(
        F.broadcast(ranked.select("__q_n").limit(1))
    ).select(
        "frac",
        (F.floor(pos) + 1).cast("long").alias("__q_lo"),
        (F.ceil(pos) + 1).cast("long").alias("__q_hi"),
        pos.alias("__q_pos"),
    )
    lo = ranked.select(
        F.col("__q_rnk").alias("__q_lo"), F.col("__q_v").alias("__q_vlo")
    )
    hi = ranked.select(
        F.col("__q_rnk").alias("__q_hi"), F.col("__q_v").alias("__q_vhi")
    )
    # targets is tiny (one row per fraction); lo/hi are value frames —
    # never broadcast those, AQE turns these into broadcast joins from
    # the targets side.
    joined = targets.join(lo, "__q_lo", "left").join(hi, "__q_hi", "left")
    posf = F.col("__q_pos")
    q = F.when(F.col("__q_lo") == F.col("__q_hi"), F.col("__q_vlo")).otherwise(
        F.col("__q_vlo") * (F.ceil(posf) - posf)
        + F.col("__q_vhi") * (posf - F.floor(posf))
    )
    return joined.select("frac", q.alias("q"))


def exact_grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value: Column,
    fracs: list[float],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group quantiles for a BOUNDED-ENUM group column
    (order status, source, label — a handful of huge groups), without
    the per-group full-column aggregation buffer ``percentile()`` pays.

    Few-huge-groups is the grouped twin of the global-percentile
    problem: ``groupBy(g).agg(percentile(...))`` still materializes
    each group's entire value column in one task's buffer at the final
    merge. With G known-small, the honest distributed form is G
    applications of :func:`exact_global_quantiles` (one tiny
    plan-time action to enumerate groups, then G boundary actions —
    ``session_cache`` the input upstream). NULL groups are carried
    like any other group value.

    Returns ``(<group_col>, frac DOUBLE, q DOUBLE)`` rows; groups whose
    value column is entirely NULL/empty contribute no rows (callers
    LEFT-join, matching the aggregate's NULL for such groups).
    """
    groups = [
        r[0] for r in df.select(group_col).distinct().collect()
    ]  # bounded-enum contract: G small by design
    parts = []
    for g in groups:
        member = (
            F.col(group_col).isNull() if g is None else F.col(group_col) == F.lit(g)
        )
        q = exact_global_quantiles(
            df.filter(member), value, fracs, num_partitions=num_partitions
        )
        parts.append(q.select(F.lit(g).alias(group_col), "frac", "q"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def grouped_quantiles_general(
    df: DataFrame,
    group_col: str,
    value: Column,
    fracs: list[float],
    *,
    buckets: int = 32,
) -> DataFrame:
    """Exact per-group linear-interpolated quantiles for CONTINUOUS
    (unbounded-domain) values over a BOUNDED set of groups — the
    general case neither sibling covers: :func:`exact_grouped_quantiles`
    pays one boundary action PER group (fine for a handful, not for 64
    embedding dimensions), and :func:`grouped_quantiles_lowcard`
    requires a domain-bounded value column.

    Two bounded plan-time actions total, regardless of G:

    1. Per-group approx boundaries in ONE distributed aggregate
       (``groupBy(g).agg(percentile_approx(v, fracs_P))`` — bounded
       state per group), collected as G×(P−1) literals.
    2. Per-(group, bucket) counts — G×P rows — collected once; pure
       Python then locates, for every requested fraction, the bucket
       holding each bracketing rank and its LOCAL rank within that
       bucket.
    3. A broadcast spec joins rows in TARGET buckets only; a window
       partitioned by (group, bucket) — each ~n_g/P rows by
       construction — reads the bracketing values; Spark's exact
       interpolation formula (``v_lo·(ceil(pos)−pos) +
       v_hi·(pos−floor(pos))``, 0-indexed ``pos=(n−1)·f``) is applied
       term for term.

    Boundary quality affects only balance, never results. NULL values
    are excluded (aggregate semantics); groups with no non-NULL values
    contribute no rows.

    Heavy tie values (round-10, NEXT #4): a per-group boundary value
    hit by >= 2 bucket fractions marks a tie run holding >= ~1/buckets
    of the group. Such a run can never be split by value boundaries —
    but it does not need a window at all: every global rank landing
    inside the run answers with the tie value ITSELF, known at plan
    time from the boundary literals. Those ranks are answered directly;
    the heavy rows are EXCLUDED from the windowed path entirely, so no
    (group, bucket) task ever holds a heavy run (the lowcard caveat
    this function used to carry is gone). A heavy value is the minimum
    of its own bucket (bucket assignment is ``__v >= boundary`` and the
    value IS a deduped boundary), so the per-bucket rank layout is
    [heavy run][rest] and stays exactly reconstructible from the
    (bucket, is-heavy) counts.

    Returns ``(<group_col>, frac DOUBLE, q DOUBLE)``.
    """
    import math
    from collections import Counter

    spark = df.sparkSession
    # Group type computed BEFORE the empty-frame early return so an
    # empty result unions/joins cleanly with non-empty ones (a
    # hardcoded DOUBLE group column broke STRING-grouped callers).
    gtype = df.select(F.col(group_col).alias("__g")).schema[0].dataType.simpleString()
    vals = df.select(
        F.col(group_col).alias("__g"), value.cast("double").alias("__v")
    ).filter(F.col("__v").isNotNull())

    bfracs = [i / buckets for i in range(1, buckets)]
    brows = (
        vals.groupBy("__g")
        .agg(F.percentile_approx("__v", bfracs, 1000).alias("bs"))
        .collect()
    )
    if not brows:
        return spark.createDataFrame(
            [], f"__g {gtype}, frac double, q double"
        ).select(F.col("__g").alias(group_col), "frac", "q")
    bounds_rows = []
    heavy_by_group: dict = {}
    bounds_by_group: dict = {}
    for r in brows:
        raw = [float(b) for b in (r["bs"] or []) if b is not None]
        heavy = sorted(v for v, c in Counter(raw).items() if c >= 2)
        heavy_by_group[r["__g"]] = heavy
        bounds_by_group[r["__g"]] = sorted(set(raw))
        bounds_rows.append((r["__g"], bounds_by_group[r["__g"]], heavy))
    bounds_df = spark.createDataFrame(
        bounds_rows, f"__g {gtype}, barr array<double>, harr array<double>"
    )
    tagged = (
        vals.join(F.broadcast(bounds_df), "__g")
        .withColumn(
            "__b",
            F.size(
                F.filter(F.col("barr"), lambda b: F.col("__v") >= b)
            ).cast("long"),
        )
        .withColumn("__hv", F.array_contains(F.col("harr"), F.col("__v")))
        .drop("barr", "harr")
    )

    counts: dict = {}
    for r in (
        tagged.groupBy("__g", "__b", "__hv")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        counts[(r["__g"], r["__b"], r["__hv"])] = r["c"]
    # Per group: cumulative layout [heavy run][rest] per bucket ->
    # either a DIRECT answer (rank inside a heavy run: the run's value,
    # known from the boundary literals) or a (bucket, local_rank)
    # window target for every bracketing global rank of every fraction.
    per_group: dict = {}
    for (g, b, hv), c in counts.items():
        bk = per_group.setdefault(g, {}).setdefault(b, [0, 0])
        bk[1 if hv else 0] += c
    spec_rows = []  # (g, bucket, local_rank_in_nonheavy, frac, pos, role)
    direct_rows = []  # (g, frac, pos, role, value)
    for g, bks in per_group.items():
        n = sum(h + nh for nh, h in bks.values())
        order = sorted(bks)
        # A heavy value is the min of its own bucket (bucket id = count
        # of deduped boundaries <= v), so per-bucket layout under
        # orderBy(__v) is [heavy run][non-heavy rest].
        dedup_bounds = bounds_by_group[g]
        heavy_of_bucket = {
            sum(1 for bb in dedup_bounds if bb <= v): v
            for v in heavy_by_group.get(g, [])
        }
        cum_before = {}
        run = 0
        for b in order:
            cum_before[b] = run
            run += bks[b][1] + bks[b][0]
        for f in fracs:
            pos = (n - 1) * float(f)
            for role, r in (("lo", math.floor(pos) + 1), ("hi", math.ceil(pos) + 1)):
                for b in order:
                    nh, h = bks[b][0], bks[b][1]
                    if not (cum_before[b] < r <= cum_before[b] + h + nh):
                        continue
                    lr = r - cum_before[b]
                    if lr <= h:
                        direct_rows.append(
                            (g, float(f), pos, role, heavy_of_bucket[b])
                        )
                    else:
                        spec_rows.append(
                            (g, b, lr - h, float(f), pos, role)
                        )
                    break
    spec = spark.createDataFrame(
        spec_rows,
        f"__g {gtype}, __b long, __lr long, "
        "frac double, __pos double, __role string",
    )
    # Window over NON-HEAVY rows only: heavy runs were answered above,
    # so no partition holds a collapsed tie group.
    w = Window.partitionBy("__g", "__b").orderBy("__v")
    nonheavy = tagged.filter(~F.col("__hv"))
    picked = (
        nonheavy.join(
            F.broadcast(spec.select("__g", "__b").distinct()), ["__g", "__b"]
        )
        .withColumn("__lr", F.row_number().over(w))
        .join(F.broadcast(spec), ["__g", "__b", "__lr"])
        .select("__g", "frac", "__pos", "__role", "__v")
    )
    if direct_rows:
        direct = spark.createDataFrame(
            direct_rows,
            f"__g {gtype}, frac double, __pos double, __role string, __v double",
        )
        picked = picked.unionByName(direct)
    piv = picked.groupBy("__g", "frac", "__pos").agg(
        F.max(F.when(F.col("__role") == "lo", F.col("__v"))).alias("__vlo"),
        F.max(F.when(F.col("__role") == "hi", F.col("__v"))).alias("__vhi"),
    )
    p = F.col("__pos")
    q = F.when(F.ceil(p) == F.floor(p), F.col("__vlo")).otherwise(
        F.col("__vlo") * (F.ceil(p) - p) + F.col("__vhi") * (p - F.floor(p))
    )
    return piv.select(F.col("__g").alias(group_col), "frac", q.alias("q"))


def grouped_quantiles_lowcard(
    df: DataFrame,
    group_col: str,
    value: Column,
    fracs: list[float],
) -> DataFrame:
    """Exact per-group linear-interpolated quantiles for values of
    BOUNDED CARDINALITY (integers, fixed-decimal roundings — document
    lengths, 4-dp norms, absolute deviations of either): the
    per-(group, value) HISTOGRAM is domain-bounded, never
    corpus-proportional, so per-group windows over it are scale-safe
    where a grouped ``percentile()`` aggregate (whole column in one
    buffer) and even per-group selection machinery are not. One
    aggregate + one windowed cumulative count; everything stays lazy
    (no plan-time actions), so nested uses — a MAD that re-enters with
    ``|x − median|`` — stay cheap.

    Interpolation reproduces ``percentile()`` term for term:
    0-indexed ``pos = (n−1)·f``, ``q = v_lo·(ceil(pos) − pos) +
    v_hi·(pos − floor(pos))``. NULL values are excluded (aggregate
    semantics); a group with no non-NULL values contributes no rows.

    Returns ``(<group_col>, frac DOUBLE, q DOUBLE)``.
    """
    spark = df.sparkSession
    hist = (
        df.select(F.col(group_col).alias("__g"), value.cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy("__g").orderBy("__v")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "__g",
        "__v",
        F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    fr = spark.createDataFrame([(float(f),) for f in fracs], "frac double")
    # Target 0-indexed positions per (group, frac): the histogram row
    # count per group is domain-bounded, so the crossJoin fan-out is
    # #fracs, not data-proportional.
    pos = (F.col("__n") - 1) * F.col("frac")
    targets = cum.crossJoin(F.broadcast(fr)).select(
        "__g", "__v", "__cum", "frac", pos.alias("__pos")
    )
    v_lo = (
        targets.filter(F.col("__cum") >= F.floor(F.col("__pos")) + 1)
        .groupBy("__g", "frac")
        .agg(F.min("__v").alias("__vlo"), F.min("__pos").alias("__pos"))
    )
    v_hi = (
        targets.filter(F.col("__cum") >= F.ceil(F.col("__pos")) + 1)
        .groupBy("__g", "frac")
        .agg(F.min("__v").alias("__vhi"))
    )
    joined = v_lo.join(v_hi, ["__g", "frac"])
    p = F.col("__pos")
    q = F.when(F.ceil(p) == F.floor(p), F.col("__vlo")).otherwise(
        F.col("__vlo") * (F.ceil(p) - p) + F.col("__vhi") * (p - F.floor(p))
    )
    return joined.select(F.col("__g").alias(group_col), "frac", q.alias("q"))
