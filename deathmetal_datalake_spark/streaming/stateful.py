"""Custom stateful streaming operator via ``applyInPandasWithState``.

The mandated pattern for operators Structured Streaming lacks natively
(SURVEY.md §7.3 M4): per-key mutable state carried across micro-batches
with Arrow-batched Python processing. The example operator maintains
running per-user counters (event count, value total, max ts seen) and
emits the updated row each batch — the building block for online
feature aggregation over an event stream.

Scale notes: state lives in the state store, partitioned by key —
scales horizontally with executors; memory per key is O(1).
:func:`running_user_totals_with_timeout` adds the production-mandatory
piece: ``GroupStateTimeout.ProcessingTimeTimeout`` eviction, so idle
keys are flushed (emitted with ``evicted = true``) and their state
removed instead of accumulating forever.
:func:`sessionized_user_counts` is the EVENT-TIME form of eviction —
watermark-driven, hence deterministic and driver-checked
(``plans/streaming_catalog.streaming_eviction_sessions_replay``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user running totals, updated per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Timeout-evicting variant: identical running totals, but idle keys are
# flushed and their state removed after ``idle_timeout_ms`` of
# processing time with no new events — unbounded-key streams (user ids
# at 100 TB scale) need this or the state store grows monotonically.
# ---------------------------------------------------------------------------

EVICTING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("evicted", BooleanType(), False),
    ]
)


def _make_evicting_update(idle_timeout_ms: int):
    def _update_with_timeout(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Final flush for an idle key: emit the closing row, drop state.
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "evicted": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "evicted": [False],
            }
        )

    return _update_with_timeout


def running_user_totals_with_timeout(
    events: DataFrame, idle_timeout_ms: int = 60_000
) -> DataFrame:
    """Per-user running totals with idle-key eviction.

    Keys silent for ``idle_timeout_ms`` of processing time are emitted
    once more with ``evicted = true`` and removed from the state store.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_evicting_update(idle_timeout_ms),
        outputStructType=EVICTING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming as-of join: each purchase matched to the latest click
# at-or-before it, per user, across micro-batches. The batch form is
# plans/events.events_asof_click_before_purchase (union-sort-carry
# window); here the carried value IS the state — per-user last click
# (ts, tie-break id) — so the operator needs O(1) state per key and one
# state-store lookup per batch, the canonical stateful-join shape for
# unbounded streams. Rows are processed in (ts, kind, event_id) order
# inside each batch, matching the batch window's tie-break exactly, so
# batch ≡ stream holds whenever delivery is event-time ordered across
# batches (the replay contract of the landing pipeline).
# ---------------------------------------------------------------------------

ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("purchase_ts", TimestampNTZType(), True),
        StructField("asof_click_ts", TimestampNTZType(), True),
    ]
)

# state: (last_click_ts_micros,) — -1 = no click seen yet
ASOF_STATE_SCHEMA = StructType([StructField("last_click_us", LongType(), False)])

_NO_CLICK = -1


def _asof_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (last_us,) = state.get if state.exists else (_NO_CLICK,)
    out_eid: list[int] = []
    out_pts: list[pd.Timestamp] = []
    out_cts: list[pd.Timestamp | None] = []
    # A group's micro-batch may arrive as SEVERAL Arrow chunks with no
    # ordering guarantee between them; concatenate first and sort ONCE
    # so the carried state is applied in the batch query's total order
    # (clicks sort before purchases at the same timestamp).
    chunks = list(pdfs)
    whole = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else pd.DataFrame(columns=["event_id", "ts", "event_type"])
    )
    if len(whole):
        kind = (whole["event_type"] == "purchase").astype(int)
        ordered = whole.assign(__kind=kind).sort_values(
            ["ts", "__kind", "event_id"], kind="mergesort"
        )
        for _, row in ordered.iterrows():
            if row["__kind"] == 0:
                last_us = max(last_us, row["ts"].value // 1000)
            else:
                out_eid.append(int(row["event_id"]))
                out_pts.append(row["ts"])
                out_cts.append(
                    None if last_us == _NO_CLICK else pd.Timestamp(last_us * 1000)
                )
    state.update((last_us,))
    yield pd.DataFrame(
        {
            "event_id": pd.Series(out_eid, dtype="int64"),
            "user_id": pd.Series([key[0]] * len(out_eid), dtype="int64"),
            "purchase_ts": pd.Series(out_pts, dtype="datetime64[us]"),
            "asof_click_ts": pd.Series(out_cts, dtype="datetime64[us]"),
        }
    )


def streaming_asof_click_before_purchase(events: DataFrame) -> DataFrame:
    """Streaming as-of join over (click, purchase) events per user."""
    filtered = events.filter(F.col("event_type").isin(["click", "purchase"]))
    return filtered.groupBy("user_id").applyInPandasWithState(
        _asof_update,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# EVENT-TIME eviction: gap-based sessionization where closing a session
# is the eviction itself (``GroupStateTimeout.EventTimeTimeout``). The
# processing-time variant above is inherently wall-clock dependent —
# no deterministic replay can pin when its timeout fires — but an
# event-time timeout is driven by the WATERMARK, which is a pure
# function of the data: that makes this the driver-checkable form of
# state eviction (NEXT.md §2).
#
# Two paths close a session, and they provably agree:
# - gap split inside the update: a new event ``gap`` or more after the
#   session's last event emits the old session and starts a new one;
# - timeout eviction: the watermark passing ``last_ts + gap`` proves no
#   earlier-than-watermark event can arrive, so the session can never
#   be extended — emit and REMOVE the state (idle keys don't pin the
#   state store).
# Under event-time-ordered delivery (the landing contract,
# ``_replay_events_stream_ts_ordered``), any event that would find its
# key already evicted has ``ts >= watermark > last_ts + gap``, i.e. it
# would have gap-split anyway — both paths yield the identical session
# partition, which is why the batch sessionization SQL is an exact
# oracle for the emitted set.
#
# Scale: state is O(1) per ACTIVE key (three longs); eviction bounds
# the store at "keys active within the trailing gap", not all keys ever
# seen — the property that keeps a 100 TB / billions-of-users stream
# runnable.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampNTZType(), False),
        StructField("last_ts", TimestampNTZType(), False),
        StructField("n_events", LongType(), False),
    ]
)

# (start_us, last_us, n_events) — epoch-micros; micros is the native
# parquet/pandas resolution so the round-trip is exact.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _make_session_update(gap_us: int):
    def _update_sessions(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "last_ts": [pd.to_datetime(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield emit(start_us, last_us, n)
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        # In-batch arrival order is not ts order (multi-file micro
        # batches); the session partition is defined over ts order.
        batch = batch.sort_values("ts", kind="mergesort")
        # Pin resolution before the int cast: pandas may hand the column
        # over as datetime64[ns] or [us] depending on Arrow version.
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        closed: list[pd.DataFrame] = []
        for us in ts_us:
            us = int(us)
            if n > 0 and us - last_us >= gap_us:
                closed.append(emit(start_us, last_us, n))
                n = 0
            if n == 0:
                start_us = us
            last_us = us
            n += 1
        state.update((start_us, last_us, n))
        # Evict once the watermark proves the open session unreachable.
        # The watermark ticks on wm_ts (an instant; NTZ wall time is not
        # watermarkable) while session logic runs on NTZ walls — if the
        # session timezone is not UTC the two scales differ by the tz
        # offset, so clamp above the current watermark: eviction may then
        # fire a little later/earlier, but WHICH sessions exist is fixed
        # by the gap-split rule, so the output is unchanged.
        state.setTimeoutTimestamp(
            max((last_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        for df in closed:
            yield df

    return _update_sessions


def sessionized_user_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap sessionization with event-time state eviction.

    Emits one row per CLOSED session ``(user_id, session_start,
    last_ts, n_events)``; a session closes when a later event arrives
    ``gap_minutes`` or more after its last event, or when the watermark
    passes ``last_ts + gap`` (eviction — the key is removed from the
    state store). Requires a watermark on ``ts``; output mode append.
    """
    return (
        events.withColumn("wm_ts", F.col("ts").cast("timestamp"))
        .withWatermark("wm_ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_update(gap_minutes * 60 * 1_000_000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming EWMA (alpha = 1/2, FULL recursion): the online form of the
# batch smoother (plans/events.events_ewma_smoothed truncates to 4
# taps to stay a pure window expression; the stream carries the exact
# recursion because state is free here). Order-sensitive like the
# as-of join: ewma_j = (ewma_{j-1} + v_j) / 2 must fold in event-time
# order, so the replay uses the ts-ordered delivery contract and each
# batch sorts by (ts, event_id) before folding. Every step is one IEEE
# double add + an exact halving — the identical op sequence DuckDB's
# sequential list_reduce performs, so batch ≡ stream holds bit-for-bit
# with NO rounding tolerance.
#
# Scale: O(1) state per key (two fields); the smoother every online
# feature store runs per entity.
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("ewma_value", DoubleType(), True),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("ewma", DoubleType(), False),
    ]
)


def _ewma_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, e = state.get if state.exists else (0, 0.0)
    chunks = list(pdfs)
    whole = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else pd.DataFrame(columns=["ts", "event_id", "value"])
    )
    if len(whole):
        # Arrow chunks carry no mutual order; sort ONCE per batch so the
        # recursion consumes the batch in the oracle's total order.
        ordered = whole.sort_values(["ts", "event_id"], kind="mergesort")
        for v in ordered["value"]:
            v = float(v)
            e = v if n == 0 else (e + v) / 2.0
            n += 1
    state.update((n, e))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_value": [e]}
    )


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user exact EWMA (alpha=1/2), updated
    per batch; requires event-time-ordered delivery across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Event-type TRANSITION counting — the streaming form of the Markov
# transition matrix (plans/events.events_type_transition_matrix). Like
# the as-of operator this is order-SENSITIVE: the transition (prev →
# next) depends on per-user event order, so the state is the user's
# LAST event type and each batch is sorted in-batch before pairing —
# correct under the landing pipeline's event-time-ordered delivery
# contract (the ts-ordered slice replay). The operator emits per-batch
# (prev, next) COUNT INCREMENTS, not totals — increments are
# append-only and mergeable, so the downstream rollup is a plain sum
# (the IVM split: stateful pairing in the stream, rollup as a batch
# transform over the sink).
# ---------------------------------------------------------------------------

TRANSITIONS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("prev_type", StringType(), False),
        StructField("next_type", StringType(), False),
        StructField("n_inc", LongType(), False),
    ]
)


def _transition_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from collections import Counter

    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        yield pd.DataFrame(
            {"user_id": [], "prev_type": [], "next_type": [], "n_inc": []}
        ).astype(
            {"user_id": "int64", "prev_type": "object",
             "next_type": "object", "n_inc": "int64"}
        )
        return
    rows = rows.sort_values(["micros", "event_id"])
    types = rows["event_type"].tolist()
    seq = ([state.get[0]] if state.exists else []) + types
    state.update((types[-1],))
    counts = Counter(zip(seq, seq[1:]))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(counts),
            "prev_type": [a for (a, _b) in counts],
            "next_type": [b for (_a, b) in counts],
            "n_inc": [int(n) for n in counts.values()],
        }
    )


def type_transition_increments(events: DataFrame) -> DataFrame:
    """Streaming events → per-batch (prev_type, next_type) increments.

    Requires event-time-ordered batch delivery across batches (rows
    within a batch may arrive unsorted; the operator sorts in-batch by
    (ts, event_id) at full microsecond precision).
    """
    ev = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("micros"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _transition_update,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType="last_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
