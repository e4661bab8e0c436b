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
