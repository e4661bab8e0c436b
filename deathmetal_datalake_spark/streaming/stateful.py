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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
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
