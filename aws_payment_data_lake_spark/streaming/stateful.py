"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the escape hatch for semantics Spark's built-in streaming
operators can't express: arbitrary per-key state (here: running per-user
totals) held in the state store across micro-batches, updated from
Arrow-batched pandas frames. State is (n_events, sum_value) per user —
O(|users|) regardless of stream length; the watermark-free NoTimeout
config fits a finite drain (AvailableNow), production keys would carry a
timeout to evict idle users.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _update_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [s]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in managed state;
    emits the updated totals for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
