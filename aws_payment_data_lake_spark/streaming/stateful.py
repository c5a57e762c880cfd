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


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Twin of `user_running_totals` on Spark 4's successor API,
    transformWithStateInPandas (StatefulProcessor + named value state —
    the API that adds multiple state variables, timers, TTL and
    initial-state handover that applyInPandasWithState lacks).

    ENVIRONMENT-GATED: the TransformWithStateInPySpark driver worker
    speaks protobuf to the JVM, and this container ships no
    `google.protobuf` (measured failure:
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError
    'descriptor' from google.protobuf). Same contract as the Delta
    format flag (sources/writers.py): raise immediately, naming the
    missing dep, rather than crash mid-query; the semantics themselves
    are covered by `user_running_totals`, whose
    applyInPandasWithState path has no protobuf dependency. Requires
    the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass)."""
    import importlib.util

    if importlib.util.find_spec("google") is None or (
            importlib.util.find_spec("google.protobuf") is None):
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(google.protobuf) for its streaming Python runner; install "
            "protobuf or use user_running_totals "
            "(applyInPandasWithState) which has identical semantics "
            "here.")

    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, s = (self._totals.get() if self._totals.exists()
                    else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "sum_value": [s]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
