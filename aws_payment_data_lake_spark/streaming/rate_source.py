"""Broker-style streaming ingest without a broker: the built-in
`rate-micro-batch` source standing in for Kafka/Kinesis.

The reference names a streaming-broker source as its upgrade path
(README "Potential Upgrades"); no broker ships in this container, so
the file source was the engine's only stream input. This module wires
a SECOND source kind — Spark's deterministic rate-micro-batch — through
the same event transforms and windowed aggregation used by the live
event streams, proving the plan surface is source-agnostic: swapping
in `format("kafka")` changes ONLY `read_rate_events` (plus the
value-deserialization select), never the transforms, watermarks, or
sinks downstream.

Determinism: event attributes derive from the source's monotonically
increasing `value` (never wall clock, never the source's own
timestamp), so a batch twin over `spark.range(n)` computes the exact
same rows and the stream==batch parity test is exact, the same
contract every other streaming operator here follows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Fixed epoch for synthetic event time (2024-01-01 00:00:00 UTC).
_EPOCH_S = 1_704_067_200
_EVENT_TYPES = ("view", "cart", "purchase")


def read_rate_events(spark: SparkSession, rows_per_batch: int = 10_000,
                     num_partitions: int = 4) -> DataFrame:
    """The broker stand-in: a deterministic unbounded source producing
    `rows_per_batch` rows per micro-batch (AvailableNow drains exactly
    one batch — the bounded-test shape)."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .option("startTimestamp", 0)
        .load()
    )


def synthetic_events(src: DataFrame) -> DataFrame:
    """value -> (event_id, user_id, event_type, amount, ts): the
    "deserialize the broker payload" step. Pure functions of `value`
    only — see module docstring."""
    v = F.col("value")
    return src.select(
        v.alias("event_id"),
        F.pmod(v * 7919, F.lit(97)).alias("user_id"),
        F.element_at(F.array(*[F.lit(t) for t in _EVENT_TYPES]),
                     (F.pmod(v * 104729, F.lit(3)) + 1).cast("int"))
        .alias("event_type"),
        (F.pmod(v * 15485863, F.lit(100_000)) / F.lit(100.0))
        .alias("amount"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + v % 3600).alias("ts"),
    )


def rate_window_totals(events: DataFrame,
                       watermark: str = "10 minutes") -> DataFrame:
    """5-minute tumbling totals per event type over the synthetic
    event time — identical aggregation shape to the live event-file
    streams (streaming/events.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("amount"), 2).alias("total_amount"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_amount")
    )


def rate_window_totals_batch(spark: SparkSession,
                             n_rows: int = 10_000) -> DataFrame:
    """Batch twin: the same mapping + aggregation over spark.range —
    the exact rows AvailableNow drains from one rate micro-batch."""
    ev = synthetic_events(spark.range(n_rows).select(
        F.col("id").alias("value")))
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("amount"), 2).alias("total_amount"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_amount")
    )
