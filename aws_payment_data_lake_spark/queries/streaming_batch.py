"""Event-time window aggregations (batch form of the streaming surface).

These run F.window / F.session_window in BATCH mode so the driver can
oracle-check the window semantics; the streaming/ package runs the same
expressions under Structured Streaming with watermarks, and
tests/test_streaming.py asserts stream==batch parity. Spark's tumbling
windows are epoch-aligned, exactly like DuckDB's time_bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load


@register(
    "tumbling_window_events",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours'
             AS window_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window", "tumbling"),
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour tumbling windows per event type."""
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "streaming_tumbling_live",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours'
             AS window_end,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "structured-streaming", "window", "tumbling"),
)
def streaming_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming path, driver-checkable: file-source
    stream -> watermark -> tumbling agg, drained with AvailableNow into a
    memory sink. Complete-mode output over a finite source equals the
    batch query, so it shares the batch oracle — the parity claim of
    streaming/events.py, checked end-to-end."""
    import os

    from aws_payment_data_lake_spark.streaming import (
        read_event_stream,
        run_available_now,
        tumbling_counts,
    )

    stream = tumbling_counts(
        read_event_stream(spark, os.path.join(sf_dir, "events.parquet")))
    out = run_available_now(stream, "mem_streaming_tumbling",
                            output_mode="complete")
    return out.orderBy("window_start", "event_type")


@register(
    "sliding_window_events",
    oracle="""
    WITH grid AS (
      SELECT time_bucket(INTERVAL '2 hours', ts) AS window_start, *
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '2 hours', ts, INTERVAL '1 hour')
               AS window_start, *
      FROM events
      WHERE time_bucket(INTERVAL '2 hours', ts, INTERVAL '1 hour')
            <> time_bucket(INTERVAL '2 hours', ts)
    )
    SELECT window_start, window_start + INTERVAL '2 hours' AS window_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM grid
    GROUP BY 1, 2
    ORDER BY window_start
    """,
    tags=("streaming", "window", "sliding"),
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in 2 windows
    (Spark expands via its window generator; the oracle unions the two
    shifted tumbling grids — identical window sets)."""
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_events", "sum_value")
        .orderBy("window_start")
    )


@register(
    "streaming_sliding_live",
    oracle="""
    WITH grid AS (
      SELECT time_bucket(INTERVAL '2 hours', ts) AS window_start, *
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '2 hours', ts, INTERVAL '1 hour')
               AS window_start, *
      FROM events
      WHERE time_bucket(INTERVAL '2 hours', ts, INTERVAL '1 hour')
            <> time_bucket(INTERVAL '2 hours', ts)
    )
    SELECT window_start, window_start + INTERVAL '2 hours' AS window_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM grid
    GROUP BY 1, 2
    ORDER BY window_start
    """,
    tags=("streaming", "structured-streaming", "window", "sliding"),
)
def streaming_sliding_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h width, 1h slide) under REAL Structured
    Streaming, drained with AvailableNow in complete mode — with the
    tumbling and session live variants this covers every window family
    the batch surface declares, each hash-matched against the batch
    oracle."""
    import os

    from aws_payment_data_lake_spark.streaming import (
        read_event_stream,
        run_available_now,
    )

    ev = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    stream = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_events", "sum_value")
    )
    out = run_available_now(stream, "mem_streaming_sliding",
                            output_mode="complete")
    return out.orderBy("window_start")


@register(
    "streaming_session_live",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL '12 hours'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '12 hours' AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "structured-streaming", "window", "session"),
)
def streaming_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under REAL Structured Streaming: watermarked
    session_window aggregation drained with AvailableNow in complete mode
    (the only mode Spark allows for session-window streams besides
    append; complete over a finite source equals the batch result, so the
    batch oracle applies verbatim and the session-merge state machine is
    exercised end-to-end)."""
    import os

    import pyspark.sql.functions as FF

    from aws_payment_data_lake_spark.streaming import (
        read_event_stream,
        run_available_now,
    )

    ev = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    stream = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.session_window("ts", "12 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             FF.round(F.sum("value"), 4).alias("sum_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "sum_value")
    )
    out = run_available_now(stream, "mem_streaming_session",
                            output_mode="complete")
    return out.orderBy("user_id", "session_start")


@register(
    "session_window_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL '12 hours'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '12 hours' AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "window", "session"),
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 12h inactivity gap. Spark merges
    events whose gap < 12h; the oracle rebuilds the same islands with a
    lag + running-sum (the classic gaps-and-islands rewrite).

    Session end is last-event + gap (Spark's definition)."""
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "12 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    )
