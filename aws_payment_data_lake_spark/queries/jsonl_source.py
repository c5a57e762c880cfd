"""JSON-lines source/sink round-trip (events-style data commonly arrives
as JSONL; the reference's raw zone is CSV, S3/S8 — this is the same
contract for the other common text format).

The registered query writes a deterministic slice of `events` out as
JSON-lines with Spark's JSON sink, reads it back with an EXPLICIT schema
(never inferSchema at scale — one pass over 100 TB just to guess types),
and aggregates the round-tripped rows. The oracle computes the same
aggregate over the original parquet, so the hash match proves the
JSONL write -> read path is lossless for every carried type (bigint,
string, double, microsecond timestamp under the session's pinned UTC).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load

_JSONL_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


@register(
    "jsonl_events_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id % 10 = 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("source", "sink", "jsonl", "roundtrip"),
)
def jsonl_events_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events (event_id % 10 == 0 slice) as JSON-lines, read the
    files back with the explicit schema, aggregate. Hash-matching the
    parquet-side oracle proves JSONL round-trip losslessness: timestamps
    survive via ISO-8601 (UTC session), doubles survive because the JSON
    writer emits shortest-round-trip literals, and the value sum is
    decimal-exact so no serialization noise can hide."""
    (ev,) = load(spark, sf_dir, "events")
    out = os.path.join(tempfile.mkdtemp(prefix="jsonl_events_"), "events_jsonl")
    # explicit microsecond format: the JSON default truncates to millis,
    # which would silently lose precision on round-trip (session TZ is
    # pinned UTC, so a zone-less pattern is unambiguous)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (ev.where(F.col("event_id") % 10 == 0)
       .select(*[f.name for f in _JSONL_SCHEMA.fields])
       .write.mode("overwrite").option("timestampFormat", ts_fmt).json(out))
    back = (spark.read.schema(_JSONL_SCHEMA)
            .option("timestampFormat", ts_fmt).json(out))
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .orderBy("event_type")
    )
