"""Source/sink round-trip gallery: JSONL sink+scan, ORC sink+scan, and
the custom Python Data Source — one registered row, three variants.

The reference's raw zone is CSV (S3/S8); events-style data commonly
arrives as JSONL; ORC is the other columnar format a lake ingests; and
round 7 adds a first-class custom source built on the Python Data Source
API (sources/pydatasource.py). Each variant writes/generates, reads back
with an EXPLICIT schema (never inferSchema at scale — one pass over
100 TB just to guess types), and aggregates the round-tripped rows. The
oracle computes the same aggregates from the original parquet (jsonl,
orc) or from `range(n)` + the md5 row contract (pysource), so the hash
match proves each path is lossless for every carried type:

  * variant='jsonl' — JSON-lines write -> schema'd read of the
    event_id % 10 == 0 slice; timestamps survive via an explicit
    microsecond format (the JSON default truncates to millis), doubles
    survive shortest-round-trip literals, and the value sum is
    decimal-exact so no serialization noise can hide.
  * variant='orc'   — native ORC write -> read of the
    event_id % 10 == 1 slice; ORC carries int64/string/double/timestamp
    natively, so this certifies Spark's builtin ORC path end-to-end.
  * variant='pysource' — 20k deterministic synthetic payments read
    through `format("payments_synth")` (partition-parallel, Arrow-
    batched Python Data Source); the oracle regenerates the identical
    table from range(20000) with the same md5 field derivations, so the
    hash match certifies the source's planning + generation + Arrow
    boundary bit-for-bit, with no files involved at all.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.sources.pydatasource import read_payments

_JSONL_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

_PYSOURCE_N = 20_000

# DuckDB twin of the pysource row contract (sources/pydatasource.py):
# every field from md5(i) hex slices — substr is 1-based, Python is
# 0-based, so substr(,1,15)==h[0:15], substr(,16,2)==h[15:17], etc.
_PYSOURCE_ROWS_SQL = f"""
  SELECT ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT AS a,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 16, 2))::BIGINT AS b,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 18, 2))::BIGINT AS c
  FROM range(0, {_PYSOURCE_N}) t(i)
"""

_EVENTS_AGG_SQL = """
    SELECT '{variant}' AS variant,
           event_type AS grp,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id % 10 = {rem}
    GROUP BY event_type
"""


def _events_agg(df: DataFrame, variant: str) -> DataFrame:
    return (
        df.groupBy(F.col("event_type").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.countDistinct("user_id").alias("n_users"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(F.lit(variant).alias("variant"), "grp", "n_rows", "n_users",
                "first_ts", "last_ts", "sum_value")
    )


@register(
    "jsonl_events_roundtrip",
    oracle=_EVENTS_AGG_SQL.format(variant="jsonl", rem=0)
    + " UNION ALL "
    + _EVENTS_AGG_SQL.format(variant="orc", rem=1)
    + f"""
    UNION ALL
    SELECT 'pysource' AS variant,
           currency || '-' || status AS grp,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           make_timestamp(min(ts_us)) AS first_ts,
           make_timestamp(max(ts_us)) AS last_ts,
           sum(amount_cents) / 100.0 AS sum_value
    FROM (
      SELECT a % 10000 AS user_id,
             (a // 7) % 1000000 AS amount_cents,
             CASE b % 5 WHEN 0 THEN 'AUD' WHEN 1 THEN 'EUR'
                        WHEN 2 THEN 'GBP' WHEN 3 THEN 'JPY'
                        ELSE 'USD' END AS currency,
             CASE c % 4 WHEN 0 THEN 'completed' WHEN 1 THEN 'failed'
                        WHEN 2 THEN 'pending' ELSE 'refunded' END AS status,
             (1704067200 + a % 31536000) * 1000000 AS ts_us
      FROM ({_PYSOURCE_ROWS_SQL}))
    GROUP BY currency, status
    ORDER BY variant, grp
    """,
    tags=("source", "sink", "jsonl", "orc", "pydatasource", "roundtrip"),
)
def jsonl_events_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three source/sink round-trips, one tagged union (docstring above;
    the row name keeps its round-2 slot for cross-round comparability)."""
    (ev,) = load(spark, sf_dir, "events")
    cols = [f.name for f in _JSONL_SCHEMA.fields]
    tmp = tempfile.mkdtemp(prefix="roundtrip_events_")

    jsonl_out = os.path.join(tmp, "events_jsonl")
    # explicit microsecond format: the JSON default truncates to millis,
    # which would silently lose precision on round-trip (session TZ is
    # pinned UTC, so a zone-less pattern is unambiguous)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (ev.where(F.col("event_id") % 10 == 0).select(*cols)
       .write.mode("overwrite").option("timestampFormat", ts_fmt)
       .json(jsonl_out))
    jsonl_back = (spark.read.schema(_JSONL_SCHEMA)
                  .option("timestampFormat", ts_fmt).json(jsonl_out))

    orc_out = os.path.join(tmp, "events_orc")
    (ev.where(F.col("event_id") % 10 == 1).select(*cols)
       .write.mode("overwrite").orc(orc_out))
    orc_back = spark.read.schema(_JSONL_SCHEMA).orc(orc_out)

    pay = read_payments(spark, _PYSOURCE_N, num_partitions=8)
    pay_agg = (
        pay.groupBy("currency", "status")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.countDistinct("user_id").alias("n_users"),
             F.timestamp_micros(F.min("ts_us")).alias("first_ts"),
             F.timestamp_micros(F.max("ts_us")).alias("last_ts"),
             (F.sum("amount_cents") / F.lit(100.0)).alias("sum_value"))
        .select(F.lit("pysource").alias("variant"),
                F.concat_ws("-", "currency", "status").alias("grp"),
                "n_rows", "n_users", "first_ts", "last_ts", "sum_value")
    )

    return (_events_agg(jsonl_back, "jsonl")
            .unionByName(_events_agg(orc_back, "orc"))
            .unionByName(pay_agg)
            .orderBy("variant", "grp"))


def pysource_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unregistered bench twin (the registry is capped at the driver's
    50-query window; the registered pysource variant proves correctness
    at 20k rows): generate an sf-proportional payments table through the
    Python Data Source — 2M rows/sf-0.1, 20M at sf1.0 — across one
    partition per core, and aggregate. Times the full partition-planned,
    Arrow-batched Python->JVM generation path at throughput scale."""
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n = max(100_000, int(20_000_000 * sf))
    from aws_payment_data_lake_spark.session import cpu_count

    pay = read_payments(spark, n, num_partitions=cpu_count())
    # every aggregate map-side combinable (approx_count_distinct ships
    # HLL sketches, not (group, user) pairs): the probe measured an
    # exact countDistinct shuffling 43 MB of pair tuples for 2M rows,
    # which benchmarked the dedup shuffle instead of the SOURCE — with
    # sketches the shuffle is ~20 groups x a few KB per partition
    return (pay.groupBy("currency", "status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.approx_count_distinct("user_id").alias("n_users_approx"),
                 F.sum("amount_cents").alias("sum_cents"),
                 F.timestamp_micros(F.max("ts_us")).alias("last_ts")))


def pysource_stream_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unregistered bench entry (VERDICT r7 #8): the Python Data
    Source's STREAMING twin run as a two-leg checkpointed resume —
    leg 1 drains a prefix of the synthetic log into a parquet sink
    (AvailableNow), leg 2 restarts from the same checkpoint with the
    grown log and must deliver exactly the remainder. Times the
    micro-batch planning + Arrow generation + sink-manifest path and
    ASSERTS the exactly-once outcome (count and txn_id distinctness)
    rather than trusting it. Rows ~ sf-proportional (200k/sf-0.1)."""
    import shutil
    import tempfile

    from aws_payment_data_lake_spark.sources.pydatasource import (
        SOURCE_NAME,
        register_payments_source,
    )

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n = max(20_000, int(2_000_000 * sf))
    register_payments_source(spark)
    tmp = tempfile.mkdtemp(prefix="pysrc-resume-")
    out, ckpt = os.path.join(tmp, "rows"), os.path.join(tmp, "ckpt")
    try:
        def leg(visible: int) -> None:
            sdf = (spark.readStream.format(SOURCE_NAME)
                   .option("n", str(visible))
                   .option("numPartitions", "16").load())
            (sdf.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start().awaitTermination(300))

        leg(n // 2)
        leg(n)
        # one aggregation job for both proof counts (r13, guide §1.2:
        # the old count() + distinct().count() paid two full scans +
        # two action latencies for numbers one pass computes)
        got = spark.read.parquet(out)
        r = got.agg(F.count(F.lit(1)).alias("rows"),
                    F.count_distinct("txn_id").alias("uniq")).collect()[0]
        rows, uniq = int(r["rows"]), int(r["uniq"])
        assert rows == n == uniq, (rows, uniq, n)
        from aws_payment_data_lake_spark.localframe import local_frame
        return local_frame(
            spark,
            [("stream_resume_rows", rows), ("distinct_txn_ids", uniq)],
            "metric string, value long").coalesce(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
