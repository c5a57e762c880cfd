"""Streaming medallion ingest: raw CSV stream -> bronze parquet sink.

The streaming twin of plans/bronze.py. The stateless transforms
(normalise/cast/derive) are REUSED verbatim — they are row-local
projections, legal in any streaming plan. Only dedup changes shape:

  batch  dedup = max_by(struct) per key over the whole batch
         ("latest txn_ts wins", reference etl_transactions_bronze.py:61-80)
  stream dedup = dropDuplicatesWithinWatermark(txn_id)
         ("first arrival wins", state bounded by the watermark)

"Latest wins" is UNKNOWABLE on an unbounded stream — a later record can
always arrive — so first-wins-within-watermark is the principled
streaming semantics; tests assert both drop the same duplicate keys.

The parquet sink commits files transactionally per micro-batch via the
checkpoint's write-ahead log: exactly-once file output, the property the
reference approximated with Glue job bookmarks (SURVEY.md §2.12 D1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from aws_payment_data_lake_spark.plans.bronze import (
    cast_dtypes,
    derive_txn_date,
    normalise_strings,
)
from aws_payment_data_lake_spark.plans.schemas import RAW_SCHEMA

DEFAULT_WATERMARK = "1 day"


def read_raw_stream(spark: SparkSession, raw_dir: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Stream the raw zone: header CSVs under ingest_date= dirs, explicit
    schema (streams cannot infer)."""
    reader = (spark.readStream.schema(RAW_SCHEMA)
              .option("header", True).option("basePath", raw_dir))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(raw_dir)


def run_bronze_stream(raw: DataFrame,
                      watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Ordered bronze transforms, streaming dedup in place of the batch
    aggregation."""
    df = normalise_strings(raw)
    df = cast_dtypes(df)
    df = (df.withWatermark("txn_ts", watermark)
          .dropDuplicatesWithinWatermark(["txn_id"]))
    return derive_txn_date(df)


def start_bronze_sink(bronze: DataFrame, path: str,
                      checkpoint_dir: str) -> StreamingQuery:
    """Partitioned parquet sink with checkpointed exactly-once commits,
    drained with AvailableNow (swap the trigger for a processing-time one
    in continuous ingest)."""
    return (
        bronze.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("txn_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
