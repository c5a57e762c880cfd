"""SparkSession factory for the engine.

Replaces the reference's Glue bootstrap (``SparkContext -> GlueContext ->
glueContext.spark_session``, src/glue_jobs/etl_transactions_bronze.py:12-17)
and its local-dev session (notebooks/transactions_bronze_dev.ipynb cell-1)
with one explicit, scale-tuned builder.

Config choices, each with the 100 TB rationale:
  * ``spark.sql.session.timeZone=UTC`` — the reference's timestamps are
    naive UTC (generate_transaction_data.py:159); pinning the session TZ
    makes every to_timestamp/to_date deterministic and oracle-matchable.
  * AQE on (+ skew join) — runtime coalescing of shuffle partitions and
    skew splitting; on a 1000-executor cluster this is what keeps one hot
    merchant/user key from stalling a stage.
  * ``spark.sql.shuffle.partitions`` — sized from env; at real scale this
    is a starting hint only because AQE re-coalesces.
  * Arrow enabled — every Pandas-UDF boundary (multimodal decode, optional
    vectorized paths) moves data in Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "aws-payment-data-lake-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession. ``extra_conf``
    overrides any default (e.g. {"spark.ui.enabled": "true"} for the
    REST-metrics probes — the UI is off by default to keep test/bench
    startup lean)."""
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Spark still defaults timestamps to legacy INT96, which
        # carries NO footer min/max statistics — every timestamp
        # range predicate then reads every file (no row-group skip,
        # no txlog/manifest pruning). TIMESTAMP_MICROS is the modern
        # parquet logical type: stats-bearing and what every other
        # engine (DuckDB, Arrow, Trino) writes and expects.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
