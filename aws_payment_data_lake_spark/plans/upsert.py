"""Partition-scoped upsert: the MERGE the medallion zones actually need.

The reference's bronze write is a blind append (etl_transactions_bronze
.py:130) — reruns duplicate data (SURVEY.md §1.5.3). The engine's default
is idempotent dynamic overwrite; this module adds the third mode: MERGE
an incremental batch into an existing bronze zone with latest-wins
semantics, touching ONLY the partitions the batch lands in.

That partition scoping is the scale story: merging a day of data into a
years-deep 100 TB zone reads and rewrites one day's directories, not the
table. (With a transactional table format — Delta/Iceberg, not in this
container — the same logic is `MERGE INTO`; this is the format-agnostic
parquet equivalent.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.plans.bronze import deduplicate


def upsert_bronze_partitions(spark: SparkSession, bronze_dir: str,
                             batch: DataFrame,
                             partition_col: str = "txn_date",
                             key: str = "txn_id",
                             order_col: str = "txn_ts") -> list:
    """Merge `batch` (bronze-schema rows) into the zone at `bronze_dir`.

    1. affected = distinct partition values in the batch (small driver
       list — one value per day, not per row);
    2. read ONLY those partitions from the existing zone (partition
       pruning makes this a directory-scoped scan);
    3. union + latest-wins dedup (same deterministic tiebreak as the
       bronze plan);
    4. dynamic-partition overwrite writes back only those directories.

    Returns the affected partition values (for logging/audit).

    `batch` must be independent of the target zone (a file batch, a
    stream micro-batch, a generated frame) — a lazy scan OF `bronze_dir`
    itself would dangle once the overwrite commits.
    """
    affected = [r[0] for r in batch.select(partition_col).distinct().collect()]
    existing = (spark.read.parquet(bronze_dir)
                .where(F.col(partition_col).isin(affected)))
    merged = deduplicate(
        existing.unionByName(batch.select(*existing.columns)),
        key=key, order_col=order_col)
    (merged.write.partitionBy(partition_col)
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(bronze_dir))
    return affected
