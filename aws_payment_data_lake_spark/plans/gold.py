"""Gold-layer aggregates over Silver (SURVEY.md §2.5 A3).

The reference DECLARES "merchant KPIs, daily totals" as the gold layer
(README.md:130) but ships no code. Concrete here, over the silver schema
(plans/silver.py: validated rows + status_curated):

  merchant_kpis   per-merchant volume/value/success-rate/reach
  daily_totals    per-day volume/value by curated status

Both are single hash aggregations with map-side partial combine — at
100 TB each is one shuffle keyed on a low-cardinality column (50
merchants / days), so AQE coalesces the tiny result partitions and the
cost is the scan, which prunes to the few columns used.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merchant_kpis(silver: DataFrame) -> DataFrame:
    """Per-merchant KPIs: txn count, gross/avg value, distinct users,
    success share (status_curated = 'SUCCESS')."""
    is_success = (F.col("status_curated") == "SUCCESS").cast("long")
    return (
        silver.groupBy("merchant_id")
        .agg(F.count(F.lit(1)).alias("n_txns"),
             F.sum("amount").alias("gross_amount"),
             F.round(F.avg("amount"), 6).alias("avg_amount"),
             F.countDistinct("user_id").alias("n_users"),
             F.sum(is_success).alias("n_success"),
             F.round(F.sum(is_success) / F.count(F.lit(1)), 6)
             .alias("success_rate"))
        .orderBy("merchant_id")
    )


def daily_totals(silver: DataFrame) -> DataFrame:
    """Per-day, per-curated-status totals (the partition column makes
    date-ranged reads prune to the requested days)."""
    return (
        silver.groupBy("txn_date", "status_curated")
        .agg(F.count(F.lit(1)).alias("n_txns"),
             F.sum("amount").alias("gross_amount"))
        .orderBy("txn_date", "status_curated")
    )
