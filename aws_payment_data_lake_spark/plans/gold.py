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


# ---------------------------------------------------------------------------
# Incremental gold maintenance (round 7): merge-on-append instead of
# full recompute.
#
# At 100 TB the gold job must NOT rescan historic silver on every daily
# append — the lakehouse pattern is a MERGEABLE state table: keep only
# aggregates with an associative+commutative merge (counts, sums,
# sketches), fold each new silver slice into the state, and derive the
# non-mergeable report columns (avg, rates, distinct estimates) at read
# time. Cost per day becomes one delta-sized aggregation plus a
# gold-sized (days x status / merchants — thousands of rows, not
# billions) re-merge, independent of corpus history.
#
# countDistinct(user_id) is the one non-mergeable KPI column; the state
# carries Spark's HLL sketch instead (F.hll_sketch_agg — register-max
# merge is order-independent, so sketch-of-union == union-of-sketches
# EXACTLY, and the incremental estimate equals the batch estimate
# bit-for-bit; asserted in tests/test_incremental_gold.py).
# ---------------------------------------------------------------------------


def daily_totals_merge(prior: DataFrame, delta_silver: DataFrame
                       ) -> DataFrame:
    """Fold a new silver slice into a daily_totals gold table; equals
    daily_totals(full silver) exactly (counts and decimal-exact sums
    are associative). `prior` is gold-sized — history is never
    rescanned."""
    d = (delta_silver.groupBy("txn_date", "status_curated")
         .agg(F.count(F.lit(1)).alias("n_txns"),
              F.sum("amount").alias("gross_amount")))
    return (prior.unionByName(d)
            .groupBy("txn_date", "status_curated")
            .agg(F.sum("n_txns").alias("n_txns"),
                 F.sum("gross_amount").alias("gross_amount"))
            .orderBy("txn_date", "status_curated"))


def merchant_kpi_state(silver: DataFrame) -> DataFrame:
    """Mergeable per-merchant state: counts, sums, success counts, and
    an HLL user sketch — everything merchant_kpis derives, in
    merge-closed form."""
    is_success = (F.col("status_curated") == "SUCCESS").cast("long")
    return (silver.groupBy("merchant_id")
            .agg(F.count(F.lit(1)).alias("n_txns"),
                 F.sum("amount").alias("gross_amount"),
                 F.sum(is_success).alias("n_success"),
                 F.hll_sketch_agg("user_id").alias("users_hll")))


def merchant_kpi_state_merge(*states: DataFrame) -> DataFrame:
    """Merge any number of state tables (prior gold state + per-day
    delta states): sums add, sketches union — associative and
    commutative, so batching and arrival order never change the
    result."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return (unioned.groupBy("merchant_id")
            .agg(F.sum("n_txns").alias("n_txns"),
                 F.sum("gross_amount").alias("gross_amount"),
                 F.sum("n_success").alias("n_success"),
                 F.hll_union_agg("users_hll").alias("users_hll")))


def merchant_kpi_report(state: DataFrame) -> DataFrame:
    """Read-time derivation of the report columns from the state table:
    avg and success-rate are ratios of state sums; distinct users is
    the sketch estimate (column named *_approx — the exact
    `merchant_kpis` stays the batch-recompute truth)."""
    return (state.select(
        "merchant_id", "n_txns", "gross_amount",
        F.round(F.col("gross_amount") / F.col("n_txns"), 6)
        .alias("avg_amount"),
        F.hll_sketch_estimate("users_hll").alias("n_users_approx"),
        "n_success",
        F.round(F.col("n_success") / F.col("n_txns"), 6)
        .alias("success_rate"))
        .orderBy("merchant_id"))
