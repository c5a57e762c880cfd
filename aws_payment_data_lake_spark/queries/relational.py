"""Relational query surface: scan/filter/project/join/agg/window/sort/set-ops.

This is the engine's stand-in for the reference's declared-but-absent
Athena SQL layer (S9, README.md:33,67,88-89) and gold-layer aggregates
(A3, README.md:130), exercised over the driver's TPC-H-ish tables.

Every query is written DataFrame-first and lets Catalyst pick physical
strategy; where a join side is known-small (region/nation/supplier/part at
any scale factor; they are dimensions) we hint ``broadcast`` so the plan
stays shuffle-free on the fact side at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load


# --------------------------------------------------------------------------
# Q1: pricing summary (flagship). Scan -> filter -> hash agg -> sort.
# Mirrors the reference's only aggregation machinery (A1-A3) generalized to
# a full groupBy().agg() (SURVEY.md §2.5). Filter pushes to the parquet
# scan; aggregation is partial (map-side) then final — one shuffle on the
# 2-value grouping key, which AQE coalesces to a handful of partitions.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 6)                                        AS avg_qty,
      round(avg(l_extendedprice), 6)                                   AS avg_price,
      round(avg(l_discount), 6)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary over lineitem."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
