"""Statistical aggregates: exact percentiles + sketch-based approximations.

Two tiers, mirroring the engine's scale posture everywhere else:
  exact        `F.percentile` / `F.median` — single-pass sort-based exact
               quantiles, oracle-checked against DuckDB's quantile_cont
               (both define quantiles by linear interpolation).
  approximate  HLL++ distinct counts and GK-sketch quantiles
               (`approx_count_distinct`, `percentile_approx`) — the
               100 TB path: fixed-size sketches, map-side mergeable, one
               shuffle of sketch bytes instead of a distinct-expand or a
               full sort. Estimates are engine-specific -> rows-only
               driver check; tests/test_stats.py bounds them against the
               exact values instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load


@register(
    "percentile_lineitem_price",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           round(median(l_extendedprice), 4) AS med
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "percentile", "exact"),
)
def percentile_lineitem_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles of extended price per return flag (linear
    interpolation — the definition Spark's `percentile` and DuckDB's
    `quantile_cont` share)."""
    (li,) = load(spark, sf_dir, "lineitem")
    # ONE percentile aggregate evaluating every requested quantile from a
    # single per-group value buffer — separate percentile()/median() calls
    # would each keep their own copy of the group's values (6x the state
    # and sort work for the same answer).
    qs = F.percentile("l_extendedprice",
                      F.array(*[F.lit(p) for p in (0.25, 0.50, 0.75, 0.99)]))
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), qs.alias("_qs"))
        .select("l_returnflag", "n_rows",
                F.round(F.col("_qs")[0], 4).alias("p25"),
                F.round(F.col("_qs")[1], 4).alias("p50"),
                F.round(F.col("_qs")[2], 4).alias("p75"),
                F.round(F.col("_qs")[3], 4).alias("p99"),
                F.round(F.col("_qs")[1], 4).alias("med"))
        .orderBy("l_returnflag")
    )


def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per order priority: HLL++ distinct customers
    (rsd 0.01) and GK-sketch price quantiles (accuracy 10000).
    Unregistered (sketch estimates are engine-specific, so the driver
    could only record a weak rows-only row, and the registry is capped at
    the driver's 50-query window) — tests/test_stats.py asserts the
    estimates against exact values (HLL++ rsd and percentile_approx
    accuracy bounds) and it stays on the bench."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01)
             .alias("approx_customers"),
             F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
             .alias("approx_median_price"),
             F.percentile_approx("o_totalprice", F.lit(0.99), F.lit(10000))
             .alias("approx_p99_price"))
        .orderBy("o_orderpriority")
    )
