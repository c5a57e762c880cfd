"""Exact-percentile oracle check + error bounds for the sketch aggregates."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR, compare_with_oracle

from aws_payment_data_lake_spark.queries import all_queries
from aws_payment_data_lake_spark.sources import load


def test_percentile_exact_matches_oracle(spark, duck):
    compare_with_oracle(spark, duck, all_queries()["percentile_lineitem_price"])


def test_approx_sketches_within_bounds(spark):
    from aws_payment_data_lake_spark.queries.stats import (
        approx_distinct_quantiles,
    )

    approx = {r["o_orderpriority"]: r for r in
              approx_distinct_quantiles(spark, SF_DIR).collect()}
    (orders,) = load(spark, SF_DIR, "orders")
    exact = {r["o_orderpriority"]: r for r in (
        orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_customers"),
             F.percentile("o_totalprice", F.lit(0.5)).alias("med"),
             F.percentile("o_totalprice", F.lit(0.99)).alias("p99"))
    ).collect()}
    assert approx.keys() == exact.keys()
    for prio, e in exact.items():
        a = approx[prio]
        # HLL++ at rsd=0.01: allow 5 sigma.
        assert abs(a["approx_customers"] - e["n_customers"]) <= max(
            5, 0.05 * e["n_customers"])
        # GK sketch returns an actual data value near the quantile.
        assert abs(a["approx_median_price"] - e["med"]) <= 0.05 * e["med"]
        assert abs(a["approx_p99_price"] - e["p99"]) <= 0.05 * e["p99"]
