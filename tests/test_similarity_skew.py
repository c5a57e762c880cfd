"""IVF recall bound (the docstring's promise in operators/similarity.py)
and salted-aggregation equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.skew import salted_user_value_totals
from aws_payment_data_lake_spark.queries import all_queries
from aws_payment_data_lake_spark.sources import load


def test_ivf_recall_vs_brute_force(spark):
    bf = {(r["query_id"], r["neighbor_id"]) for r in
          all_queries()["knn_brute_force"].fn(spark, SF_DIR).collect()}
    from aws_payment_data_lake_spark.queries.similarity import knn_ivf_probe

    ivf = {(r["query_id"], r["neighbor_id"]) for r in
           knn_ivf_probe(spark, SF_DIR).collect()}
    recall = len(bf & ivf) / len(bf)
    # measured 0.92-0.94 at 4/16 probes on the testdata; 0.8 is the
    # regression floor, not the target
    assert recall >= 0.8, f"IVF recall@5 regressed: {recall}"


def test_salted_agg_equals_plain_agg(spark):
    (events,) = load(spark, SF_DIR, "events")
    salted = {r["user_id"]: (r["n_events"], r["sum_value"])
              for r in salted_user_value_totals(events).collect()}
    plain = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
    ).collect()}
    assert salted == plain


def test_salted_agg_splits_hot_key(spark):
    # one pathological key with 10k distinct rows: the salt must spread
    # it over multiple partial groups, and the merge must still be exact
    hot = spark.range(10_000).select(
        F.lit(1).alias("user_id"), F.col("id").cast("double").alias("value"))
    salted = (hot.withColumn(
        "_salt", F.pmod(F.xxhash64("user_id", "value"), F.lit(16)))
        .groupBy("user_id", "_salt").count())
    assert salted.count() > 1  # hot key spread over >1 reducer
    got = salted_user_value_totals(hot).collect()[0]
    assert got["n_events"] == 10_000
    assert got["sum_value"] == sum(range(10_000))
