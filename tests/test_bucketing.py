"""Bucketed layout: the equi-join over co-bucketed tables has NO shuffle.

This is plan-shape verification (like tests/test_plan_quality.py): the
point of bucketing is invisible at test scale and decisive at 100 TB —
the Exchange that a plain join needs on BOTH fact tables disappears.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)
from aws_payment_data_lake_spark.sources import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    orders, lineitem = load(spark, SF_DIR, "orders", "lineitem")
    write_bucketed(orders, "b_orders", bucket_col="o_orderkey",
                   n_buckets=8, path=str(base / "b_orders"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", bucket_col="o_orderkey",
        n_buckets=8, path=str(base / "b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on="o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    orders, lineitem = load(spark, SF_DIR, "orders", "lineitem")
    got = bucketed_join(spark, left, right, on="o_orderkey").count()
    want = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey").count()
    assert got == want


def test_bucketed_aggregation_is_shuffle_free(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = (spark.table(right).groupBy("o_orderkey")
           .agg(F.sum("l_quantity").alias("qty")))
    assert "Exchange hashpartitioning" not in _plan(agg)
