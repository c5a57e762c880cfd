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


def test_string_stats_prefix_truncated_and_pruning_correct(spark,
                                                           tmp_path):
    """Long-string columns must not copy document-sized values into
    the log (spec v1.4: 64-char prefix, max rounded up with U+10FFFF
    so pruning never skips a matching file)."""
    import json
    import os
    from aws_payment_data_lake_spark.sources.txlog import TxnTable
    t = TxnTable(spark, str(tmp_path / "longstr"))
    big_a = "a" * 10_000
    big_z = "z" * 10_000
    t.create(spark.createDataFrame(
        [(1, big_a)], "id bigint, doc string"))
    t.append(spark.createDataFrame(
        [(2, big_z)], "id bigint, doc string"))
    sizes = []
    for v in t._versions_on_disk():
        with open(t._commit_path(v)) as f:
            c = json.load(f)
        sizes.append(os.path.getsize(t._commit_path(v)))
        for a in c.get("add", []):
            mm = a["stats"].get("doc")
            if mm:
                assert len(mm[0]) <= 64
                assert len(mm[1]) <= 65          # prefix + ceil char
    assert all(sz < 4096 for sz in sizes), sizes  # log stays KB-scale
    # pruning correctness: the rounded-up max still matches a value
    # that EXTENDS the truncated prefix
    from aws_payment_data_lake_spark.sources.txlog_batch import (
        read_txlog,
    )
    got = (read_txlog(spark, t.path)
           .where(f"doc = '{big_z}'").collect())
    assert len(got) == 1 and got[0].id == 2
    # and a scan-side bounded filter behaves
    assert t.snapshot().where("doc >= 'y'").count() == 1
