"""Bucketed writes -> shuffle-free co-located joins (the write-once,
join-many pattern for 100 TB fact tables).

These are PLAN tests: the point of bucketing is what disappears from the
physical plan (Exchange on the bucketed side), not the join result —
result parity with the unbucketed join is asserted once as a sanity
check.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.sources import load, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_orders_lineitem(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders, lineitem = load(spark, SF_DIR, "orders", "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"], path=str(base / "orders"))
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"], path=str(base / "lineitem"))
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_orders_lineitem):
    """Both sides bucketed 8-ways on the join key: the sort-merge join
    must read pre-partitioned buckets with ZERO Exchange nodes — the
    entire shuffle was paid once at write time."""
    with _forced_smj(spark):
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"))
        plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "SelectedBucketsCount" in plan, plan


def test_bucketed_side_skips_its_shuffle(spark, bucketed_orders_lineitem):
    """Bucketed fact joined to an UNBUCKETED table: only the unbucketed
    side shuffles (one Exchange, not two) — at 100 TB that's the whole
    fact-table shuffle avoided on every recurring join."""
    import re

    orders, lineitem = bucketed_orders_lineitem
    with _forced_smj(spark):
        j = spark.table("b_lineitem").join(
            orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = _plan(j)
    # formatted explain lists each node once in the tree and once in the
    # detail section — count the "(n) Exchange" detail headers.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_bucketed_join_matches_unbucketed_result(spark,
                                                 bucketed_orders_lineitem):
    orders, lineitem = bucketed_orders_lineitem
    want = (lineitem.join(orders,
                          F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(F.count(F.lit(1)), F.sum("l_quantity").cast("double"))
            .first())
    got = (spark.table("b_lineitem")
           .join(spark.table("b_orders"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .agg(F.count(F.lit(1)), F.sum("l_quantity").cast("double"))
           .first())
    assert tuple(got) == tuple(want)


class _forced_smj:
    """Force a non-broadcast join so the Exchange assertions are about
    bucketing, not about AQE choosing a broadcast."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        c = self.spark.conf
        self.saved = {k: c.get(k) for k in
                      ("spark.sql.autoBroadcastJoinThreshold",
                       "spark.sql.adaptive.enabled")}
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c.set("spark.sql.adaptive.enabled", "false")

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            self.spark.conf.set(k, v)
