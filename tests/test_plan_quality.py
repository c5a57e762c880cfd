"""Plan-quality guards: the physical plans the engine relies on at scale.

These assert OPTIMIZER-visible properties, not timings: filters reach the
parquet scan, scans are column-pruned, dimension joins broadcast, and no
query degenerates into a cartesian product. A regression here is invisible
at sf0.001 but fatal at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.queries import all_queries


def plan_of(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_scan_pruned(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    import re
    (cols,) = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(cols.split(",")) == 7  # only the columns q1 touches


def test_q5_broadcasts_every_dimension(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    # tree lines only (the details section repeats each node)
    assert plan.count("BroadcastHashJoin Inner BuildRight") == 5
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", [
    "q3_shipping_priority",
    "join_semi_anti_customers",
    "text_profile",
])
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_text_profile_is_shuffle_free_map(spark):
    plan = plan_of(spark, "text_profile")
    # one Exchange only: the global orderBy's range partitioning
    assert plan.count("Exchange") <= 2


def test_returned_revenue_never_broadcasts_facts(spark):
    # orders and customer are O(SF) tables: the only broadcast allowed in
    # this plan is the HINTED fixed-size nation dimension. A broadcast of
    # an unfiltered fact OOMs executors at production scale (round-1
    # verdict). Disable the size-based threshold to simulate "every table
    # is big": whatever still broadcasts is a hard-coded hint.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "returned_revenue_by_customer")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # formatted explain prints each node twice (tree + detail section):
    # count tree entries "BroadcastExchange (<id>)" only
    import re

    n_broadcasts = len(re.findall(r"BroadcastExchange \(\d+\)", plan))
    assert n_broadcasts == 1, plan
