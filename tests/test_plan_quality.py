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
    "join_semi_customers_with_urgent",
    "join_anti_customers_no_urgent",
    "text_lang_id",
])
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_lang_id_is_shuffle_free_map(spark):
    plan = plan_of(spark, "text_lang_id")
    # one Exchange only: the global orderBy's range partitioning
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
