"""Runtime bloom-filter join pruning: the optimizer lever that matters
exactly at 100 TB, pinned so a config regression can't silently lose it.

At toy SF every dim broadcasts (64 MB threshold in session.py) and no
runtime filter is needed — the broadcast hash join IS the filter. At
warehouse scale the dim side exceeds broadcast, the join becomes a
shuffle join, and Spark (runtime.bloomFilter.enabled, on in our
session) builds a bloom over the FILTERED dim keys and injects
`might_contain(bloom, xxhash64(key))` into the fact side BEFORE its
shuffle — the fact table is pruned at scan-exchange time by a filter
the user never wrote. These tests simulate the scale conditions
(broadcast off, application-side scan-size threshold lowered from its
10 GB default) and assert both the injection and unchanged results."""

from __future__ import annotations

import pytest


@pytest.fixture()
def scale_conf(spark):
    """Simulate 100 TB join conditions on toy data: no broadcast, and
    the 10 GB application-side scan threshold lowered so the toy fact
    qualifies. Both confs are runtime-settable."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "0")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold", "10GB")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _join(spark, sf="/root/testdata/sf0.001"):
    fact = spark.read.parquet(f"{sf}/lineitem.parquet")
    dim = (spark.read.parquet(f"{sf}/orders.parquet")
           .where("o_totalprice > 400000"))
    return fact.join(dim, fact.l_orderkey == dim.o_orderkey)


def test_bloom_filter_enabled_in_session(spark):
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_bloom_injected_under_scale_conditions(scale_conf):
    spark = scale_conf
    plan = _executed_plan(_join(spark).groupBy().count())
    assert "might_contain" in plan.lower(), (
        "runtime bloom filter was not injected into the fact side "
        "under shuffle-join conditions")
    # the bloom prunes BEFORE the fact shuffle: the might_contain
    # filter must appear deeper than (i.e., below) the join's exchange
    lines = plan.splitlines()
    mc = next(i for i, l in enumerate(lines)
              if "might_contain" in l.lower())
    ex = [i for i, l in enumerate(lines) if "exchange hashpartitioning"
          in l.lower()]
    assert ex and mc > min(ex), "bloom filter sits above the shuffle"


def test_bloom_preserves_results(spark, scale_conf):
    """Same join, broadcast plan vs bloom-pruned shuffle plan: equal."""
    bloom_rows = _join(scale_conf).count()
    scale_conf.conf.set("spark.sql.autoBroadcastJoinThreshold",
                        str(64 * 1024 * 1024))
    broadcast_rows = _join(spark).count()
    assert bloom_rows == broadcast_rows


def test_toy_scale_prefers_broadcast(spark):
    """Default session at toy SF: the dim broadcasts and no runtime
    filter is injected — the right plan there, pinned so we notice if
    a future config change flips either side."""
    plan = _executed_plan(_join(spark).groupBy().count())
    assert "broadcasthashjoin" in plan.lower().replace(" ", "")
    assert "might_contain" not in plan.lower()
