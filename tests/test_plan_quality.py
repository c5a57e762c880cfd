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


def test_event_time_filter_pushes_through_ntz_normalization(spark):
    """The source-boundary NTZ->TIMESTAMP cast (normalize_event_time)
    must not cost event-time predicate pushdown: Catalyst rewrites a
    comparison against the cast column back onto the underlying
    timestamp_ntz scan column (order-preserving bijection under the
    pinned UTC session). Guard it — a silent pushdown loss here would
    turn every time-windowed events query into a full scan at 100 TB."""
    import pyspark.sql.functions as F

    from aws_payment_data_lake_spark.sources import read_table

    ev = read_table(spark, SF_DIR, "events")
    q = (ev.where(F.col("ts") >= F.lit("2024-06-01").cast("timestamp"))
         .select("event_id", "ts"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(ts," in plan.split("PushedFilters:")[1], plan


def test_q5_small_sides_broadcast_at_runtime(spark):
    # Only nation/region carry hints now (fixed cardinality); customer and
    # supplier are O(SF), so the STATIC plan may shuffle them — the runtime
    # contract is that AQE converts every actually-small side to a
    # broadcast, leaving at most the lineitem<->orders fact join as a
    # shuffle (the one join that SHOULD shuffle at 100 TB).
    df = all_queries()["q5_local_supplier_volume"].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 1
    assert "BroadcastHashJoin" in plan


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


@pytest.mark.parametrize("name,hinted", [
    ("q3_shipping_priority", 0),        # customer is O(SF): no hint
    ("q5_local_supplier_volume", 2),    # nation + filtered region only
    ("trade_flows_by_nation_year", 1),  # nation only; supplier is O(SF)
    ("brand_market_share", 1),          # part is O(SF): no hint; the
                                        # ONE hint is the one-row
                                        # share-of-total aggregate
                                        # (bounded at any SF, r9)
])
def test_only_fixed_dims_hint_broadcast(spark, name, hinted):
    # Simulate "every table is big" (threshold -1 kills size-based
    # broadcasts): whatever still broadcasts is a hard-coded hint, and
    # only fixed-cardinality dimensions (nation: 25, region: 5) may be.
    # O(SF) tables (customer/supplier/part/orders) must degrade to
    # shuffle joins, not pin a billion-row broadcast at production scale.
    import re

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    n_broadcasts = len(re.findall(r"BroadcastExchange \(\d+\)", plan))
    assert n_broadcasts == hinted, plan


def test_ann_probe_joins_broadcast_the_bounded_side(spark):
    """The ANN serving tiers must never rest on size-based broadcast
    fallbacks: with autoBroadcastJoinThreshold disabled, every join of
    a BOUNDED frame (probes = n_queries x n_probe rows; re-rank
    candidates = k*factor per query) against a corpus-sized table
    (assigned / codes / rerank embeddings) must still plan as a
    broadcast join from the explicit hints. The fallback is an SMJ
    shuffling the corpus over ~K cent_id keys — invisible at sf0.001,
    a skew disaster at 100 TB."""
    import re as _re

    from aws_payment_data_lake_spark.queries.similarity import (
        knn_ivf_probe,
        knn_ivfpq,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plans = {}
        for name, fn in [("ivf", knn_ivf_probe), ("ivfpq", knn_ivfpq)]:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            plans[name] = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    # ivf: probes->assigned (no re-rank tier there); ivfpq: probes->
    # assigned + candidates->rerank (the query-vectors->candidates
    # broadcast join was removed in r14 — query vectors now ride the
    # qmap scorer's closure instead of a per-row column, so there is
    # one fewer join to get right)
    for name, want_bhj in [("ivf", 1), ("ivfpq", 2)]:
        plan = plans[name]
        assert "CartesianProduct" not in plan, name
        n_bhj = len(_re.findall(r"\(\d+\) BroadcastHashJoin", plan))
        assert n_bhj >= want_bhj, (name, plan)
    # ivf probe path: NO corpus-sized shuffle join anywhere
    assert "SortMergeJoin" not in plans["ivf"], plans["ivf"]
    # ivfpq: exactly the candidates<->codes join shuffles (both sides
    # corpus-sized there — broadcasting either would be the bug)
    n_smj = len(_re.findall(r"\(\d+\) SortMergeJoin", plans["ivfpq"]))
    assert n_smj == 1, plans["ivfpq"]


def test_span_dedup_detection_single_wide_shuffle(spark):
    """ExactSubstr detection (round 7): the occurrence stream must hit
    exactly ONE gh-keyed exchange (the window count+row_number share
    it) plus the small per-doc merge — never the aggregate-then-
    join-back shape (a second full shuffle of the occurrence table)
    and never a broadcast of the unbounded repeated-window table."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from aws_payment_data_lake_spark.operators.dedup import duplicate_spans
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    buf = _io.StringIO()
    with _rs(buf):
        duplicate_spans(docs).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastExchange" not in plan
    import re as _re
    # detail headers "(N) Exchange" count each node exactly once
    n_exchanges = len(_re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 3, plan  # spread + gh window + doc merge
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("name", [
    "text_vocab_topk",
    "corpus_curation_decisions",
    "brand_market_share",
])
def test_no_partitionless_window_in_registered_plans(spark, name):
    """VERDICT r8 #1/#2: neither query may rank corpus-sized input
    through a partitionless WindowExec (single-task global sort at
    100x). vocab's top-25 must be TakeOrderedAndProject; curation's
    lm gate is a threshold predicate + a tie-group TakeOrdered."""
    plan = plan_of(spark, name)
    assert "Window" not in plan, plan
    if name == "text_vocab_topk":
        assert "TakeOrderedAndProject" in plan


def test_clone_external_meta_read_broadcasts_the_key_map(spark, tmp_path):
    """The external-file meta-read (shallow clones) resolves log keys
    by joining _metadata.file_path against the exact uri->key map —
    one row per scanned file. That map must BROADCAST: a shuffled
    join here would re-shuffle the whole table on every COW
    delete/update/merge against a clone."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from aws_payment_data_lake_spark.sources.txlog import TxnTable

    src = TxnTable(spark, str(tmp_path / "src"))
    src.create(spark.range(64).selectExpr("id", "id as v"))
    c = TxnTable(spark, str(tmp_path / "clone")).clone_shallow(src)
    snap = c._replay()
    buf = _io.StringIO()
    with _rs(buf):
        c._plain_read_meta(snap, sorted(snap.live)).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
