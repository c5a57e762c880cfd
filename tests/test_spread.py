"""Narrow-scan spread guard: fires only on narrow scan-rooted frames
(round-6 rework — ADVICE r5 flagged the file-count probe firing on
post-shuffle frames; VERDICT r5 #9 retired the RDD-compile fallback)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.spread import spread_narrow_scan
from aws_payment_data_lake_spark.sources import load


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_narrow_scan_is_spread(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    out = spread_narrow_scan(docs.select("doc_id", "text"), "doc_id")
    assert "RepartitionByExpression" in _plan(out)


def test_post_shuffle_frame_passes_through(spark):
    """A frame that already went through a wide shuffle (agg over one
    small file) must NOT get a redundant repartition even though its
    leaf scan has few input files."""
    (docs,) = load(spark, SF_DIR, "documents")
    agg = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    out = spread_narrow_scan(agg, "source")
    assert out is agg


def test_joined_frame_passes_through(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    a = docs.select("doc_id", "source")
    b = docs.select("doc_id", "text")
    j = a.join(b, "doc_id")
    assert spread_narrow_scan(j, "doc_id") is j


def test_in_memory_frame_is_spread(spark):
    """LocalRelation frames (tiny by construction) spread without the
    retired rdd.getNumPartitions() driver-compile probe."""
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = spread_narrow_scan(df, "doc_id")
    assert "RepartitionByExpression" in _plan(out)


def test_wide_scan_passes_through(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    out = spread_narrow_scan(docs.select("doc_id"), "doc_id", threshold=1)
    assert out.where(F.col("doc_id") >= 0) is not None
    assert "RepartitionByExpression" not in _plan(out)


def test_wide_range_passes_through(spark):
    """spark.range frames declare their parallelism in the plan
    (ADVICE r6): a Range already at/above the threshold must not be
    re-shuffled, while a 1-split Range still spreads."""
    wide = spark.range(0, 1_000_000, 1, 64)
    assert spread_narrow_scan(wide, threshold=32) is wide
    narrow = spark.range(0, 100, 1, 1)
    out = spread_narrow_scan(narrow)
    assert "Repartition" in _plan(out)


def test_column_named_like_wide_node_does_not_fool_probe(spark):
    """Node matching is positional (line start), so a column literally
    named 'Window' or a filter literal 'Sort' cannot suppress the
    spread (ADVICE r6)."""
    (docs,) = load(spark, SF_DIR, "documents")
    tricky = (docs.select("doc_id", F.col("text").alias("Window"))
              .where(F.col("Window") != "Sort"))
    out = spread_narrow_scan(tricky, "doc_id")
    assert "RepartitionByExpression" in _plan(out)
