"""Per-source quota caps (operators/quota.py): the histogram-cutoff
plan must agree decision-for-decision with the naive per-source
row_number formulation, including every degenerate shape (zero cap,
oversized cap, all-ties sources, cap landing exactly on a score
boundary)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.quota import source_quota_cap
from aws_payment_data_lake_spark.sources import load


def _naive(docs, caps, default_cap):
    cap = F.lit(default_cap)
    for src in sorted(caps):
        cap = F.when(F.col("source") == src,
                     F.lit(int(caps[src]))).otherwise(cap)
    score = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), "doc_id")
    return (docs.select("doc_id", "source", score.alias("score"),
                        cap.cast("long").alias("cap"))
            .withColumn("rk", F.row_number().over(w))
            .withColumn("kept", F.col("rk") <= F.col("cap")))


def _decisions(df):
    return sorted((r["doc_id"], r["kept"]) for r in df.collect())


def test_quota_matches_naive_window_on_testdata(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    caps = {"src0": 2, "src1": 0, "src2": 30}
    got = source_quota_cap(docs, caps, default_cap=7)
    want = _naive(docs, caps, default_cap=7)
    assert _decisions(got) == _decisions(want)
    # per-source kept counts never exceed the cap
    over = (got.where("kept").groupBy("source", "cap")
            .count().where("count > cap").count())
    assert over == 0


def test_quota_degenerate_shapes(spark):
    # one source all-ties, one with a boundary-exact cap, one tiny
    rows = ([(i, "tied", "a b c") for i in range(10)]           # all score 3
            + [(100 + i, "steps", " ".join(["w"] * (i // 2 + 1)))
               for i in range(10)]                              # pairs of ties
            + [(200, "small", "x"), (201, "small", "y z")])
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for caps, default in [({}, 0), ({}, 4), ({"tied": 10}, 5),
                          ({"steps": 6}, 3), ({"small": 100}, 1)]:
        got = source_quota_cap(docs, caps, default_cap=default)
        want = _naive(docs, caps, default_cap=default)
        assert _decisions(got) == _decisions(want), (caps, default)


def test_quota_band_semantics(spark):
    """'above' rows beat the cutoff score, 'tie' rows sit exactly on
    it, and within a source kept = above + tie <= cap."""
    (docs,) = load(spark, SF_DIR, "documents")
    got = source_quota_cap(docs, {"src0": 2}, default_cap=5).cache()
    try:
        per_src = (got.groupBy("source", "cap").agg(
            F.sum(F.when(F.col("band") == "above", 1).otherwise(0))
             .alias("n_above"),
            F.sum(F.when(F.col("band") == "tie", 1).otherwise(0))
             .alias("n_tie"),
            F.min(F.when(F.col("band") == "above", F.col("score")))
             .alias("min_above"),
            F.max(F.when(F.col("band").isin("tie", "over"),
                         F.col("score"))).alias("cut"),
        ).collect())
        for r in per_src:
            assert r["n_above"] + r["n_tie"] <= r["cap"]
            if r["cut"] is not None and r["min_above"] is not None:
                assert r["min_above"] > r["cut"]
    finally:
        got.unpersist()
