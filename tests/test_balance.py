"""Cluster-balanced sampling (operators/balance.py): caps respected,
naive-window equivalence, determinism, frozen-centroid stability."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from aws_payment_data_lake_spark.operators.balance import (
    cluster_balanced_sample,
)
from aws_payment_data_lake_spark.operators.similarity import (
    kmeans_centroids,
)
from aws_payment_data_lake_spark.sources import load
from tests.conftest import SF_DIR

CAP = 20


def _emb(spark):
    (emb,) = load(spark, SF_DIR, "embeddings")
    return emb


def test_caps_respected_and_exhaustive(spark):
    """Every cluster keeps exactly min(cap, cluster size) vectors, and
    every input vector gets exactly one decision row."""
    emb = _emb(spark)
    out = cluster_balanced_sample(emb, n_clusters=8,
                                  cap_per_cluster=CAP).persist()
    try:
        assert out.count() == emb.count()
        per = (out.groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("kept").cast("long")).alias("n_kept"))
               .collect())
        assert len(per) >= 2  # the sample actually spreads over cells
        for r in per:
            assert r["n_kept"] == min(CAP, r["n"]), r
    finally:
        out.unpersist()


def test_equals_naive_window(spark):
    """The windowless histogram plan keeps exactly the rows a naive
    row_number over (cluster, score DESC, id) keeps."""
    emb = _emb(spark)
    out = cluster_balanced_sample(emb, n_clusters=8, cap_per_cluster=CAP)
    w = Window.partitionBy("cluster").orderBy(F.col("score").desc(),
                                              "vec_id")
    naive = (out.select("vec_id", "cluster", "score")
             .withColumn("rk", F.row_number().over(w))
             .select("vec_id", (F.col("rk") <= CAP).alias("kept_naive")))
    joined = out.join(naive, "vec_id")
    assert joined.where(F.col("kept") != F.col("kept_naive")).count() == 0


def test_deterministic_across_runs(spark):
    """Same input -> bit-identical decisions (hash-ordered sampling,
    deterministic k-means seed/sample)."""
    emb = _emb(spark)
    a = cluster_balanced_sample(emb, n_clusters=8, cap_per_cluster=CAP)
    b = cluster_balanced_sample(emb, n_clusters=8, cap_per_cluster=CAP)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_frozen_centroids_keep_old_decisions_stable(spark):
    """Passing a trained quantizer (the durable-IVF reuse path) pins
    cell geometry: re-running over the same vectors under the frozen
    centroids reproduces decisions exactly, even when invoked with a
    different n_clusters hint (the hint is ignored when centroids are
    supplied)."""
    emb = _emb(spark)
    cents = kmeans_centroids(emb, n_centroids=8).persist()
    try:
        a = cluster_balanced_sample(emb, centroids=cents,
                                    cap_per_cluster=CAP)
        b = cluster_balanced_sample(emb, n_clusters=99, centroids=cents,
                                    cap_per_cluster=CAP)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    finally:
        cents.unpersist()
