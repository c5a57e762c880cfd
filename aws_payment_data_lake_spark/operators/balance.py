"""Cluster-balanced corpus sampling: cap documents per SEMANTIC cluster
(the embedding-space twin of the per-source quota).

Web-scale corpora are semantically lopsided — boilerplate genres
dominate — and per-DOMAIN caps (operators/quota.py) can't see that: one
source can contribute thousands of near-identical-topic pages. The
cluster-balance family (SemDeDup's cluster stage, Abbas et al. 2023;
DataComp-style cluster-based selection) caps per embedding cluster
instead: k-means cells stand in for topics, and each cell keeps at most
`cap` members.

Spark shape — a pure composition of three already-scale-proven parts:
  1. `kmeans_centroids` (operators/similarity.py): Lloyd on a
     deterministic bounded sample, K x dim driver literal;
  2. `assign_cells_blas`: one Arrow-batched matmul pass assigns every
     vector its argmax-cosine cell — no shuffle, centroids broadcast
     by closure;
  3. `source_quota_cap` (operators/quota.py) with cell-as-source: the
     per-(cell, score) histogram finds each cell's cutoff without a
     corpus-wide window; only cutoff tie groups are ranked.

The within-cell preference is a caller-supplied score; the default is
xxhash64(vec_id) — a deterministic pseudo-random order, i.e. an
UNBIASED uniform sample of each cell that is reproducible across runs
and engines (the DataComp choice; pass a quality score instead to keep
"best of each topic" rather than "random of each topic").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from aws_payment_data_lake_spark.operators.quota import source_quota_cap
from aws_payment_data_lake_spark.operators.similarity import (
    assign_cells_blas,
    kmeans_centroids,
)


def cluster_balanced_sample(emb: DataFrame, n_clusters: int = 16,
                            cap_per_cluster: int = 100,
                            score: Column | None = None,
                            centroids: DataFrame | None = None,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster, score, band, kept): at most `cap_per_cluster`
    vectors kept per k-means cell, preferring high `score` (default:
    xxhash64(id) — deterministic uniform within-cell sampling), id
    ascending as the tiebreak. Pass `centroids` to reuse a trained
    quantizer (e.g. the durable IVF store's — then a corpus roll
    rebalances under FROZEN cells, and decisions for old vectors are
    stable); omitted, a fresh k-means trains on the bounded sample.

    `band` carries the quota mechanism ('above'/'tie' kept,
    'below'/'over' dropped) for auditability, same contract as the
    per-source quota driver row."""
    cents = centroids if centroids is not None else kmeans_centroids(
        emb, n_centroids=n_clusters)
    assigned = assign_cells_blas(cents, emb, id_col, vec_col)
    d = assigned.select(
        F.col(id_col).alias("doc_id"),
        F.col("cent_id").cast("string").alias("source"))
    sc = score if score is not None else F.xxhash64(F.col("doc_id"))
    decided = source_quota_cap(d, caps={}, default_cap=cap_per_cluster,
                               score=sc)
    return decided.select(
        F.col("doc_id").alias(id_col),
        F.col("source").cast("long").alias("cluster"),
        "score", "band", "kept")
