"""Similarity search over embedding columns (array<float>, dim 64).

Three tiers:
  brute-force top-k   exact; queries broadcast against all candidates —
                      right whenever |queries| is small (cost |Q| x N).
  near-dup pairs      exact all-pairs above a cosine threshold — the
                      correctness baseline for embedding dedup.
  IVF probe top-k     the scale path: coarse-quantize candidates to
                      deterministic centroids, probe only the closest
                      n_probe cells (cost |Q| x N x n_probe/n_cells).
                      Approximate by construction -> rows-only check.

All dot products run through functions.vectors (double-cast fold) so
results reproduce in DuckDB to within the 6-dp rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aws_payment_data_lake_spark.functions import cosine


def brute_force_topk(emb: DataFrame, k: int = 5,
                     n_queries: int = 10) -> DataFrame:
    """Exact top-k neighbors for query vectors (vec_id < n_queries).

    Ranking uses the ROUNDED cosine with vec_id tiebreak so the order is
    total and engine-independent."""
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    c = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def neardup_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, vec_a < vec_b."""
    a = emb.select(F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-style approximate top-k: centroids are the embeddings of the
    n_centroids smallest vec_ids (deterministic "training"); every vector
    is assigned to its best centroid; each query probes its n_probe
    closest cells and ranks exactly within them.

    At 100 TB the assignment is one broadcast pass over the data and the
    probe join touches n_probe/n_centroids of it; cells are the natural
    partitioning key for the candidate table."""
    cents = emb.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))

    def best_cells(df: DataFrame, id_out: str, vec_col: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(id_out), F.col(vec_col),
            "cent_id", F.round(cosine(F.col(vec_col), F.col("ce")), 6).alias("c"))
        w = Window.partitionBy(id_out).orderBy(F.col("c").desc(), "cent_id")
        return (scored.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= n).drop("rk", "c"))

    assigned = best_cells(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("ne")), "neighbor_id", "ne", 1)
    probes = best_cells(
        emb.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe")), "query_id", "qe", n_probe)

    c = (
        probes.join(assigned, "cent_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qe"), F.col("ne")), 6).alias("cos_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
