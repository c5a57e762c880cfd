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

from aws_payment_data_lake_spark.functions import cosine, unit


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


def neardup_pairs(emb: DataFrame, threshold: float = 0.4,
                  n_blocks: int = 16) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold, vec_a < vec_b.

    Block-matrix design (the 100 TB shape): L2-normalize each vector ONCE
    (JVM-side), assign it a block by pmod(vec_id, n_blocks), replicate
    each vector to every unordered block pair it participates in, then one
    ``applyInPandas`` per block pair computes the full dot-product matrix
    with a single float64 numpy matmul and emits only pairs above the
    threshold. Cost: each vector is shipped n_blocks times (metadata-small
    vs N^2 pair rows) and the N^2 arithmetic runs inside BLAS, not per-row
    expression eval. Block pairs are the shuffle key, so a 1000-executor
    cluster spreads the (n_blocks^2+n_blocks)/2 tasks evenly; raise
    n_blocks with N to keep per-task matrices in memory."""
    import pandas as pd  # local import: keep module import light

    unit_emb = emb.select(
        "vec_id",
        unit(F.col("embedding")).alias("ue"),
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).alias("blk"))

    # Replicate: vector in block b joins every unordered pair {pa, pb}
    # with pa <= pb that contains b.
    pairs = F.array(*[
        F.when(F.col("blk") <= p, F.struct(F.col("blk").alias("pa"),
                                           F.lit(p).alias("pb")))
        .otherwise(F.struct(F.lit(p).alias("pa"), F.col("blk").alias("pb")))
        for p in range(n_blocks)
    ])
    replicated = (
        unit_emb.select("vec_id", "ue", "blk",
                        F.explode(F.array_distinct(pairs)).alias("bp"))
        .select("vec_id", "ue", "blk",
                F.col("bp.pa").alias("pa"), F.col("bp.pb").alias("pb"))
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        pa, pb = int(pdf["pa"].iloc[0]), int(pdf["pb"].iloc[0])
        left = pdf[pdf["blk"] == pa]
        ids_l = left["vec_id"].to_numpy()
        mat_l = np.stack(left["ue"].to_numpy())
        if pa == pb:
            sims = mat_l @ mat_l.T
            iu, ju = np.triu_indices(len(ids_l), k=1)
            va, vb, cs = ids_l[iu], ids_l[ju], sims[iu, ju]
        else:
            right = pdf[pdf["blk"] == pb]
            ids_r = right["vec_id"].to_numpy()
            sims = mat_l @ np.stack(right["ue"].to_numpy()).T
            ii, jj = np.nonzero(sims >= threshold)
            va, vb, cs = ids_l[ii], ids_r[jj], sims[ii, jj]
        keep = cs >= threshold
        va, vb, cs = va[keep], vb[keep], cs[keep]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi,
                             "cos_sim": np.round(cs, 6)})

    return replicated.groupBy("pa", "pb").applyInPandas(
        block_pairs, schema="vec_a long, vec_b long, cos_sim double")


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
