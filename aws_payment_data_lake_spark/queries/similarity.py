"""Similarity-search operators as queries over `embeddings`."""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators import similarity as S
from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load

# ---------------------------------------------------------------------------
# Session-scoped shared IVF index — the ANN twin of the MinHash store
# (queries/dedup.py): an IVF index is BUILT once and probed many times,
# so the (centroids, assigned-cells) pair is session state keyed by
# (applicationId, sf_dir) with single-entry eviction, not per-query
# work. Same locking contract as the dedup store: the global lock
# covers dict bookkeeping only; the build lock serializes builders.
# ---------------------------------------------------------------------------
_IVF_STORE: dict = {}
_IVF_LOCK = threading.Lock()


def shared_ivf_index(spark: SparkSession,
                     sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(cents, assigned) for ``sf_dir``'s embeddings — built once per
    (Spark application, sf_dir), `assigned` persisted with a count
    barrier, reused by every probe in the session."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _IVF_LOCK:
        ent = _IVF_STORE.get(key)
        if ent is None:
            for old in _IVF_STORE.values():
                # mark first so a mid-build holder unpersists its own
                # frames on completion instead of leaking them
                # (ADVICE r5; same pattern as queries/rag.py)
                old["evicted"] = True
                if old.get("val") is not None:
                    try:
                        old["val"][1].unpersist()
                    except Exception:
                        pass
            _IVF_STORE.clear()
            ent = {"val": None, "evicted": False,
                   "build_lock": threading.Lock()}
            _IVF_STORE[key] = ent
    with ent["build_lock"]:
        if ent["val"] is None:
            (emb,) = load(spark, sf_dir, "embeddings")
            cents, assigned = S.build_ivf_index(emb)
            assigned = assigned.persist()
            assigned.count()
            ent["val"] = (cents, assigned)
        if ent["evicted"]:
            try:
                ent["val"][1].unpersist()
            except Exception:
                pass
    return ent["val"]


@register(
    "knn_brute_force",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT query_id, vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(qe AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])), 6)
                   AS cos_sim
          FROM q JOIN embeddings ON vec_id <> query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rk
          FROM c)
    SELECT query_id, neighbor_id, cos_sim, rk
    FROM r WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    tags=("similarity", "knn", "baseline"),
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the 10 lowest-id query vectors; ranking on
    rounded cosine + id tiebreak (total order, engine-independent)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, k=5, n_queries=10).orderBy("query_id", "rk")


@register(
    "embedding_neardup_pairs",
    oracle="""
    SELECT vec_a, vec_b, round(cos_raw, 6) AS cos_sim
    FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cos_raw
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    WHERE cos_raw >= 0.4
    ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "dedup", "embedding"),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at cosine >= 0.4 (exact baseline; the
    random testdata embeddings top out near 0.55, so 0.4 yields a real
    but small pair set at every sf)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return S.neardup_pairs(emb, threshold=0.4).orderBy("vec_a", "vec_b")


def knn_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (16 deterministic centroids, 4 probes)
    against the session-shared index — build-once-query-many, the
    production ANN serving shape. Unregistered (the driver scores only
    50 queries; an approximate result would get a weak rows-only row
    anyway) — recall >= 0.8 vs the brute-force baseline is asserted in
    tests/test_similarity_skew.py and it stays on the bench so the
    scale path keeps a timing record."""
    cents, assigned = shared_ivf_index(spark, sf_dir)
    (emb,) = load(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe")))
    return (S.ivf_probe_topk(cents, assigned, queries, k=5, n_probe=4)
            .orderBy("query_id", "rk"))


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup at cosine >= 0.4 over the session-shared
    IVF index (operators.similarity.semantic_dedup) — the embedding-space
    twin of the MinHash text dedup family. Unregistered (the driver
    scores only 50 queries; the clustering makes the kept-set
    cluster-dependent, so a SQL oracle can't reproduce it) — exactness
    of the greedy per-cell rule is pytest-proven against a NumPy
    reference (tests/test_semantic_dedup.py) and the query stays on the
    bench for a timing record. Reusing the shared index means dedup
    costs only the per-cell greedy on top of ANN serving."""
    cents, assigned = shared_ivf_index(spark, sf_dir)
    return (S.semantic_dedup(None, threshold=0.4,
                             cents=cents, assigned=assigned)
            .orderBy("vec_id"))


def knn_rp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH approximate top-5 (16 seeded hyperplanes, 4 bands) —
    the LSH-bucketed ANN tier's timing record. Unregistered
    (approximate; recall on the isotropic testdata is documented as the
    weak regime — the >=0.8 clustered-corpus floor is asserted in
    tests/test_similarity_skew.py)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    return (S.rp_lsh_topk(emb, k=5, n_queries=10)
            .orderBy("query_id", "rk"))
