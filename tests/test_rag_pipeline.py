"""RAG composition (chunk -> embed -> IVF -> probe): planted-query
recall, provenance encoding, and determinism."""

from __future__ import annotations

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.queries.rag import (
    CHUNK_STRIDE_ID,
    chunk_embeddings,
    rag_chunk_retrieval,
)
from aws_payment_data_lake_spark.sources import load


def test_planted_query_retrieves_source_chunk(spark):
    """A query that IS a corpus chunk (fresh id) must come back at
    cosine 1.0 top-1; its source chunk must appear among the cos=1.0
    top hits (exact-duplicate corpus chunks may legitimately tie)."""
    hits = rag_chunk_retrieval(spark, SF_DIR, n_query_docs=15).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 15
    for qid, rows in by_q.items():
        src_chunk = -qid - 1  # invert the query-id encoding
        rows.sort(key=lambda r: r["rk"])
        assert rows[0]["cos_sim"] == 1.0, (qid, rows[0])
        perfect = {r["neighbor_id"] for r in rows if r["cos_sim"] == 1.0}
        assert src_chunk in perfect, (qid, rows)


def test_provenance_ids_and_coverage(spark):
    """vec_id = doc_id * STRIDE + chunk_idx round-trips, and every
    document contributes at least its chunk 0."""
    (docs,) = load(spark, SF_DIR, "documents")
    n_docs = docs.count()
    ids = [r["vec_id"] for r in chunk_embeddings(docs).collect()]
    doc_ids = {v // CHUNK_STRIDE_ID for v in ids}
    assert doc_ids == set(range(n_docs))
    assert all(0 <= v % CHUNK_STRIDE_ID < CHUNK_STRIDE_ID for v in ids)
    assert len(ids) == len(set(ids))
    assert len(ids) >= n_docs


def test_deterministic(spark):
    """Two runs return identical hit lists (stub embedder + seeded
    index + total tiebreaks)."""
    a = [tuple(r) for r in rag_chunk_retrieval(spark, SF_DIR, 5).collect()]
    b = [tuple(r) for r in rag_chunk_retrieval(spark, SF_DIR, 5).collect()]
    assert a == b and len(a) > 0
