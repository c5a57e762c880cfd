"""Document chunking: definition parity with a Python sliding-window
reference, coverage/overlap invariants, and the trailing-chunk rule."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.chunking import chunk_documents
from aws_payment_data_lake_spark.sources import load

W, S = 16, 12


def _py_chunks(text: str, window: int, stride: int):
    """Straight-line reference: starts at 0, stride, ... while < n; a
    non-initial chunk is kept only if it adds uncovered tokens."""
    toks = text.split(" ")
    n = len(toks)
    out = []
    for start in range(0, n, stride):
        if start > 0 and start + window - stride >= n:
            continue
        piece = toks[start:start + window]
        out.append((start // stride, start, len(piece), " ".join(piece)))
    return out


def test_matches_python_reference(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    sample = docs.limit(200)
    got = {
        (r["doc_id"], r["chunk_idx"]):
            (r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(sample, W, S).collect()
    }
    want = {}
    for r in sample.select("doc_id", "text").collect():
        for idx, start, size, piece in _py_chunks(r["text"], W, S):
            want[(r["doc_id"], idx)] = (start, size, piece)
    assert got == want and len(got) > 0


def test_coverage_and_overlap(spark):
    """Every token index of every doc is covered by >=1 chunk; adjacent
    chunks overlap by exactly window-stride tokens (except a clamped
    final chunk, which still starts stride after its predecessor)."""
    (docs,) = load(spark, SF_DIR, "documents")
    rows = chunk_documents(docs.limit(100), W, S).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tokens = {r["doc_id"]: len(r["text"].split(" "))
                for r in docs.limit(100).collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        covered = set()
        for r in chunks:
            covered |= set(range(r["start_token"],
                                 r["start_token"] + r["n_chunk_tokens"]))
        assert covered == set(range(n_tokens[doc_id])), doc_id
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_token"] - a["start_token"] == S
            assert b["chunk_idx"] == a["chunk_idx"] + 1


def test_trailing_chunk_rule(spark):
    """A doc of 50 tokens at window=64/stride=48 yields ONE chunk (the
    second window would add nothing); 70 tokens yields two."""
    df = spark.createDataFrame(
        [(1, " ".join(["t"] * 50)), (2, " ".join(["t"] * 70))],
        "doc_id long, text string")
    got = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"]
           for r in chunk_documents(df, 64, 48).collect()}
    assert got == {(1, 0): 50, (2, 0): 64, (2, 1): 22}


def test_reconstruction(spark):
    """Dropping each chunk's overlapping prefix (except chunk 0) and
    concatenating reproduces the original document exactly."""
    (docs,) = load(spark, SF_DIR, "documents")
    sample = docs.limit(50)
    rows = chunk_documents(sample, W, S).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["text"] for r in sample.collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        toks = []
        for r in chunks:
            piece = r["chunk_text"].split(" ")
            keep_from = 0 if r["chunk_idx"] == 0 else (
                len(toks) - r["start_token"])
            toks.extend(piece[keep_from:])
        assert " ".join(toks) == originals[doc_id], doc_id


def test_bad_params_raise(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, stride=16)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=8, stride=0)
