"""Streaming corpus ops: stream==batch parity for chunking (stateless
flatMap) and LM scoring under a batch-trained LM (stream-static join)."""

from __future__ import annotations

import os

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.chunking import chunk_documents
from aws_payment_data_lake_spark.operators.lm_quality import (
    lm_perplexity,
    train_bigram_lm,
)
from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.streaming.corpus import (
    chunk_stream,
    lm_score_stream,
    read_document_stream,
)
from aws_payment_data_lake_spark.streaming.events import run_available_now

DOCS = os.path.join(SF_DIR, "documents.parquet")


def test_chunk_stream_matches_batch(spark):
    # (maxFilesPerTrigger over a single-FILE path trips the source's
    # basePath directory check — pass it only with directory zones)
    stream = chunk_stream(read_document_stream(spark, DOCS))
    got = run_available_now(stream, "t_chunk_stream", output_mode="append")
    (docs,) = load(spark, SF_DIR, "documents")
    want = chunk_documents(docs)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_lm_score_stream_matches_batch(spark):
    """Scores computed on the arriving stream under a batch-trained LM
    equal the batch scores under the same LM — the CCNet deployment
    shape (train on a snapshot, score the crawl continuously)."""
    (docs,) = load(spark, SF_DIR, "documents")
    lm = tuple(t.localCheckpoint(eager=True) for t in train_bigram_lm(docs))
    stream = lm_score_stream(read_document_stream(spark, DOCS), lm=lm)
    got = run_available_now(stream, "t_lm_stream", output_mode="complete")
    want = lm_perplexity(docs, lm=lm)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
