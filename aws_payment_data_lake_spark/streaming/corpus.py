"""Streaming corpus ingestion for the LLM-pipeline operators: the
batch/stream symmetry invariant (streaming/events.py) extended to the
document tier.

Two shapes that cover the two streaming-compatibility classes:
  chunking   a pure stateless flatMap (operators/chunking.py) — applies
             to a stream UNCHANGED; new documents landing in the raw
             zone become training/RAG chunks continuously.
  LM gating  corpus-level LM TRAINING is a batch job by nature (global
             counts), but SCORING under a trained LM is a stream-static
             join: the stream's row-local bigrams join the static
             uni/bigram count tables, per-doc aggregation runs in
             update mode. The CCNet deployment exactly: train on a
             reference snapshot, score the crawl as it arrives.

Both reuse the batch operators verbatim — parity is asserted in
tests/test_streaming_corpus.py, correctness once on the batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.chunking import chunk_documents
from aws_payment_data_lake_spark.operators.lm_quality import lm_perplexity


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int | None = None,
                         ) -> DataFrame:
    """File-source stream over a documents zone (schema from the
    parquet footer — driver metadata read, no data scan; shared
    plumbing in streaming/source.py). At scale the source line becomes
    Kafka/Kinesis; everything below is source-agnostic."""
    from .source import read_parquet_stream

    return read_parquet_stream(spark, path, max_files_per_trigger)


def chunk_stream(docs_stream: DataFrame, window: int = 64,
                 stride: int = 48) -> DataFrame:
    """`chunk_documents` on a stream — stateless flatMap, append mode,
    no watermark needed (no state, no event time)."""
    return chunk_documents(docs_stream, window=window, stride=stride)


def lm_score_stream(docs_stream: DataFrame,
                    lm: tuple[DataFrame, DataFrame, DataFrame],
                    ) -> DataFrame:
    """`lm_perplexity` on a stream under a BATCH-trained lm (the
    required shape: training needs global counts; pass
    `train_bigram_lm(reference_corpus)`). The count-table joins are
    stream-static, the per-doc aggregation needs update/complete
    output mode."""
    return lm_perplexity(docs_stream, lm=lm)
