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

End-to-end ingest (round 6, VERDICT r5 #6): ``run_corpus_stream``
wires document stream -> LM fluency gate -> chunking -> idempotent
batch-keyed chunk append inside ONE foreachBatch, and
``finalize_training_shards`` packs the accumulated chunk zone into
one-file-per-shard training shards. Packing stays a batch finalize BY
DESIGN: a shard index is a function of the stream-local cumulative
token count in id order — a total order over the corpus — which a
micro-batch cannot know (its docs' predecessors may arrive later).
The finalize re-derives that order from the ids, so shards are
byte-identical to the pure-batch chain whatever the batching was
(asserted in tests/test_streaming_corpus.py). The gate's perplexity
cut is a CONSTANT decided at LM-training time (the CCNet shape), not
a per-batch quantile — a per-batch statistic would make results
depend on arrival batching and break stream==batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.chunking import chunk_documents
from aws_payment_data_lake_spark.operators.lm_quality import lm_perplexity

# chunk row ids pack as doc_id * CHUNK_ID_STRIDE + chunk_idx (the
# queries/rag.py provenance convention); guarded in gate_and_chunk.
CHUNK_ID_STRIDE = 1000

# scrubbed-piece ids pack as doc_id * SEGMENT_ID_STRIDE + segment_idx
# (guarded the same way) so provenance survives the span scrub stage.
SEGMENT_ID_STRIDE = 100


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


def gate_and_chunk(docs: DataFrame,
                   lm: tuple[DataFrame, DataFrame, DataFrame],
                   ppl_cut: float, window: int = 64,
                   stride: int = 48,
                   span_index: DataFrame | None = None) -> DataFrame:
    """[optional ExactSubstr scrub ->] LM fluency gate -> chunking, on
    a BATCH of documents — the one transformation both the streaming
    ingest (per micro-batch) and its batch twin run, so parity is by
    construction. Emits (chunk_uid, doc_id, chunk_idx, n_chunk_tokens,
    chunk_text).

    ``span_index`` (a stored ``span_window_index`` table) turns on the
    round-7 ingest scrub: every window already present in the training
    corpus is cut from arriving docs BEFORE gating/chunking
    (operators/dedup.remove_indexed_spans — index-only, no intra-batch
    comparison, so the output is independent of micro-batch
    boundaries; the stream==batch invariant survives). Surviving
    pieces become gate/chunk inputs under piece ids
    doc_id * SEGMENT_ID_STRIDE + segment_idx."""
    if span_index is not None:
        from aws_payment_data_lake_spark.operators.dedup import (
            remove_indexed_spans,
        )

        pieces = remove_indexed_spans(docs, span_index)
        pid = F.when(
            F.col("segment_idx") < SEGMENT_ID_STRIDE,
            F.col("doc_id") * SEGMENT_ID_STRIDE + F.col("segment_idx"),
        ).otherwise(F.raise_error(F.concat(
            F.lit("segment_idx overflows SEGMENT_ID_STRIDE for doc "),
            F.col("doc_id").cast("string"))))
        docs = pieces.select(pid.alias("doc_id"), "text")
    scores = lm_perplexity(docs, lm=lm)
    fluent = docs.join(
        scores.where(F.col("ppl_proxy") <= ppl_cut).select("doc_id"),
        "doc_id")
    chunks = chunk_documents(fluent, window=window, stride=stride)
    uid = F.when(
        F.col("chunk_idx") < CHUNK_ID_STRIDE,
        F.col("doc_id") * CHUNK_ID_STRIDE + F.col("chunk_idx"),
    ).otherwise(F.raise_error(F.concat(
        F.lit("chunk_idx overflows CHUNK_ID_STRIDE for doc "),
        F.col("doc_id").cast("string"))))
    return chunks.select(uid.alias("chunk_uid"), "doc_id", "chunk_idx",
                         "n_chunk_tokens", "chunk_text")


def run_corpus_stream(spark: SparkSession, docs_path: str,
                      lm: tuple[DataFrame, DataFrame, DataFrame],
                      ppl_cut: float, chunk_zone: str,
                      checkpoint: str, window: int = 64,
                      stride: int = 48,
                      max_files_per_trigger: int | None = None,
                      span_index: DataFrame | None = None) -> None:
    """Continuous corpus ingest, drained with Trigger.AvailableNow:
    document stream -> LM gate -> chunking -> chunk-zone append, one
    subdirectory per micro-batch id. The per-batch write is
    ``mode("overwrite")`` into ``batch_id=<id>`` — a batch REPLAYED
    after a failure (same id, same files, deterministic transforms)
    rewrites the identical directory, so the sink is idempotent
    (exactly-once content under the file source's at-least-once
    delivery; same protocol as the MERGE sink in bronze_stream.py).
    At scale the trigger becomes continuous and the source a broker;
    everything below the read line is unchanged."""
    stream = read_document_stream(spark, docs_path, max_files_per_trigger)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        out = gate_and_chunk(batch_df, lm, ppl_cut, window, stride,
                             span_index=span_index)
        (out.write.mode("overwrite")
            .parquet(f"{chunk_zone}/batch_id={batch_id}"))

    (stream.writeStream.foreachBatch(_ingest)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())


def finalize_training_shards(spark: SparkSession, chunk_zone: str,
                             shards_dir: str,
                             token_budget: int = 512,
                             n_streams: int = 32) -> DataFrame:
    """Pack the accumulated chunk zone into one-file-per-shard training
    shards (operators/packing.py). Shard assignment is a pure function
    of the chunk SET (hash of chunk_uid -> stream; cumsum in chunk_uid
    order) — independent of how many micro-batches delivered it, which
    is what makes streamed ingest + finalize byte-identical to the
    batch chain. Returns the assignment table."""
    from pyspark.errors import AnalysisException

    from aws_payment_data_lake_spark.operators.packing import (
        write_training_shards,
    )

    # a stream that ran zero batches never created the zone — name the
    # condition instead of surfacing a bare path-missing
    # AnalysisException (ADVICE r6). Detected via the Spark read, not
    # os.path.isdir: the zone may live on any Hadoop-resolvable
    # filesystem (file:/, s3a://, hdfs://) where a local path test is
    # meaningless (review r7 finding).
    try:
        chunks = (spark.read.parquet(chunk_zone)
                  .select("chunk_uid", F.col("chunk_text").alias("text")))
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            raise FileNotFoundError(
                f"chunk zone {chunk_zone!r} does not exist — the "
                "ingest stream produced no batches; nothing to "
                "finalize") from e
        raise
    return write_training_shards(
        chunks, shards_dir, token_budget=token_budget,
        n_streams=n_streams, id_col="chunk_uid")


def quality_score_stream(docs_stream: DataFrame, model,
                         threshold: float = 0.5) -> DataFrame:
    """The learned quality gate (operators/quality_model.py) on a
    stream: a BATCH-trained PipelineModel scores arriving documents —
    the CCNet deployment twin of `lm_score_stream`, with the broadcast
    weight vector in place of the count-table stream-static join.
    Tokenize -> HashingTF -> logistic transform are all stateless
    row-local maps, so the result stays an APPEND-mode stream with no
    watermark and no state store; replayed micro-batches rescore to
    bit-identical probabilities (the model is frozen). Training on a
    stream is out by nature (LBFGS needs global passes) — exactly the
    batch-train / stream-score split the module docstring describes
    for the LM gate."""
    from aws_payment_data_lake_spark.operators.quality_model import (
        score_documents,
    )

    return score_documents(model, docs_stream, threshold=threshold)
