"""Bigram-LM perplexity quality gate over `documents` (unregistered —
the driver's 50-slot window is full, the decontam/shingle-jaccard
precedent): DuckDB parity runs in tests/test_lm_quality.py with a
float tolerance (the score is a mean of logs — cross-engine ulp noise
makes a strict hash the wrong comparator; SURVEY.md §7.5), and the
query stays on the bench for a timing record."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.lm_quality import lm_perplexity
from aws_payment_data_lake_spark.sources import load


def lm_perplexity_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained add-one bigram LM scores every document; output
    (doc_id, n_tokens, avg_logprob, ppl_proxy) ordered by doc_id.
    CCNet-style deployment notes live on operators/lm_quality.py."""
    (docs,) = load(spark, sf_dir, "documents")
    return lm_perplexity(docs).orderBy("doc_id")
