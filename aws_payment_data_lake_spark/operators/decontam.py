"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene gate (e.g. GPT-3 appendix C / PaLM
§C: 8-gram—13-gram overlap between training corpus and eval sets):
a training document containing any n-gram that also appears in a
benchmark document leaks eval data into training and must be dropped
or scrubbed before the shard-packing stage.

Scale shape: the benchmark side is SMALL by nature (eval sets are
thousands of docs, the corpus is billions), so its distinct-gram-hash
table broadcasts and the corpus side is one explode + broadcast hash
join + per-doc aggregation — no corpus-sized shuffle at all. Grams
join on the md5-based 60-bit hash (functions.text.hash60), not the
raw string: an 8-gram averages ~50 bytes vs 8 hash bytes, so the
broadcast table and the probe rows shrink ~6x. A 60-bit collision can
flag a clean doc (P ~ |bench grams| * |corpus grams| / 2^60 — at a
billion-gram benchmark x a trillion-gram corpus, ~1e-3 spurious doc
flags corpus-wide); decontamination tolerates false POSITIVES by
contract (dropping one extra doc is free, leaking eval data is not),
the same trade Bloom-filter decontam pipelines make.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from aws_payment_data_lake_spark.functions import hash60, tokens, word_ngrams
from aws_payment_data_lake_spark.operators.spread import spread_narrow_scan

DEFAULT_NGRAM = 8


def benchmark_gram_hashes(benchmark: DataFrame, n: int = DEFAULT_NGRAM,
                          text_col: str = "text") -> DataFrame:
    """Distinct 60-bit hashes of every word n-gram in the benchmark set
    — the (small) probe table a decontamination pass joins against. In
    production this is a stored table rebuilt when eval sets change."""
    return (
        benchmark
        .select(F.explode(word_ngrams(tokens(text_col), n)).alias("gram"))
        .select(hash60(F.col("gram")).alias("gh"))
        .distinct()
    )


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            n: int = DEFAULT_NGRAM, id_col: str = "doc_id",
                            text_col: str = "text",
                            broadcast_bench: bool = True) -> DataFrame:
    """One row per corpus document: (doc_id, n_grams, n_hits,
    contamination_frac, contaminated).

    n_grams counts the doc's DISTINCT n-grams (set semantics — one
    leaked gram repeated 50 times is one leak); n_hits counts how many
    of those appear anywhere in the benchmark; `contaminated` is the
    conservative any-hit flag downstream filters key on. Docs shorter
    than n tokens emit (0, 0, 0.0, false) rather than vanishing.

    ``broadcast_bench=False`` falls back to a plain shuffled join for
    the rare benchmark set too large to broadcast; the output contract
    is identical."""
    # Narrow-scan spread guard: the n-gram build is the CPU-heavy part
    # (operators/spread.py has the full rationale). Measured at sf1.0:
    # warm 11.5 s -> ~2 s.
    corpus = spread_narrow_scan(corpus, id_col)
    grams = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(
                F.array_distinct(word_ngrams(tokens(text_col), n)))
            .alias("gram"))
        .withColumn("gh", hash60(F.col("gram")))
    )
    bench = benchmark_gram_hashes(benchmark, n, text_col).withColumn(
        "hit", F.lit(1))
    if broadcast_bench:
        bench = F.broadcast(bench)
    # left join: null gram (short doc) and misses both keep the row with
    # hit = null, so the per-doc aggregation sees every document.
    n_hits = F.count("hit")
    n_grams = F.count("gram")
    return (
        grams.join(bench, "gh", "left")
        .groupBy("doc_id")
        .agg(n_grams.alias("n_grams"),
             n_hits.alias("n_hits"),
             F.round(n_hits / F.greatest(n_grams, F.lit(1)).cast("double"),
                     6).alias("contamination_frac"),
             (n_hits > 0).alias("contaminated"))
    )
