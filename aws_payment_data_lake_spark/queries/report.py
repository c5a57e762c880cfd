"""Per-source corpus report: the dashboard query a corpus owner runs
before a training cut — one row per `source` with volume, duplication,
contamination, language and quality rollups, assembled from the
already-verified operators (text_profile, exact_duplicate_groups,
text_decontamination) rather than re-deriving any of them.

Unregistered (the driver's 50-slot window is full — the decontam
precedent): tests/test_report.py re-derives every column from the
component queries' own outputs, which are each oracle-checked, so the
report's correctness argument is compositional; float columns compare
at tolerance (averaging per-doc rounded doubles is ulp-noisy
cross-engine). Benched (`corpus_source_report`).

Shape at 100 TB: three already-scalable passes (profile map pass, one
dedup hash agg, the broadcast decontam join) plus a final groupBy
`source` whose cardinality is the source count — the cheapest
aggregation in the repo.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.dedup import (
    exact_duplicate_groups,
)
from aws_payment_data_lake_spark.queries.decontam import (
    text_decontamination,
)
from aws_payment_data_lake_spark.queries.text import text_profile
from aws_payment_data_lake_spark.sources import load


def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per source: (source, n_docs, total_tokens, n_exact_dup,
    n_contaminated, majority_lang, avg_quality). `n_contaminated`
    counts non-benchmark docs only (benchmark rows, doc_id % 101 == 0,
    are the decontam probe set, not scored corpus)."""
    (docs,) = load(spark, sf_dir, "documents")
    prof = text_profile(spark, sf_dir).select(
        "doc_id", "pred_lang", "n_tokens", "quality_score")

    dup_ids = (exact_duplicate_groups(docs)
               .select(F.explode(F.split("doc_ids", ",")).alias("doc_id"))
               .select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.lit(True).alias("is_dup")))
    contam = (text_decontamination(spark, sf_dir)
              .select("doc_id", "contaminated"))

    # materialize once: per_doc feeds both the majority-language branch
    # and the final rollup; without it the profile/dedup/decontam
    # pipeline runs once per branch. localCheckpoint, not .persist:
    # CacheManager entries leak until explicit unpersist, while
    # localCheckpoint blocks are reference-tracked and released when
    # this frame is garbage-collected. Corpus-row-sized, cache-cheap.
    per_doc = (docs.select("doc_id", "source")
               .join(prof, "doc_id")
               .join(dup_ids, "doc_id", "left")
               .join(contam, "doc_id", "left")
               ).localCheckpoint(eager=True)

    lang_counts = (per_doc.groupBy("source", "pred_lang")
                   .agg(F.count(F.lit(1)).alias("n")))
    # majority language with a total order: count desc, then
    # alphabetical (mirrors text_profile's own argmax tiebreak rule);
    # the window runs over source x lang counts — tiny by construction
    from pyspark.sql import Window
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("pred_lang"))
    majority = (lang_counts
                .withColumn("rk", F.row_number().over(w))
                .where("rk = 1")
                .select("source", F.col("pred_lang").alias("majority_lang")))

    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                 .cast("long").alias("n_exact_dup"),
                 F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
                 .cast("long").alias("n_contaminated"),
                 F.round(F.avg("quality_score"), 4).alias("avg_quality"))
            # explicit broadcast: both sides are per-source aggregates
            # of a localCheckpoint (ExistingRDD — no stats), so the
            # planner's fallback is a SortMergeJoin with two extra
            # exchanges for a source-count-sized frame (guide §3.1)
            .join(F.broadcast(majority), "source")
            .orderBy("source"))
