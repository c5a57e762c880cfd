"""Benchmark decontamination: DuckDB parity + planted-leak semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.decontam import (
    benchmark_contamination,
)
from aws_payment_data_lake_spark.oracle import compare_spark_duck
from aws_payment_data_lake_spark.queries.decontam import (
    _DECONTAM_ORACLE,
    text_decontamination,
)


def test_decontamination_matches_duck(spark, duck):
    status = compare_spark_duck(text_decontamination(spark, SF_DIR),
                                duck, _DECONTAM_ORACLE)
    assert not status, status


def test_planted_leak_is_flagged(spark):
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            # contains bench 8-gram "b c d e f g h i" verbatim
            (1, "x y b c d e f g h i z"),
            # same words, different order -> no 8-gram overlap
            (2, "j i h g f e d c b a x y z w v u t s"),
            # shorter than 8 tokens -> zero grams, never contaminated
            (3, "a b c"),
        ],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            benchmark_contamination(corpus, bench, n=8).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_hits"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_hits"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]
    assert rows[3]["contamination_frac"] == 0.0
    # distinct-gram semantics: doc 1 has 4 distinct positions of len-8
    # windows (11 tokens -> 4 grams)
    assert rows[1]["n_grams"] == 4


def test_broadcast_and_shuffle_paths_agree(spark):
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    a = sorted(map(tuple, benchmark_contamination(
        corpus, bench, broadcast_bench=True).collect()))
    b = sorted(map(tuple, benchmark_contamination(
        corpus, bench, broadcast_bench=False).collect()))
    assert a == b and a
