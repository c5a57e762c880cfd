"""Benchmark decontamination: DuckDB parity (single- and multi-n) +
planted-leak semantics + the scrub/split action's zero-overlap
guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.decontam import (
    SPEC_NGRAMS,
    benchmark_contamination,
    scrub_contaminated,
)
from aws_payment_data_lake_spark.oracle import compare_spark_duck
from aws_payment_data_lake_spark.queries.decontam import (
    _DECONTAM_ORACLE,
    text_decontamination,
)

# Multi-n twin of _DECONTAM_ORACLE: the gram CTEs cross-join a size
# table (8..13) and union the distinct grams per doc.
_NS_SQL = ", ".join(f"({k})" for k in SPEC_NGRAMS)
_MULTI_ORACLE = f"""
WITH tokd AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
nsz(n) AS (VALUES {_NS_SQL}),
bg AS (SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
       FROM (SELECT unnest(list_transform(range(1, len(tk) - n + 2),
                    i -> array_to_string(tk[i:i+n-1], ' '))) AS g
             FROM tokd, nsz WHERE doc_id % 101 = 0 AND len(tk) >= n)),
cg AS (SELECT doc_id,
              list_distinct(flatten(list(CASE WHEN len(tk) >= n
                THEN list_transform(range(1, len(tk) - n + 2),
                     i -> array_to_string(tk[i:i+n-1], ' '))
                ELSE [] END))) AS grams
       FROM tokd, nsz WHERE doc_id % 101 <> 0 GROUP BY doc_id),
x AS (SELECT doc_id, unnest(grams) AS g FROM cg),
hits AS (SELECT doc_id, count(*) AS n_hits
         FROM x JOIN bg
           ON ('0x' || substr(md5(g), 1, 15))::BIGINT = bg.gh
         GROUP BY doc_id)
SELECT c.doc_id,
       CAST(len(c.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0 /
             greatest(len(c.grams), 1), 6) AS contamination_frac,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM cg c LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


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


def test_multi_n_matches_duck(spark, duck):
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    q = (benchmark_contamination(corpus, bench, n=SPEC_NGRAMS)
         .select("doc_id",
                 F.col("n_grams").cast("long").alias("n_grams"),
                 F.col("n_hits").cast("long").alias("n_hits"),
                 "contamination_frac", "contaminated")
         .orderBy("doc_id"))
    status = compare_spark_duck(q, duck, _MULTI_ORACLE)
    assert not status, status


def test_scrub_splits_around_planted_leak(spark):
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h i j")], "doc_id long, text string")
    prefix = "p0 p1 p2 p3 p4 p5 p6 p7 p8"          # 9 clean tokens
    suffix = "s0 s1 s2 s3 s4 s5 s6 s7"             # 8 clean tokens
    corpus = spark.createDataFrame(
        [
            (1, f"{prefix} a b c d e f g h i j {suffix}"),  # mid leak
            (2, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9"),           # clean
            (3, "a b c d e f g h i j"),                     # all leak
        ],
        "doc_id long, text string")
    out = scrub_contaminated(corpus, bench, n=8)
    rows = {(r["doc_id"], r["segment_idx"]): r for r in out.collect()}
    # doc 1: the 10-token leaked span is removed; prefix and suffix
    # survive as two pieces at their positional indices
    assert rows[(1, 0)]["text"] == prefix
    assert rows[(1, 1)]["text"] == suffix
    assert rows[(1, 0)]["n_tokens"] == 9 and rows[(1, 1)]["n_tokens"] == 8
    # doc 2 passes through whole; doc 3 vanishes
    assert rows[(2, 0)]["text"].startswith("q0") \
        and rows[(2, 0)]["n_tokens"] == 10
    assert not any(d == 3 for d, _ in rows)
    assert len(rows) == 3

    # a re-run over the scrubbed pieces finds ZERO overlap
    rescored = benchmark_contamination(
        out.select((F.col("doc_id") * 1000 + F.col("segment_idx"))
                   .alias("doc_id"), "text"),
        bench, n=8)
    assert rescored.where("contaminated").count() == 0

    # min_tokens drops crumbs but keeps indices positional
    floored = scrub_contaminated(corpus, bench, n=8, min_tokens=9)
    kept = {(r["doc_id"], r["segment_idx"])
            for r in floored.collect()}
    assert kept == {(1, 0), (2, 0)}  # 8-token suffix dropped


def test_scrub_zero_overlap_at_corpus_scale(spark):
    """The structural guarantee on real data, multi-n: scrubbed pieces
    re-scored against the same benchmark carry zero hits."""
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    before = benchmark_contamination(corpus, bench, n=SPEC_NGRAMS)
    n_dirty = before.where("contaminated").count()
    assert n_dirty > 0  # the dup groups straddle the split at every SF

    scrubbed = scrub_contaminated(corpus, bench, n=SPEC_NGRAMS)
    rescored = benchmark_contamination(
        scrubbed.select(
            (F.col("doc_id") * 100000 + F.col("segment_idx"))
            .alias("doc_id"), "text"),
        bench, n=SPEC_NGRAMS)
    assert rescored.where("contaminated").count() == 0
    # clean docs pass through byte-identical
    clean_in = corpus.join(before.where("NOT contaminated"), "doc_id") \
        .select("doc_id", "text")
    clean_out = scrubbed.where("segment_idx = 0") \
        .join(before.where("NOT contaminated"), "doc_id") \
        .select("doc_id", "text")
    assert (sorted(map(tuple, clean_in.collect()))
            == sorted(map(tuple, clean_out.collect())))


def test_fast_hash_path_agrees_with_oracle_hash(spark):
    """HASH_FAST (xxhash64, the production knob) must produce the same
    flags and the same scrubbed pieces as HASH_ORACLE (md5-hash60, the
    DuckDB-replayable twin) — hashing only changes set-membership
    mechanics, never semantics."""
    from aws_payment_data_lake_spark.operators.decontam import (
        HASH_FAST,
        HASH_ORACLE,
    )
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    corpus = docs.where(F.col("doc_id") % 101 != 0)
    for fn in (benchmark_contamination,
               lambda c, b, n, hash_fn: scrub_contaminated(
                   c, b, n=n, hash_fn=hash_fn)):
        a = sorted(map(tuple, fn(corpus, bench, n=SPEC_NGRAMS,
                                 hash_fn=HASH_ORACLE).collect()))
        b = sorted(map(tuple, fn(corpus, bench, n=SPEC_NGRAMS,
                                 hash_fn=HASH_FAST).collect()))
        assert a == b and a


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
