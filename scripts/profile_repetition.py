"""One-off profiler for text_repetition_profile variants (VERDICT r4 #1).

Times the current implementation against restructured gram builds at
sf0.1, stage by stage, so round 5 optimizes with evidence instead of
guessing. Run: python scripts/profile_repetition.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.sources import load  # noqa: E402
from aws_payment_data_lake_spark.queries.text import (  # noqa: E402
    text_repetition_profile,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NS = (2, 3, 5)


def _rollup(counts):
    total = F.sum("cnt")
    dup = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
    return (
        counts.groupBy("doc_id", "n")
        .agg(total.alias("total_ngrams"),
             F.max("cnt").alias("max_count"),
             F.round(F.max("cnt") / total.cast("double"), 6)
             .alias("top_frac"),
             F.round(dup / total.cast("double"), 6).alias("dup_frac"))
        .orderBy("doc_id", "n")
    )


def variant_zipwith(spark, sf_dir):
    """Incremental n-gram: gram_n = zip_with(gram_{n-1}[:-1], tk[n:])."""
    (docs,) = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    docs = docs.select("doc_id", tk.alias("tk"), F.size(tk).alias("sz"))
    grams = {1: F.col("tk")}
    for n in range(2, max(NS) + 1):
        prev = grams[n - 1]
        tail = F.slice(F.col("tk"), n, F.greatest(
            F.col("sz") - (n - 1), F.lit(0)))
        head = F.slice(prev, 1, F.greatest(F.col("sz") - (n - 1), F.lit(0)))
        grams[n] = F.zip_with(head, tail,
                              lambda a, b: F.concat(a, F.lit(" "), b))

    def _tag(n):
        # one-arg lambda via closure: a two-arg lambda would receive the
        # element INDEX as arg 2 (see queries/text.py NOTE)
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(F.array(*[
        F.transform(grams[n], _tag(n)) for n in NS
    ]))
    g = (docs.select("doc_id", F.explode(tagged).alias("t"))
         .select("doc_id", "t.n", "t.gram"))
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    return _rollup(counts)


def variant_window(spark, sf_dir):
    """posexplode once, window lead()s build grams with codegen concat."""
    (docs,) = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w0"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = tok.select(
        "doc_id",
        F.col("w0"),
        *[F.lead("w0", i).over(w).alias(f"w{i}") for i in range(1, max(NS))],
    )
    sp = F.lit(" ")
    gram_cols = []
    for n in NS:
        parts = [F.col("w0")]
        for i in range(1, n):
            parts += [sp, F.col(f"w{i}")]
        gram_cols.append(F.struct(F.lit(n).alias("n"),
                                  F.concat(*parts).alias("gram")))
    g = (leads.select("doc_id", F.explode(F.array(*gram_cols)).alias("t"))
         .select("doc_id", "t.n", "t.gram")
         .where(F.col("gram").isNotNull()))
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    return _rollup(counts)


def variant_sql_ngrams(spark, sf_dir):
    """Grams via transform(sequence, i -> array_join(slice(tk,i,n)))."""
    (docs,) = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    docs = docs.select("doc_id", tk.alias("tk"), F.size(tk).alias("sz"))

    def ngrams(n):
        idx = F.sequence(F.lit(1), F.greatest(
            F.col("sz") - (n - 1), F.lit(0)))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(F.col("tk"), i, n), " "))

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(F.array(*[
        F.transform(ngrams(n), _tag(n)) for n in NS
    ]))
    g = (docs.select("doc_id", F.explode(tagged).alias("t"))
         .select("doc_id", "t.n", "t.gram"))
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    return _rollup(counts)


def _word_ngrams_legacy(tk, n: int):
    """The round-4 gram build this profiler retired: ~n interpreted
    element_at probes + a concat_ws per produced gram (kept here so the
    A/B stays reproducible; measured 12.7 s vs 2.7 s for the zip_with
    build at sf0.1, same partitioning)."""
    idx = F.sequence(F.lit(1), F.size(tk) - (n - 1))
    gram = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(tk, i + j) for j in range(n)]))
    return F.when(F.size(tk) >= n, gram).otherwise(
        F.array().cast("array<string>"))


def variant_legacy(spark, sf_dir):
    """Round-4 implementation, reconstructed."""
    (docs,) = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(F.array(*[
        F.transform(_word_ngrams_legacy(tk, n), _tag(n)) for n in NS
    ]))
    g = (docs.select("doc_id", F.explode(tagged).alias("t"))
         .select("doc_id", "t.n", "t.gram"))
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    return _rollup(counts)


def variant_zipwith_repart(spark, sf_dir):
    """zipwith build but spread over cores first (at 100 TB the scan has
    thousands of partitions anyway; locally one small file = one task)."""
    (docs,) = load(spark, sf_dir, "documents")
    docs = docs.repartition(32, "doc_id")
    tk = F.split("text", " ")
    docs = docs.select("doc_id", tk.alias("tk"), F.size(tk).alias("sz"))
    grams = {1: F.col("tk")}
    for n in range(2, max(NS) + 1):
        prev = grams[n - 1]
        tail = F.slice(F.col("tk"), n, F.greatest(
            F.col("sz") - (n - 1), F.lit(0)))
        head = F.slice(prev, 1, F.greatest(F.col("sz") - (n - 1), F.lit(0)))
        grams[n] = F.zip_with(head, tail,
                              lambda a, b: F.concat(a, F.lit(" "), b))

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(F.array(*[
        F.transform(grams[n], _tag(n)) for n in NS
    ]))
    g = (docs.select("doc_id", F.explode(tagged).alias("t"))
         .select("doc_id", "t.n", "t.gram"))
    counts = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    return _rollup(counts)


def main():
    spark = get_spark(app_name="profile-repetition")
    fns = {
        "legacy_r4": variant_legacy,
        "current": text_repetition_profile,
        "zipwith": variant_zipwith,
        "zipwith_repart": variant_zipwith_repart,
        "window_lead": variant_window,
        "slice_join": variant_sql_ngrams,
    }
    # warm-up
    fns["current"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    for name, fn in fns.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name:24s} {best:7.3f}s")

    # parity: each variant must equal the current implementation exactly
    base = text_repetition_profile(spark, SF_DIR).collect()
    for name in ("legacy_r4", "zipwith", "zipwith_repart", "window_lead",
                 "slice_join"):
        got = fns[name](spark, SF_DIR).collect()
        print(f"parity {name:12s}: {'OK' if got == base else 'MISMATCH'}")


if __name__ == "__main__":
    main()
