"""Coverage for operators that deliberately sit OUTSIDE the <=50-query
driver registry (the driver scores only the first 50 registered queries),
plus structural equivalences the merged round-2 queries rely on."""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.oracle import compare_spark_duck
from aws_payment_data_lake_spark.queries.dedup import dedup_shingle_jaccard
from aws_payment_data_lake_spark.queries.sql_surface import (
    _STATUS_FUNNEL,
    sql_status_funnel,
)
from aws_payment_data_lake_spark.queries.udtf_gallery import udtf_order_quarters
from aws_payment_data_lake_spark.sources import load
from tests.conftest import SF_DIR, normalized_rows


def _same(df_a, df_b):
    a = normalized_rows(df_a.columns, [tuple(r) for r in df_a.collect()])
    b = normalized_rows(df_b.columns, [tuple(r) for r in df_b.collect()])
    assert sorted(df_a.columns) == sorted(df_b.columns)
    assert a == b


def test_minhash_lsh_equals_exact_jaccard(spark):
    """The unregistered exact all-pairs baseline returns EXACTLY the rows
    of the registered MinHash-LSH query's batch variant (recall 1 at
    J>=0.6) — which is why registering both would spend two driver slots
    on one result. (The registered slot is a tagged union since round 4;
    the incremental variant is oracle-checked by the driver itself.)"""
    from aws_payment_data_lake_spark.queries.dedup import dedup_minhash_lsh

    _same(dedup_shingle_jaccard(spark, SF_DIR)
          .select("doc_a", "doc_b", F.col("jaccard").alias("score")),
          dedup_minhash_lsh(spark, SF_DIR)
          .where(F.col("variant") == "batch")
          .select("doc_a", "doc_b", "score"))


def test_outer_recon_decomposition_equals_native_full(spark):
    """join_outer_recon builds FULL OUTER as right-join UNION left-anti;
    assert it equals the native how='full' plan row-for-row."""
    from aws_payment_data_lake_spark.queries.relational import join_outer_recon

    orders, li = load(spark, SF_DIR, "orders", "lineitem")
    big = (orders.where(F.col("o_totalprice") > 250_000.0)
           .select("o_orderkey", "o_totalprice"))
    heavy = (li.where(F.col("l_quantity") > 45)
             .groupBy("l_orderkey")
             .agg(F.count(F.lit(1)).alias("n_heavy"),
                  F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("heavy_qty")))
    native = (
        big.join(heavy, big.o_orderkey == heavy.l_orderkey, "full")
        .select(
            F.coalesce("o_orderkey", "l_orderkey").alias("orderkey"),
            F.col("o_orderkey").isNotNull().alias("is_big_order"),
            F.col("l_orderkey").isNotNull().alias("has_heavy_lines"),
            "o_totalprice",
            F.coalesce("n_heavy", F.lit(0)).alias("n_heavy"),
            F.coalesce("heavy_qty", F.lit(0.0)).alias("heavy_qty"),
        )
    )
    _same(join_outer_recon(spark, SF_DIR), native)
    # both "directions" must be non-vacuous at this SF
    out = join_outer_recon(spark, SF_DIR)
    assert out.where(~F.col("is_big_order")).count() > 0
    assert out.where(~F.col("has_heavy_lines")).count() > 0


def test_sql_status_funnel_matches_duck(spark, duck):
    """Unregistered SQL-endpoint twin still hash-matches its oracle text
    (shared verbatim between spark.sql and DuckDB)."""
    status = compare_spark_duck(sql_status_funnel(spark, SF_DIR),
                                duck, _STATUS_FUNNEL)
    assert not status, status


def test_udtf_equals_native_rewrite(spark):
    """The Python UDTF expansion equals the native explode(sequence(...))
    rewrite — documents what the UDTF computes and pins its semantics."""
    (orders,) = load(spark, SF_DIR, "orders")
    native = (
        orders.where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey",
                F.explode(F.sequence(
                    F.lit(0),
                    F.lit(8) - F.quarter("o_orderdate"))).alias("pos"),
                F.date_trunc("quarter", "o_orderdate").alias("q0"))
        .select(F.col("o_orderkey").alias("orderkey"), "pos",
                F.to_date(F.add_months("q0", F.col("pos") * 3))
                .alias("quarter_start"))
    )
    _same(udtf_order_quarters(spark, SF_DIR), native)


def test_exact_dedup_fulltext_and_prefix_tiers(spark):
    """The registered dedup_exact_groups runs on a prefix-100 fingerprint
    key so its driver check is non-vacuous at every SF (full-text exact
    dedup yields 0 groups below sf0.1). The full-text tier stays the
    operator default — assert it fires at sf0.1, where the generator
    injects byte-identical copies, and matches a DuckDB oracle."""
    import duckdb

    from aws_payment_data_lake_spark.operators import dedup as D

    sf01 = "/root/testdata/sf0.1"
    (docs,) = load(spark, sf01, "documents")
    full = D.exact_duplicate_groups(docs).orderBy("text_md5")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf01}/documents.parquet')")
    mism = compare_spark_duck(full, con, """
        SELECT md5(text) AS text_md5, count(*) AS n_copies,
               min(doc_id) AS canonical_doc_id,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
        FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY text_md5""")
    con.close()
    assert not mism, mism[:5]
    assert full.count() > 0
    # prefix tier: non-vacuous even at the small test SF
    (docs_sm,) = load(spark, SF_DIR, "documents")
    assert D.exact_duplicate_groups(docs_sm, prefix_len=100).count() > 0


def test_rolling_range_window_matches_duckdb(spark):
    """RANGE-on-event-time frame parity: Spark rangeBetween(-3600, 0) on
    unix seconds == DuckDB RANGE BETWEEN INTERVAL 1 HOUR PRECEDING."""
    import duckdb

    from aws_payment_data_lake_spark.queries.relational2 import (
        rolling_event_totals,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    mism = compare_spark_duck(
        rolling_event_totals(spark, SF_DIR), con, """
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
        ORDER BY user_id, ts, event_id""")
    con.close()
    assert not mism, mism[:5]


def test_scrub_pii_masks_and_matches_duckdb(spark):
    """PII scrub: hand-checked masking on synthetic strings, then
    cross-engine parity (identical Java∩RE2 regexes) over the documents
    table with injected PII."""
    import duckdb

    from aws_payment_data_lake_spark.functions.text import (
        DUCK_SCRUB,
        scrub_pii,
    )

    cases = {
        "mail me at bob.smith+x@ex-ample.co.uk now":
            "mail me at <EMAIL> now",
        "card 4111 1111 1111 1111 and phone 555-123-4567 ok":
            "card <NUM> and phone <NUM> ok",
        "see https://spam.example/a?b=c#d here":
            "see <URL> here",
        "short 1234567 stays":  # 7 digits: below the 8-digit floor
            "short 1234567 stays",
        "no pii at all": "no pii at all",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r["text"]: r["scrubbed"] for r in
           df.select("text", scrub_pii("text").alias("scrubbed")).collect()}
    assert got == cases

    (docs,) = load(spark, SF_DIR, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" reach a@b.io or 12345678901 via http://x.y/z"))
    sdf = docs.select(
        "doc_id", scrub_pii(injected).alias("scrubbed")).orderBy("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    scrub = DUCK_SCRUB.format(
        col="text || ' reach a@b.io or 12345678901 via http://x.y/z'")
    mism = compare_spark_duck(sdf, con, f"""
        SELECT doc_id, {scrub} AS scrubbed
        FROM documents ORDER BY doc_id""")
    con.close()
    assert not mism, mism[:3]


def test_incremental_minhash_dedup_against_stored_signatures(spark):
    """Delta-batch dedup against a corpus SIGNATURE table (corpus text
    never re-read). Controlled synthetic corpus: three new docs are
    near-copies (~0.8 shingle Jaccard) of distinct corpus docs, two are
    unrelated — exactly the three matches must surface, scored by the
    64-perm estimate."""
    from aws_payment_data_lake_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    def doc(block, drop=0):
        words = [f"w{block}_{i}" for i in range(50)]
        return " ".join(words[drop:] if drop else words)

    corpus = spark.createDataFrame(
        [(100 + b, doc(b)) for b in range(20)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(0, doc(0, drop=2)), (1, doc(1, drop=2)), (2, doc(2, drop=2)),
         (3, doc(97)), (4, doc(98))],
        "doc_id long, text string")

    sigs = minhash_signatures(corpus)
    got = {(r["new_doc_id"], r["corpus_doc_id"]): r["est_jaccard"]
           for r in incremental_minhash_dedup(new, sigs).collect()}
    assert set(got) == {(0, 100), (1, 101), (2, 102)}, got
    assert all(0.6 <= j <= 1.0 for j in got.values()), got

    # Append path: blind-union the new signatures into the state and the
    # same batch now also matches itself exactly (est_jaccard 1.0).
    sigs2 = sigs.unionByName(minhash_signatures(new))
    again = {(r["new_doc_id"], r["corpus_doc_id"]): r["est_jaccard"]
             for r in incremental_minhash_dedup(new, sigs2).collect()}
    for i in range(5):
        assert again[(i, i)] == 1.0
    assert set(again) == set(got) | {(i, i) for i in range(5)}


def test_lsh_hot_bucket_guard(spark):
    """Adversarial hot bucket: 1,000 docs with IDENTICAL signatures put
    all 1,000 in every band's bucket. With bucket_cap=100 the salted
    tier splits each bucket into ceil(1000/100)=10 tasks instead of one
    quadratic collect_list row — and the candidate set is still the full
    triangle."""
    from aws_payment_data_lake_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    n = 1000
    sigs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        *[F.lit(7).cast("long").alias(f"sig{i}") for i in range(64)])
    pairs = lsh_candidate_pairs(sigs, bucket_cap=100)
    assert pairs.count() == n * (n - 1) // 2
    # No collect_list of the hot bucket anywhere in the big tier's plan:
    # the ONLY aggregate over the oversized bucket is the count.
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan.lower() or "salt" in plan.lower()


def test_lsh_salted_tier_matches_default_on_testdata(spark):
    """Cross-tier equality on the real corpus: bucket_cap=2 pushes every
    bucket with >2 members through the salted self-join; the candidate
    set must equal the default bucket-and-expand tier's exactly."""
    from aws_payment_data_lake_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    (docs,) = load(spark, SF_DIR, "documents")
    sigs = minhash_signatures(docs).persist()
    sigs.count()
    default = {(r["doc_a"], r["doc_b"])
               for r in lsh_candidate_pairs(sigs).collect()}
    salted = {(r["doc_a"], r["doc_b"])
              for r in lsh_candidate_pairs(sigs, bucket_cap=2).collect()}
    sigs.unpersist()
    assert default == salted and default


def test_incremental_dedup_nondefault_id_col(spark):
    """id_col/text_col rename the NEW batch's columns; the signature
    table always carries doc_id (doc_shingles normalizes the name).
    Regression for the round-3 UNRESOLVED_COLUMN on non-default id_col."""
    from aws_payment_data_lake_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [(100, " ".join(f"w{i}" for i in range(30)))],
        "ref_id long, body string")
    new = spark.createDataFrame(
        [(7, " ".join(f"w{i}" for i in range(2, 30)))],
        "item_id long, body string")
    sigs = minhash_signatures(corpus, id_col="ref_id", text_col="body")
    assert "doc_id" in sigs.columns
    got = incremental_minhash_dedup(
        new, sigs, id_col="item_id", text_col="body").collect()
    assert [(r["new_doc_id"], r["corpus_doc_id"]) for r in got] == [(7, 100)]


def test_incremental_dedup_agrees_with_exact_on_testdata(spark):
    """On the driver corpus: split at doc_id 50, dedup the low half
    against the high half's signatures; agreement with the
    exact-verified cross pairs (measured 1.0/1.0 on current testdata;
    0.8 floors tolerate borderline pairs in regenerated data)."""
    from aws_payment_data_lake_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    (docs,) = load(spark, SF_DIR, "documents")
    new = docs.where(F.col("doc_id") < 50)
    corpus = docs.where(F.col("doc_id") >= 50)
    got = {(r["new_doc_id"], r["corpus_doc_id"]) for r in
           incremental_minhash_dedup(new, minhash_signatures(corpus))
           .collect()}
    exact = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
             for r in minhash_lsh_pairs(docs).collect()}
    cross = {(a, b) for a, b in exact if a < 50 <= b}
    if cross:
        tp = len(got & cross)
        assert tp / len(cross) >= 0.8, (got, cross)
        assert not got or tp / len(got) >= 0.8, (got, cross)


def test_text_repetition_profile_matches_duck(spark, duck):
    """Gopher-style repetition features hash-match their DuckDB oracle
    (top/dup n-gram occurrence fractions for n in 2,3,5) at sf0.1 — the
    scale probe on top of the registered slot's sf0.01 driver check."""
    from aws_payment_data_lake_spark.queries.text import (
        _REPETITION_ORACLE,
        text_repetition_profile,
    )

    status = compare_spark_duck(text_repetition_profile(spark, SF_DIR),
                                duck, _REPETITION_ORACLE)
    assert not status, status


def test_text_repetition_profile_flags_loopy_doc(spark):
    """A synthetic doc that repeats one phrase scores top_frac/dup_frac
    near 1 for every n; a all-distinct-token doc scores dup_frac 0."""
    from aws_payment_data_lake_spark.queries.text import (
        text_repetition_profile,
    )
    import aws_payment_data_lake_spark.queries.text as TT

    loopy = " ".join(["spam ham"] * 30)          # "spam ham spam ham ..."
    clean = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, loopy), (2, clean)], "doc_id long, text string")

    import unittest.mock as mock
    with mock.patch.object(TT, "load", lambda s, d, *t: (docs,)):
        rows = {(r["doc_id"], r["n"]): r
                for r in text_repetition_profile(spark, SF_DIR).collect()}
    for n in (2, 3, 5):
        assert rows[(1, n)]["dup_frac"] > 0.9, rows[(1, n)]
        assert rows[(2, n)]["dup_frac"] == 0.0, rows[(2, n)]
    # the dominant bigram covers ~half of all bigram positions
    assert rows[(1, 2)]["top_frac"] > 0.45


def test_order_count_histogram_matches_duckdb(spark, duck):
    """Q13 shape: pre-aggregated outer join + count-of-counts histogram
    equals the literal LEFT JOIN ... GROUP BY GROUP BY SQL."""
    from aws_payment_data_lake_spark.queries.relational2 import (
        order_count_histogram,
    )

    status = compare_spark_duck(
        order_count_histogram(spark, SF_DIR), duck, """
        SELECT c_count, CAST(count(*) AS BIGINT) AS n_customers
        FROM (
          SELECT c.c_custkey, coalesce(o.cnt, 0) AS c_count
          FROM customer c LEFT JOIN (
            SELECT o_custkey, count(*) AS cnt FROM orders
            WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey)
        GROUP BY c_count ORDER BY n_customers DESC, c_count DESC
        """)
    assert not status, "; ".join(status)


def test_slow_supplier_blame_matches_duckdb(spark, duck):
    """Q21 shape: the one-shuffle bool_or/collect_set plan returns
    exactly the rows of the literal stacked EXISTS / NOT EXISTS SQL."""
    from aws_payment_data_lake_spark.queries.relational2 import (
        slow_supplier_blame,
    )

    status = compare_spark_duck(
        slow_supplier_blame(spark, SF_DIR), duck, """
        WITH lines AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS slow
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_blamed_orders
        FROM (
          SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lines l1
          WHERE l1.slow
            AND EXISTS (SELECT 1 FROM lines l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lines l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey AND l3.slow)
        ) b JOIN supplier s ON b.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        ORDER BY n_blamed_orders DESC, s_name
        """)
    assert not status, "; ".join(status)
