"""Recall@k instrumentation for the approximate ANN tiers (VERDICT r12
"What's missing" #2): the exact tiers are hash-pinned by the driver;
these tests pin the APPROXIMATE tiers' quality against the exact
brute-force baseline at sf0.01 — so an n_probe / PQ-m / LSH-band tuning
regression fails CI instead of silently shipping worse neighbors.

Floors are set from measured values (local[16], deterministic seeds —
every tier below is seed-deterministic, so the measured numbers are
exact, and the floors sit ~0.05 under them):

  ivf    n_probe=1/4/8      -> 0.680 / 0.805 / 0.920
  pq     adc_only / rerank  -> 0.385 / 0.865
  ivfpq  n_probe=4 + rerank -> 0.805
  rp_lsh bands=4 / bands=8  -> 0.375 / 0.975  (isotropic data — angle
         LSH needs the band dial; clustered-corpus recall is pinned in
         tests/test_similarity_skew.py)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import aws_payment_data_lake_spark.operators.similarity as S
from aws_payment_data_lake_spark.sources import load

SF001 = "/root/testdata/sf0.01"
K, NQ = 10, 20


@pytest.fixture(scope="module")
def emb(spark):
    (e,) = load(spark, SF001, "embeddings")
    return e


@pytest.fixture(scope="module")
def exact(spark, emb):
    df = S.brute_force_topk(emb, k=K, n_queries=NQ).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.where(F.col("vec_id") < NQ)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe")))


@pytest.fixture(scope="module")
def ivf_index(emb):
    return S.build_ivf_index(emb)


@pytest.fixture(scope="module")
def pq_index(emb):
    books = S.train_pq_codebooks(emb)
    codes = S.pq_encode(emb, books).persist()
    codes.count()
    yield books, codes
    codes.unpersist()


def test_ann_recall_contract(spark, exact):
    """recall(exact, exact) == 1 per query; recall against an empty
    approx frame == 0; truncation by k works."""
    per_q = S.ann_recall(exact, exact, k=K).collect()
    assert len(per_q) == NQ
    assert all(r.recall == 1.0 and r.n_true == K for r in per_q)
    empty = exact.where(F.lit(False))
    assert S.mean_recall(exact, empty, k=K) == 0.0
    half = S.ann_recall(exact, exact.where(F.col("rk") <= K // 2),
                        k=K).collect()
    assert all(r.recall == pytest.approx(0.5) for r in half)


def test_ivf_recall_floor_and_n_probe_monotone(exact, ivf_index,
                                               queries):
    cents, assigned = ivf_index
    floors = {1: 0.60, 4: 0.75, 8: 0.85}
    got = {}
    for n_probe, floor in floors.items():
        r = S.mean_recall(exact, S.ivf_probe_topk(
            cents, assigned, queries, k=K, n_probe=n_probe), k=K)
        got[n_probe] = r
        assert r >= floor, f"ivf recall@{K} n_probe={n_probe}: " \
                           f"{r:.3f} < floor {floor}"
    # the dial must actually be a dial: more probes, no less recall
    assert got[1] <= got[4] <= got[8], got


def test_pq_rerank_recall_floor(exact, emb, pq_index, queries):
    books, codes = pq_index
    adc = S.mean_recall(exact, S.pq_topk(codes, queries, books, k=K),
                        k=K)
    rer = S.mean_recall(exact, S.pq_topk(codes, queries, books, k=K,
                                         rerank=emb), k=K)
    assert rer >= 0.80, f"pq+rerank recall@{K}: {rer:.3f}"
    # re-ranking exact cosine over the ADC shortlist must help
    assert rer > adc, (adc, rer)


def test_ivfpq_recall_floor(exact, emb, ivf_index, pq_index, queries):
    cents, assigned = ivf_index
    books, codes = pq_index
    r = S.mean_recall(exact, S.ivfpq_topk(
        cents, assigned, codes, queries, books, k=K, n_probe=4,
        rerank=emb), k=K)
    assert r >= 0.75, f"ivfpq recall@{K}: {r:.3f}"


def test_rp_lsh_band_dial(exact, emb):
    r4 = S.mean_recall(exact, S.rp_lsh_topk(
        emb, k=K, n_queries=NQ, n_planes=16, n_bands=4), k=K)
    r8 = S.mean_recall(exact, S.rp_lsh_topk(
        emb, k=K, n_queries=NQ, n_planes=16, n_bands=8), k=K)
    assert r8 >= 0.90, f"rp_lsh bands=8 recall@{K}: {r8:.3f}"
    # more bands -> more candidates -> strictly better on this corpus
    assert r8 > r4, (r4, r8)


def test_multi_probe_matches_single(ivf_index, queries):
    """r13 optimization: ivf_probe_topk_multi shares ONE candidate
    pass across nested n_probe settings — every per-setting row must
    be identical to the sequential single-setting operator."""
    cents, assigned = ivf_index
    multi = S.ivf_probe_topk_multi(cents, assigned, queries, k=K,
                                   probes=(1, 4, 8)).collect()
    for p in (1, 4, 8):
        single = sorted(tuple(r) for r in S.ivf_probe_topk(
            cents, assigned, queries, k=K, n_probe=p).collect())
        got = sorted(tuple(r)[1:] for r in multi if r["setting"] == p)
        assert got == single, f"n_probe={p}"


def test_multi_band_matches_single(emb):
    """r13 optimization: rp_lsh_topk_multi shares ONE signature matmul
    across band settings — per-setting rows must match the
    single-setting operator exactly."""
    multi = S.rp_lsh_topk_multi(emb, k=K, n_queries=NQ, n_planes=16,
                                bands=(4, 8)).collect()
    for nb in (4, 8):
        single = sorted(tuple(r) for r in S.rp_lsh_topk(
            emb, k=K, n_queries=NQ, n_planes=16, n_bands=nb).collect())
        got = sorted(tuple(r)[1:] for r in multi if r["setting"] == nb)
        assert got == single, f"bands={nb}"


def test_mean_recall_tagged_matches_sequential(exact, ivf_index,
                                               queries):
    """One-action tagged evaluation == per-frame mean_recall, including
    the zero-row label contract."""
    cents, assigned = ivf_index
    f1 = S.ivf_probe_topk(cents, assigned, queries, k=K, n_probe=4)
    olds = {"a": S.mean_recall(exact, f1, k=K), "empty": 0.0}
    tagged = (f1.select(F.lit("a").alias("label"), "query_id",
                        "neighbor_id", "rk")
              .unionByName(f1.where(F.lit(False)).select(
                  F.lit("empty").alias("label"), "query_id",
                  "neighbor_id", "rk")))
    rec = S.mean_recall_tagged(exact, tagged, ["a", "empty"], k=K)
    assert rec["a"] == pytest.approx(olds["a"], abs=1e-12)
    assert rec["empty"] == 0.0


def test_report_slot_emits_stats(spark):
    """The bench slot returns one row per (tier, setting) and records
    the same numbers in the telemetry stats channel."""
    from aws_payment_data_lake_spark.queries.similarity import (
        ann_recall_report,
    )
    from aws_payment_data_lake_spark.telemetry import drain_stats

    drain_stats()
    out = ann_recall_report(spark, SF001).collect()
    stats = drain_stats()
    assert len(out) == 8
    fam = stats["ann_recall_report"]
    assert len(fam) == 8
    by_key = {f"{r.tier}[{r.setting}]@{K}": r[f"recall_at_{K}"]
              for r in out}
    for key, val in fam.items():
        assert by_key[key] == pytest.approx(val, abs=1e-4)


def test_arrow_exact_scorer_matches_jvm(spark):
    """The report's Arrow-scored exact baseline is row-identical to the
    JVM cosine fold (np.round vs F.round could only diverge on an exact
    half-way tie at the 6th decimal — assert none exists at 3 SFs)."""
    for sf in ("/root/testdata/sf0.001", SF001, "/root/testdata/sf0.1"):
        (e,) = load(spark, sf, "embeddings")
        a = S.brute_force_topk(e, k=K, n_queries=NQ, scorer="jvm")
        b = S.brute_force_topk(e, k=K, n_queries=NQ, scorer="arrow")
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect())), sf


def test_assigned_cells_unique_per_vector(ivf_index):
    """The multi-probe path's correctness leans on the
    each-vector-in-exactly-one-cell invariant (it drops the single
    path's defensive distinct); pin the invariant itself (ADVICE r13)."""
    cents, assigned = ivf_index
    n = assigned.count()
    assert assigned.select("neighbor_id").distinct().count() == n
