"""Learned quality filter (operators/quality_model.py): planted-signal
AUC, scoring transparency (manual sigmoid == transform), durable-tier
bit-equality + stale gate, and the map-only scoring plan."""

from __future__ import annotations

import re
import tempfile

import numpy as np
import pyspark.sql.functions as F
import pytest

import aws_payment_data_lake_spark.operators.quality_model as Q
from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.sources.store import corpus_fingerprint
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def planted(spark):
    """200 docs with an unmistakable lexical quality signal: 'good' docs
    are diverse sentences, 'bad' docs are low-diversity repetition (the
    shape a crawl-quality filter must separate)."""
    rows = []
    for i in range(100):
        rows.append((i, f"the quick analysis of topic {i} shows varied "
                        f"useful structure and careful detail {i * 7}", 1.0))
        rows.append((100 + i, ("spam spam spam buy now " * 5).strip(), 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def model(planted):
    return Q.train_quality_model(planted.where(F.col("doc_id") % 2 == 0))


def test_planted_signal_auc(planted, model):
    """Held-out AUC on the planted split is near-perfect, and every
    planted extreme lands on its side of the 0.5 gate."""
    hold = planted.where(F.col("doc_id") % 2 == 1)
    assert Q.holdout_auc(model, hold) >= 0.95
    scored = Q.score_documents(model, hold).join(
        hold.select("doc_id", "label"), "doc_id")
    assert scored.where(
        F.col("keep").cast("double") != F.col("label")).count() == 0


def test_corpus_weak_label_auc(spark):
    """On the real documents table, weak labels from the heuristic bands
    train a model that generalizes to held-out banded docs (the CCNet
    contract: the learned filter reproduces the trusted/raw separation)."""
    (docs,) = load(spark, SF_DIR, "documents")
    lab = Q.weak_labels(docs, band=0.3)
    m = Q.train_quality_model(lab.where(F.col("doc_id") % 2 == 0))
    assert Q.holdout_auc(m, lab.where(F.col("doc_id") % 2 == 1)) >= 0.8


def test_scoring_is_exactly_a_linear_map(planted, model):
    """transform() probability equals sigmoid(w . tf(x) + b) computed
    from the model's own coefficients with plain array ops — nothing
    hidden behind the MLlib call, so scoring cost is provably one
    broadcast dot per document."""
    sample = planted.limit(30)
    got = Q.score_documents(model, sample)
    manual = Q.linear_parity_frame(model, sample)
    joined = got.join(manual, "doc_id")
    assert joined.where(
        F.abs(F.col("quality_prob") - F.col("manual_prob")) > 1e-9
    ).count() == 0


def test_durable_model_roundtrip(spark, planted, model):
    """Fingerprint-gated MLlib persistence: matching fingerprint loads
    bit-identical coefficients (scores identical without retraining);
    any corpus change flips the fingerprint and forces retrain."""
    store = tempfile.mkdtemp(prefix="qm_store_")
    fp = corpus_fingerprint(planted, "doc_id", "text")
    Q.save_quality_model(model, store, fp)
    back = Q.load_quality_model(spark, store, fp)
    assert back is not None
    assert np.array_equal(model.stages[-1].coefficients.toArray(),
                          back.stages[-1].coefficients.toArray())
    assert float(model.stages[-1].intercept) == float(
        back.stages[-1].intercept)
    rolled = planted.limit(50)
    assert Q.load_quality_model(
        spark, store, corpus_fingerprint(rolled, "doc_id", "text")) is None


def test_scoring_plan_is_shuffle_free(spark, model):
    """The corpus-scoring pass must contain NO Exchange: the weights are
    broadcast inside the transform, so scoring 100 TB is a map-only
    scan (same plan class as the heuristic gate)."""
    import contextlib
    import io

    (docs,) = load(spark, SF_DIR, "documents")
    scored = Q.score_documents(model, docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_weak_labels_match_window_percent_rank(spark):
    """VERDICT r9 #3: the distributed two-pass rank must produce
    EXACTLY the labels of the reference percent-rank form (window over
    (heur_score, doc_id)) — including at band boundaries — and its
    plan must contain no single-partition exchange."""
    from pyspark.sql import Window

    (docs,) = load(spark, SF_DIR, "documents")
    got = Q.weak_labels(docs, band=0.3)
    # reference: the window form (test-only; the source guard bans it
    # from the package, not from tests)
    h = Q.heuristic_quality(docs)
    w = Window.orderBy("heur_score", "doc_id")
    ref = (h.withColumn("pr", F.percent_rank().over(w))
           .where((F.col("pr") >= 0.7) | (F.col("pr") <= 0.3))
           .select("doc_id",
                   (F.col("pr") >= 0.7).cast("double").alias("label")))
    got_map = {r["doc_id"]: r["label"] for r in got.collect()}
    ref_map = {r["doc_id"]: r["label"] for r in ref.collect()}
    assert got_map == ref_map
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "coalesce(1" not in plan.lower()


def test_weak_labels_stride_and_tiny_inputs(spark):
    """Stride subsampling composes with the distributed rank; 0/1/2-row
    inputs neither divide by zero nor mis-rank."""
    rows = [(i, f"w{i} " * (i + 1)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = Q.weak_labels(docs, band=0.5, stride=2)
    ids = {r["doc_id"] for r in lab.collect()}
    assert ids <= {0, 2, 4, 6, 8}       # only the stride sample
    one = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = Q.weak_labels(one, band=0.3).collect()
    assert len(out) == 1                # pr = 0 <= band
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert Q.weak_labels(empty, band=0.3).count() == 0
