"""Corpus source report: every column re-derived from the component
queries' own (individually oracle-checked) outputs — a compositional
correctness argument — plus shape/determinism."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.dedup import (
    exact_duplicate_groups,
)
from aws_payment_data_lake_spark.queries.decontam import (
    text_decontamination,
)
from aws_payment_data_lake_spark.queries.report import corpus_source_report
from aws_payment_data_lake_spark.queries.text import text_profile
from aws_payment_data_lake_spark.sources import load


def test_report_columns_rederive(spark):
    got = {r["source"]: r for r in
           corpus_source_report(spark, SF_DIR).collect()}
    assert len(got) > 1

    (docs,) = load(spark, SF_DIR, "documents")
    src_of = {r["doc_id"]: r["source"]
              for r in docs.select("doc_id", "source").collect()}
    prof = {r["doc_id"]: r for r in text_profile(spark, SF_DIR).collect()}
    dup_ids = set()
    for r in exact_duplicate_groups(docs).collect():
        dup_ids |= {int(d) for d in r["doc_ids"].split(",")}
    contaminated = {r["doc_id"] for r in
                    text_decontamination(spark, SF_DIR).collect()
                    if r["contaminated"]}

    by_src: dict[str, list[int]] = {}
    for d, s in src_of.items():
        by_src.setdefault(s, []).append(d)
    assert set(got) == set(by_src)
    for s, members in by_src.items():
        r = got[s]
        assert r["n_docs"] == len(members)
        assert r["total_tokens"] == sum(prof[d]["n_tokens"]
                                        for d in members)
        assert r["n_exact_dup"] == sum(d in dup_ids for d in members)
        assert r["n_contaminated"] == sum(d in contaminated
                                          for d in members)
        langs: dict[str, int] = {}
        for d in members:
            langs[prof[d]["pred_lang"]] = langs.get(
                prof[d]["pred_lang"], 0) + 1
        want_lang = sorted(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert r["majority_lang"] == want_lang, (s, langs)
        want_q = sum(prof[d]["quality_score"] for d in members) / len(members)
        assert r["avg_quality"] == pytest.approx(want_q, abs=1e-3)


def test_report_deterministic(spark):
    a = [tuple(r) for r in corpus_source_report(spark, SF_DIR).collect()]
    b = [tuple(r) for r in corpus_source_report(spark, SF_DIR).collect()]
    assert a == b
