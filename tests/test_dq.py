"""Declarative DQ rule engine (operators/dq.py) — the reference's
declared-but-unbuilt Deequ integration (README.md:131) + metrics
dashboard feed (README.md:133).

Covers: every rule kind against hand-checkable frames, the single-pass
compilation guarantee (ONE scan in the physical plan), the generator's
four invalidity modes against payment_rules(), txlog-persisted history
with time travel, the mean±k·sigma anomaly check, and the gate()
integration with the silver pipeline.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from aws_payment_data_lake_spark.operators.dq import (
    DQRunner,
    DQViolationError,
    Rule,
    as_rules,
    check,
    compile_rules,
    gate,
    payment_rules,
)
from aws_payment_data_lake_spark.plans.bronze import cast_dtypes
from aws_payment_data_lake_spark.plans.generator import (
    generate_transactions,
)


def _metrics(df, rules, **kw):
    return {r.rule: r.asDict() for r in check(df, rules, **kw).collect()}


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, "EUR"),
         (2, "b", 20.0, "USD"),
         (3, None, -5.0, "EUR"),
         (4, "d", 200.0, "ZZZ"),
         (4, "e", 30.0, "USD")],
        "id bigint, name string, amount double, currency string")


# ------------------------------------------------------------- kinds
def test_not_null(spark, frame):
    m = _metrics(frame, [Rule("r", "not_null", column="name")])
    assert m["r"]["metric"] == pytest.approx(4 / 5)
    assert not m["r"]["passed"]
    assert m["r"]["rows"] == 5


def test_unique_exact_and_composite(spark, frame):
    m = _metrics(frame, [
        Rule("pk", "unique", column="id"),
        Rule("ck", "unique", column="id,name"),
    ])
    assert m["pk"]["metric"] == pytest.approx(4 / 5)  # id=4 twice
    assert not m["pk"]["passed"]
    assert m["ck"]["metric"] == pytest.approx(1.0)    # (4,d) != (4,e)
    assert m["ck"]["passed"]


def test_unique_approx_tracks_exact_on_small_data(spark, frame):
    m = _metrics(frame, [Rule("pk", "unique_approx", column="id",
                              threshold=0.9)])
    # HLL is exact at this cardinality; metric capped at 1.0
    assert m["pk"]["metric"] == pytest.approx(4 / 5, abs=0.05)


def test_in_set_null_fails_membership(spark, frame):
    m = _metrics(frame, [Rule("cur", "in_set", column="currency",
                              values=("EUR", "USD"))])
    assert m["cur"]["metric"] == pytest.approx(4 / 5)


def test_range_bounds(spark, frame):
    m = _metrics(frame, [
        Rule("lo", "range", column="amount", lo=0.0),
        Rule("band", "range", column="amount", lo=0.0, hi=100.0),
    ])
    assert m["lo"]["metric"] == pytest.approx(4 / 5)
    assert m["band"]["metric"] == pytest.approx(3 / 5)


def test_matches_and_custom_expr(spark, frame):
    m = _metrics(frame, [
        Rule("alpha", "matches", column="name", pattern=r"^[a-z]$"),
        Rule("big_eur", "custom_expr",
             expr="currency = 'EUR' AND amount > 0"),
    ])
    assert m["alpha"]["metric"] == pytest.approx(4 / 5)  # null fails
    assert m["big_eur"]["metric"] == pytest.approx(1 / 5)


def test_min_rows(spark, frame):
    m = _metrics(frame, [Rule("n", "min_rows", threshold=5),
                         Rule("n2", "min_rows", threshold=6)])
    assert m["n"]["passed"] and m["n"]["metric"] == 5.0
    assert not m["n2"]["passed"]


def test_empty_frame_fractions_vacuous(spark):
    df = spark.createDataFrame([], "id bigint, v string")
    m = _metrics(df, [Rule("nn", "not_null", column="v"),
                      Rule("u", "unique", column="id"),
                      Rule("n", "min_rows", threshold=1)])
    assert m["nn"]["metric"] == 1.0 and m["u"]["metric"] == 1.0
    assert not m["n"]["passed"]


# ------------------------------------------------ rules-as-data layer
def test_dict_rules_coerce_and_validate(spark, frame):
    m = _metrics(frame, [
        {"name": "cur", "kind": "in_set", "column": "currency",
         "values": ["EUR", "USD"], "threshold": 0.5},
    ])
    assert m["cur"]["passed"]
    with pytest.raises(ValueError, match="unknown kind"):
        as_rules([{"name": "x", "kind": "nope"}])
    with pytest.raises(ValueError, match="duplicate rule names"):
        as_rules([Rule("a", "min_rows"), Rule("a", "min_rows")])
    with pytest.raises(ValueError, match="requires a column"):
        Rule("x", "not_null")
    with pytest.raises(ValueError, match="requires expr"):
        Rule("x", "custom_expr")
    with pytest.raises(ValueError, match="requires lo"):
        Rule("x", "range", column="c")


# ------------------------------------------------- single-pass proof
def test_whole_rule_set_is_one_scan(spark, tmp_path):
    """Deequ's analyzer fusion: N rules must NOT mean N scans. The
    compiled aggregate's physical plan reads the parquet exactly once
    (unique adds an Expand, not a second scan)."""
    p = str(tmp_path / "scan_once")
    spark.range(100).selectExpr(
        "id", "cast(id % 7 as string) AS v", "id * 1.5 AS a"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    agg = compile_rules(df, as_rules([
        Rule("nn", "not_null", column="v"),
        Rule("u", "unique", column="id"),
        Rule("rng", "range", column="a", lo=0.0, hi=1000.0),
        Rule("re", "matches", column="v", pattern=r"\d"),
        Rule("ce", "custom_expr", expr="a > id"),
    ]))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


# ------------------------------ generator's four invalidity modes
def test_payment_rules_catch_each_generator_mode(spark):
    raw = generate_transactions(spark, days=2, rows_per_day=2000,
                                invalid_rate=0.05, seed=7)
    typed = cast_dtypes(raw)
    m = _metrics(typed, payment_rules(), dataset="payments")
    # exact per-mode expectations computed independently of the engine
    n = typed.count()
    bad_amount = typed.where(
        F.col("amount").isNull() | (F.col("amount") <= 0)).count()
    bad_cur = typed.where(F.col("currency") == "ZZZ").count()
    bad_status = typed.where(F.col("status") == "PENDINGISH").count()
    blank_user = typed.where(F.trim("user_id") == "").count()
    assert bad_amount and bad_cur and bad_status and blank_user, \
        "generator must inject all four modes at this size"
    assert m["amount_positive"]["metric"] == pytest.approx(
        (n - bad_amount) / n)
    assert m["currency_known"]["metric"] == pytest.approx(
        (n - bad_cur) / n)
    assert m["status_known"]["metric"] == pytest.approx(
        (n - bad_status) / n)
    assert m["user_present"]["metric"] == pytest.approx(
        (n - blank_user) / n)
    assert m["txn_id_unique"]["passed"]   # uuid-shaped ids, no dups
    # 5% corruption spread over 4 modes ≈ 1.25% each — inside the
    # 97% thresholds, so the canonical set passes on healthy data
    assert all(v["passed"] for v in m.values())


def test_payment_rules_fail_on_degraded_feed(spark):
    raw = generate_transactions(spark, days=1, rows_per_day=2000,
                                invalid_rate=0.5, seed=9)
    m = _metrics(cast_dtypes(raw), payment_rules())
    assert not all(v["passed"] for v in m.values())


# ------------------------------------------------ history + anomaly
def test_runner_persists_time_travelable_history(spark, tmp_path):
    runner = DQRunner(spark, str(tmp_path / "dq_metrics"))
    rules = [Rule("nn", "not_null", column="v"),
             Rule("u", "unique", column="id")]
    for i in range(3):
        df = spark.range(50 + i).selectExpr(
            "id", "cast(id as string) AS v")
        runner.run(df, rules, dataset="d")
    h = runner.history()
    assert h.count() == 6 and h.where("passed").count() == 6
    # the history itself time-travels: version 0 = first run only
    assert runner.history(version=0).count() == 2
    assert len(runner.table.history()) == 3


def test_anomaly_flags_only_the_outlier(spark, tmp_path):
    runner = DQRunner(spark, str(tmp_path / "dq_anom"),
                      k_sigma=3.0, min_history=3)
    rules = [Rule("nn", "not_null", column="v", threshold=0.5,
                  blocking=False)]
    # 5 stable runs: null fraction oscillates ~0.50±0.01
    for i in range(5):
        df = spark.range(1000).selectExpr(
            "id",
            f"CASE WHEN (id + {i}) % 100 < {50 + i % 2} "
            f"THEN cast(id as string) END AS v")
        runner.run(df, rules, dataset="d")
    a1 = {r.rule: r for r in runner.anomalies().collect()}
    assert not a1["nn"].anomalous
    # collapse: nulls jump to ~90%
    bad = spark.range(1000).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN cast(id as string) END AS v")
    runner.run(bad, rules, dataset="d")
    a2 = {r.rule: r for r in runner.anomalies().collect()}
    assert a2["nn"].anomalous
    assert a2["nn"].hist_n == 5
    assert a2["nn"].metric == pytest.approx(0.1)


def test_anomaly_needs_min_history(spark, tmp_path):
    runner = DQRunner(spark, str(tmp_path / "dq_young"), min_history=3)
    rules = [Rule("nn", "not_null", column="v", blocking=False)]
    runner.run(spark.range(10).selectExpr(
        "id", "cast(id as string) AS v"), rules)
    runner.run(spark.range(10).selectExpr(
        "id", "CASE WHEN id < 5 THEN cast(id as string) END AS v"),
        rules)
    a = {r.rule: r for r in runner.anomalies().collect()}
    assert not a["nn"].anomalous  # only 1 prior run < min_history


def test_anomaly_zero_sigma_history_flags_any_change(spark, tmp_path):
    runner = DQRunner(spark, str(tmp_path / "dq_flat"), min_history=3)
    rules = [Rule("nn", "not_null", column="v", blocking=False)]
    clean = spark.range(100).selectExpr("id", "cast(id as string) AS v")
    for _ in range(4):
        runner.run(clean, rules)
    assert not {r.rule: r for r in
                runner.anomalies().collect()}["nn"].anomalous
    runner.run(spark.range(100).selectExpr(
        "id", "CASE WHEN id < 99 THEN cast(id as string) END AS v"),
        rules)
    assert {r.rule: r for r in
            runner.anomalies().collect()}["nn"].anomalous


# ------------------------------------------------------------- gate
def test_gate_passes_and_raises(spark, frame):
    ok = gate(frame, [Rule("n", "min_rows", threshold=1)])
    assert ok is frame
    with pytest.raises(DQViolationError, match="name_nn"):
        gate(frame, [Rule("name_nn", "not_null", column="name")])


def test_gate_nonblocking_rule_never_raises(spark, frame):
    out = gate(frame, [Rule("name_nn", "not_null", column="name",
                            blocking=False)])
    assert out is frame


def test_gate_persists_failed_run_before_raising(spark, frame, tmp_path):
    runner = DQRunner(spark, str(tmp_path / "dq_gate"))
    with pytest.raises(DQViolationError):
        gate(frame, [Rule("name_nn", "not_null", column="name")],
             runner=runner, dataset="payments")
    h = runner.history().collect()
    assert len(h) == 1 and not h[0].passed  # the failure left a trail


def test_silver_pipeline_gated_by_rules(spark):
    """The optional DQ gate on the medallion silver hop: a healthy feed
    flows through, a degraded one is stopped BEFORE writing silver."""
    from aws_payment_data_lake_spark.plans.silver import run_silver
    raw = generate_transactions(spark, days=1, rows_per_day=2000,
                                invalid_rate=0.01, seed=3)
    typed = cast_dtypes(raw)
    out = run_silver(typed, dq_rules=payment_rules())
    assert out.count() > 0
    degraded = cast_dtypes(generate_transactions(
        spark, days=1, rows_per_day=2000, invalid_rate=0.6, seed=4))
    with pytest.raises(DQViolationError):
        run_silver(degraded, dq_rules=payment_rules())
    # default path unchanged — no rules, no gate
    assert run_silver(degraded).count() > 0
