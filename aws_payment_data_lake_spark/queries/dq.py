"""Declarative DQ engine as a benched lifecycle (operators/dq.py).

Not in the <=50-query driver registry — the registry is pinned at the
driver's 50-slot window and the run_ts / anomaly surface is wall-clock
shaped, so the correctness story lives in tests/test_dq.py (exact
fraction parity against independently computed counts, single-scan
plan proof, persisted-history time travel, z-score anomaly flags).
This entry benches what a platform team actually runs nightly: a
rules-as-data check compiled to ONE single-pass aggregate over an
SF-scaled payments feed, per-day metrics appended to a txlog history
table, the newest run z-scored against that history, and the gold
dashboard rollup (the reference's README.md:131 Deequ row +
README.md:133 Monitoring row, end-to-end on engine primitives)."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators.dq import (
    DQRunner,
    dq_dashboard,
    payment_rules,
)
from aws_payment_data_lake_spark.plans.bronze import cast_dtypes
from aws_payment_data_lake_spark.plans.generator import (
    generate_transactions,
)
from aws_payment_data_lake_spark.telemetry import timed_phase

_DAYS = 5


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(sf_dir.rstrip("/"))
                     .replace("sf", ""))
    except ValueError:
        return 0.01


def dq_check_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-DQ lifecycle at SF scale: 5 daily feeds (day 4 degraded
    10x), each checked by the canonical payments rule set in one
    single-pass aggregate and appended to a txlog metrics table; the
    final day is z-scored against the accumulated history. Returns the
    dashboard rollup joined with the anomaly verdicts — pass rates,
    metric bands, and which rules tripped."""
    sf = _sf_of(sf_dir)
    rows_per_day = max(5_000, int(sf * 1_000_000))
    rules = payment_rules()
    tmp = tempfile.mkdtemp(prefix="dq-bench-")
    # the returned frame lazily scans the metrics table — clean up at
    # exit, not here (same pattern as txn-bench slots that return
    # lazy readers over tmp state)
    import atexit
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    FAM = "dq_check_payments"
    runner = DQRunner(spark, os.path.join(tmp, "dq_metrics"),
                      k_sigma=3.0, min_history=3)
    base = datetime(2024, 1, 1)
    with timed_phase(FAM, "daily_runs"):
        for day in range(_DAYS):
            # the LAST day is the incident: 10x corruption — below
            # the 97% thresholds AND an outlier against 4 stable
            # prior runs, so the z-score check fires on the newest
            # run (which is the run anomalies() scores)
            rate = 0.2 if day == _DAYS - 1 else 0.02
            feed = cast_dtypes(generate_transactions(
                spark, days=1, rows_per_day=rows_per_day,
                start_date=f"2024-01-{day + 1:02d}",
                invalid_rate=rate, seed=100 + day))
            runner.run(feed, rules, dataset="payments",
                       run_ts=base + timedelta(days=day))
    with timed_phase(FAM, "anomaly"):
        anomalies = runner.anomalies().select(
            "dataset", "rule",
            F.col("metric").alias("latest_metric"),
            "hist_mean", "hist_n", "anomalous")
    with timed_phase(FAM, "dashboard"):
        dash = dq_dashboard(runner.history())
        out = (dash.join(anomalies, ["dataset", "rule"], "left")
               .orderBy("dataset", "rule", "run_date"))
    return out.coalesce(1)
