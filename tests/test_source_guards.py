"""Static source guards for session-poisoning / plan landmines that
targeted suites cannot catch (they only bite in shared-session or
at-scale contexts). Pure text checks — no Spark session."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "aws_payment_data_lake_spark")


def _sources():
    """(path, source-with-comments-stripped) per package module — the
    guards match CODE, not the explanatory comments that name the
    pattern they forbid."""
    for dirpath, _, names in os.walk(PKG):
        for n in names:
            if n.endswith(".py"):
                p = os.path.join(dirpath, n)
                with open(p) as f:
                    code = "\n".join(
                        line.split("#", 1)[0] for line in f)
                yield p, code


def test_no_observation_usage():
    """Spark 4.1: ANY .observe() action leaves ObservationManager
    captured in later RDD-path closures — every subsequent MLlib job
    in the session dies with 'Task not serializable' (round-9 probe;
    full revert). Metrics must stay explicit counting passes."""
    hits = [p for p, src in _sources()
            if re.search(r"\.observe\(|from pyspark\.sql import "
                         r".*Observation", src)]
    assert not hits, f"Observation usage re-landed in: {hits}"


def test_no_empty_window_partition_spec():
    """Window.partitionBy() with no args (and constant-key variants,
    which the optimizer folds away) compile to a partitionless
    WindowExec — single-task global sorts and the 'No Partition
    Defined' warnings the bench must stay free of (round-8 verdict,
    closed round 9)."""
    bad = []
    for p, src in _sources():
        if re.search(r"Window\.partitionBy\(\s*\)", src):
            bad.append((p, "empty partitionBy()"))
        if re.search(r"Window\.partitionBy\(\s*F\.lit\(", src):
            bad.append((p, "constant partitionBy (optimizer-folded)"))
    assert not bad, f"partitionless window spec re-landed: {bad}"


def test_no_rdd_or_row_udf_in_package():
    """The engine's standing claims: zero row-at-a-time Python UDFs
    and zero RDD API on any data path (vectorized Arrow batches and
    DataFrame ops only)."""
    bad = []
    for p, src in _sources():
        if re.search(r"\bF\.udf\(|@udf\b", src):
            bad.append((p, "row udf"))
        if re.search(r"\.rdd\b|sparkContext\.parallelize", src):
            bad.append((p, "rdd api"))
    assert not bad, bad
