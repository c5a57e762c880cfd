"""SCD Type-2 history (plans/scd.py): change detection, interval
integrity, idempotent replay, point-in-time reads."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from aws_payment_data_lake_spark.plans.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

D1, D2, D3 = (dt.date(2026, 1, 1), dt.date(2026, 2, 1), dt.date(2026, 3, 1))
SCHEMA = "custkey long, segment string, nation long"


@pytest.fixture(scope="module")
def history(spark):
    base = spark.createDataFrame(
        [(1, "AUTO", 10), (2, "BANK", 20), (3, "RETAIL", 30)], SCHEMA)
    h1 = scd2_init(base, D1)
    # Feb: 1 changes segment, 2 unchanged, 4 is new, 3 absent
    upd2 = spark.createDataFrame(
        [(1, "HOME", 10), (2, "BANK", 20), (4, "AUTO", 40)], SCHEMA)
    # between batches the history lives as a STORED table (each apply
    # reads the previous write) — localCheckpoint stands in for the
    # parquet round-trip and keeps each apply's plan self-contained
    h2 = scd2_apply(h1, upd2, "custkey", ["segment", "nation"],
                    D2).localCheckpoint(eager=True)
    # Mar: 1 changes nation, 4 nulls its segment (NULL is a change)
    upd3 = spark.createDataFrame(
        [(1, "HOME", 11), (4, None, 40)], SCHEMA)
    h3 = scd2_apply(h2, upd3, "custkey", ["segment", "nation"],
                    D3).localCheckpoint(eager=True)
    return h1, h2, h3, upd3


def test_change_detection_and_versions(spark, history):
    _, h2, h3, _ = history
    rows = {(r["custkey"], r["valid_from"], r["valid_to"], r["is_current"],
             r["segment"], r["nation"])
            for r in h3.collect()}
    assert (1, D1, D2, False, "AUTO", 10) in rows   # closed at first change
    assert (1, D2, D3, False, "HOME", 10) in rows   # closed at second
    assert (1, D3, None, True, "HOME", 11) in rows  # current
    assert (2, D1, None, True, "BANK", 20) in rows  # never changed
    assert (3, D1, None, True, "RETAIL", 30) in rows  # absent = untouched
    assert (4, D2, D3, False, "AUTO", 40) in rows
    assert (4, D3, None, True, None, 40) in rows    # NULL counts as change
    assert len(rows) == 7


def test_interval_integrity(spark, history):
    """Per key: exactly one current row, no overlapping intervals, and
    each closed row's valid_to equals the next version's valid_from
    (time is partitioned with no gaps)."""
    *_, h3, _ = history
    cur = h3.where("is_current").groupBy("custkey").count()
    assert cur.where(F.col("count") != 1).count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("custkey").orderBy("valid_from")
    chained = h3.withColumn("next_from", F.lead("valid_from").over(w))
    # every non-latest version is closed exactly at its successor's start
    assert chained.where(
        F.col("next_from").isNotNull()
        & (F.col("valid_to").isNull()
           | (F.col("valid_to") != F.col("next_from")))).count() == 0
    # the latest version per key is the open current one
    assert chained.where(
        F.col("next_from").isNull()
        & (~F.col("is_current") | F.col("valid_to").isNotNull())
    ).count() == 0


def test_replay_is_idempotent(spark, history):
    """Re-applying the same snapshot at the same as_of changes nothing
    (null-safe equality sees no attribute change)."""
    *_, h3, upd3 = history
    again = scd2_apply(h3, upd3, "custkey", ["segment", "nation"], D3)
    assert again.exceptAll(h3).count() == 0
    assert h3.exceptAll(again).count() == 0


def test_as_of_views(spark, history):
    *_, h3, _ = history
    jan = {(r["custkey"], r["segment"], r["nation"])
           for r in scd2_as_of(h3, dt.date(2026, 1, 15)).collect()}
    assert jan == {(1, "AUTO", 10), (2, "BANK", 20), (3, "RETAIL", 30)}
    feb = {(r["custkey"], r["segment"], r["nation"])
           for r in scd2_as_of(h3, dt.date(2026, 2, 15)).collect()}
    assert feb == {(1, "HOME", 10), (2, "BANK", 20), (3, "RETAIL", 30),
                   (4, "AUTO", 40)}
    # boundary day: the new version is already in force AT valid_from
    mar1 = {(r["custkey"], r["segment"], r["nation"])
            for r in scd2_as_of(h3, D3).collect()}
    assert (1, "HOME", 11) in mar1 and (4, None, 40) in mar1


def test_closed_history_stays_out_of_the_join(spark, history):
    """Plan guard: the closed slice reaches the output through a filter
    + union only — growing history depth never inflates the join. The
    full-outer join's inputs are the current slice and the updates."""
    import contextlib
    import io
    import re

    *_, h3, upd3 = history
    out = scd2_apply(h3, upd3, "custkey", ["segment", "nation"], D3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) \w*Join", plan)) == 1, plan
