"""Schema-evolution reads over mixed-version parquet zones: added
columns, widened primitives, pinned-schema pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from aws_payment_data_lake_spark.sources.readers import read_evolved

V2 = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("note", T.StringType()),
])


def _mixed_zone(spark, path: str) -> None:
    """v1 files: (id int, amount float); v2 files add `note` and widen
    both numerics — the upgrade a shipped pipeline actually makes."""
    (spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, amount float")
     .write.mode("append").parquet(path))
    (spark.createDataFrame([(2**40, 9.25, "v2")],
                           "id long, amount double, note string")
     .write.mode("append").parquet(path))


def test_pinned_schema_reads_mixed_versions(spark, tmp_path):
    zone = str(tmp_path / "zone")
    _mixed_zone(spark, zone)
    df = read_evolved(spark, zone, V2)
    assert df.schema == V2
    rows = sorted((r["id"], r["amount"], r["note"]) for r in df.collect())
    assert rows == [(1, 1.5, None), (2, 2.5, None), (2**40, 9.25, "v2")]


def test_merge_schema_tier_handles_added_columns(spark, tmp_path):
    """Same-width files with an added column merge without a pinned
    schema; the old files surface the new column as null."""
    zone = str(tmp_path / "zone")
    (spark.createDataFrame([(1, "a")], "id long, s string")
     .write.mode("append").parquet(zone))
    (spark.createDataFrame([(2, "b", 7)], "id long, s string, extra long")
     .write.mode("append").parquet(zone))
    df = read_evolved(spark, zone)
    got = {r["id"]: (r["s"], r["extra"]) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", 7)}


def test_pinned_schema_keeps_pushdown(spark, tmp_path):
    """Filters on widened columns still reach the parquet scan —
    the whole point of widening in-scan instead of casting above it."""
    zone = str(tmp_path / "zone")
    _mixed_zone(spark, zone)
    df = read_evolved(spark, zone, V2).where("id = 2")
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "PushedFilters" in text
    assert "id" in text.split("PushedFilters")[1][:120]
    assert [r["id"] for r in df.collect()] == [2]


def test_conflicting_widths_need_the_pinned_tier(spark, tmp_path):
    """mergeSchema refuses int-vs-long conflicts (documented); the
    pinned-schema tier is the upgrade path."""
    zone = str(tmp_path / "zone")
    _mixed_zone(spark, zone)
    with pytest.raises(Exception):
        read_evolved(spark, zone).collect()
