"""replaceWhere (Delta parity): atomically replace exactly the rows
matching a predicate with new data, ONE commit — the backfill
primitive (re-run one day of a date-clustered table without touching
any other byte)."""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    AppendOnlyError,
    TxnTable,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


def _mk(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(100).selectExpr(
        "id", "cast(id % 10 as string) AS day",
        "cast(id as double) AS v"),
        partition_by=["day"], partition_files=10)
    return t


def test_replaces_exactly_the_slice_file_granular(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = set(t._replay().live)
    new = spark.range(3).selectExpr(
        "id + 1000 AS id", "cast(3 as string) AS day",
        "cast(99.0 as double) AS v")
    res = t.replace_where(new, "day = '3'")
    after = t._replay()
    # only the day=3 files were touched; every other file KEPT ITS
    # BYTES (path identity is byte identity — files are immutable)
    untouched = before & set(after.live)
    assert len(before) - len(untouched) == res["files_rewritten"]
    assert res["files_rewritten"] >= 1
    out = t.snapshot()
    assert out.where("day = '3'").count() == 3
    assert sorted(r.id for r in out.where("day = '3'").collect()) \
        == [1000, 1001, 1002]
    assert out.count() == 90 + 3        # 10 old rows out, 3 new in
    # one commit, time travel reads the pre-replace slice
    assert t.snapshot(version=0).where("day = '3'").count() == 10


def test_incoming_rows_must_satisfy_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = spark.range(2).selectExpr(
        "id", "cast(id as string) AS day",
        "cast(0.0 as double) AS v")  # day 0 and 1
    with pytest.raises(ValueError, match="outside the slice"):
        t.replace_where(bad, "day = '0'")
    assert t.latest_version() == 0      # nothing committed


def test_sql_arm_and_empty_slice(spark, tmp_path):
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t USING txlog PARTITIONED BY (day) AS "
            "SELECT id, CAST(id % 4 AS STRING) AS day FROM range(40)")
    cat.sql("INSERT INTO t REPLACE WHERE day = '2' "
            "SELECT id, day FROM (SELECT CAST(777 AS BIGINT) AS id, '2' AS day)")
    assert [r.id for r in
            cat.sql("SELECT id FROM t WHERE day = '2'").collect()] \
        == [777]
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 31
    # predicate matching nothing: pure insert, zero rewrites
    res = cat.sql("INSERT INTO t REPLACE WHERE day = '9' "
                  "SELECT CAST(900 AS BIGINT) AS id, '9' AS day").collect()
    vals = {r.metric: r.value for r in res}
    assert vals["files_rewritten"] == 0
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 32


def test_append_only_blocks_and_cdf_images(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_properties({"txlog.appendOnly": "true"})
    with pytest.raises(AppendOnlyError):
        t.replace_where(
            spark.range(1).selectExpr(
                "id", "cast(5 as string) AS day",
                "cast(0.0 as double) AS v"),
            "day = '5'")
    t.unset_properties(["txlog.appendOnly"])
    t.set_properties({"txlog.enableChangeDataFeed": "true"})
    v0 = t.latest_version()
    t.replace_where(
        spark.range(1).selectExpr(
            "id + 500 AS id", "cast(5 as string) AS day",
            "cast(1.5 as double) AS v"),
        "day = '5'")
    ev = t.changes(v0, include_deletes=True)
    assert ev.where("_change_type = 'delete'").count() == 10
    assert [r.id for r in
            ev.where("_change_type = 'insert'").collect()] == [500]
