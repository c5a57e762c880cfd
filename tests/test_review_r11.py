"""Regression tests for the round-11 self-review findings (adversarial
code review over fe2802c..HEAD): writer-overwrite vs column mapping,
CDF image files vs schema evolution, deep-clone dead DV targets,
REPLACE WHERE VALUES alignment, replace() identity validation, and
SHOW TABLES literal escaping."""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.sources.txlog import TxnTable
from aws_payment_data_lake_spark.sources.txlog_batch import (
    read_txlog,
    register_txlog_source,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


def test_writer_overwrite_of_mapped_table_keeps_values(spark,
                                                       tmp_path):
    """Finding 1: overwrite used the OLD physical mapping in the files
    while its commit reset column_mapping={} — every renamed column
    silently read NULL."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t (id bigint, old string) USING txlog")
    cat.sql("INSERT INTO t VALUES (1, 'a')")
    cat.sql("ALTER TABLE t RENAME COLUMN old TO label")
    register_txlog_source(spark)
    (spark.createDataFrame([(9, "z")], "id bigint, label string")
     .write.format("txlog").mode("overwrite")
     .option("path", cat.table("t").path).save())
    got = cat.sql("SELECT * FROM t").collect()
    assert [(r.id, r.label) for r in got] == [(9, "z")]   # NOT None
    assert sorted(
        tuple(r)
        for r in read_txlog(spark, cat.table("t").path).collect()
    ) == [(9, "z")]


def test_changes_survive_schema_evolution_after_cdc_commit(
        spark, tmp_path):
    """Finding 2: cdc image files were read raw, so evolution around
    a CDF commit crashed the feed's union; they now reconcile to the
    head schema like every historical file."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(4).selectExpr(
        "id", "cast(id as double) AS amount"))
    t.set_properties({"txlog.enableChangeDataFeed": "true"})
    t.update({"amount": "amount + 1"}, "id = 2")          # cdc commit
    t.append(spark.createDataFrame([(100, 1.0, "tag")],
                                   "id long, amount double, "
                                   "note string"),
             schema_mode="merge")                         # widen
    ev = t.changes(0, include_deletes=True)
    assert "note" in ev.columns
    img = ev.where("_change_type = 'update_postimage'").collect()
    assert [(r.id, r.amount, r.note) for r in img] \
        == [(2, 3.0, None)]             # old image null-fills new col


def test_changes_survive_rename_after_cdc_commit(spark, tmp_path):
    """Finding 6: a rename after a cdc commit NULL-filled the feed
    (cdc files now spell PHYSICAL names and alias through the head
    mapping, batch AND stream)."""
    from aws_payment_data_lake_spark.sources.txlog_stream import (
        stream_table_feed,
    )
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(3).selectExpr(
        "id", "cast(id as double) AS a"))
    t.set_properties({"txlog.enableChangeDataFeed": "true"})
    t.update({"a": "a * 10"}, "id = 1")
    t.rename_column("a", "b")
    ev = t.changes(0, include_deletes=True)
    post = ev.where("_change_type = 'update_postimage'").collect()
    assert [(r.id, r.b) for r in post] == [(1, 10.0)]     # NOT None
    q = (stream_table_feed(spark, t.path, read_change_feed=True)
         .writeStream.format("memory").queryName("rn_feed")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    spost = spark.sql("SELECT * FROM rn_feed "
                      "WHERE _change_type = 'update_postimage'"
                      ).collect()
    assert [(r.id, r.b) for r in spost] == [(1, 10.0)]


def test_deep_clone_tolerates_dead_dv_targets(spark, tmp_path):
    """Finding 3: a sidecar retaining rows for a target file that a
    later rewrite retired crashed clone_deep with KeyError."""
    src = TxnTable(spark, str(tmp_path / "src"))
    # two files, one DV delete touching BOTH (one sidecar, two targets)
    src.create(spark.range(20).selectExpr("id", "id % 2 AS k"),
               partition_by=["id"], partition_files=2)
    assert len(src._replay().live) == 2
    src.delete("id IN (3, 17)", mode="dv")   # rows in both files
    # rewrite ONE file via cow update: its sidecar rows go dead while
    # the sibling target keeps the sidecar referenced
    src.update({"k": "k + 100"}, "id = 1", mode="cow")
    snap = src._replay()
    assert snap.dvs                          # sidecar still live
    dst = TxnTable(spark, str(tmp_path / "dst")).clone_deep(src)
    out = dst.snapshot()
    assert out.count() == 18
    assert out.where("id IN (3, 17)").count() == 0
    assert out.where("k >= 100").count() == 1


def test_replace_where_values_form_works(spark, tmp_path):
    """Finding 4: the advertised VALUES form was dead on arrival (no
    positional alignment)."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t USING txlog AS "
            "SELECT CAST(id AS BIGINT) AS id, "
            "CAST(id % 3 AS STRING) AS day FROM range(9)")
    cat.sql("INSERT INTO t REPLACE WHERE day = '1' "
            "VALUES (701, '1'), (702, '1')")
    got = sorted(r.id for r in
                 cat.sql("SELECT id FROM t WHERE day = '1'").collect())
    assert got == [701, 702]
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 8
    with pytest.raises(ValueError, match="arity"):
        cat.sql("INSERT INTO t REPLACE WHERE day = '1' VALUES (1)")


def test_replace_validates_identity_spec(spark, tmp_path):
    """Finding 5 (real half): replace() skipped create()'s identity
    validation, letting a step<1 or non-integer spec in through
    CREATE OR REPLACE."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(2).selectExpr("id"))
    with pytest.raises(ValueError, match="must be >= 1"):
        t.replace(spark.createDataFrame([], "pk bigint, v long"),
                  identity={"pk": {"start": 0, "step": -1}})
    with pytest.raises(ValueError, match="integer type"):
        t.replace(spark.createDataFrame([], "pk string, v long"),
                  identity={"pk": {"start": 0, "step": 1}})


def test_show_tables_escapes_awkward_paths(spark, tmp_path):
    """Finding 9: a quote in the warehouse path broke SHOW TABLES."""
    wh = tmp_path / "o'brien wh"
    cat = LakehouseCatalog(spark, warehouse=str(wh))
    cat.sql("CREATE TABLE t (id bigint) USING txlog")
    rows = cat.sql("SHOW TABLES").collect()
    assert rows[0].tableName == "t"
    assert "o'brien wh" in rows[0].location
