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


# ------------------------------------------- second review pass (high)
def test_quote_aware_dml_parsing(spark, tmp_path):
    """Commas/parens/WHERE inside string literals are content, not
    structure — for UPDATE SET, TBLPROPERTIES, and MERGE VALUES."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t (id bigint, note string) USING txlog")
    cat.sql("INSERT INTO t VALUES (1, 'x')")
    cat.sql("UPDATE t SET note = 'a,b (c) where d' WHERE id = 1")
    assert cat.sql("SELECT note FROM t").collect()[0][0] \
        == "a,b (c) where d"
    cat.sql("ALTER TABLE t SET TBLPROPERTIES ('k' = 'v1,v2')")
    props = {r.key: r.value
             for r in cat.sql("SHOW TBLPROPERTIES t").collect()}
    assert props["k"] == "v1,v2"
    cat.sql("""
        MERGE INTO t AS a USING (SELECT CAST(2 AS BIGINT) AS id) AS b
        ON a.id = b.id
        WHEN NOT MATCHED THEN INSERT (id, note) VALUES (b.id, 'p,q')
    """)
    assert cat.sql("SELECT note FROM t WHERE id = 2").collect()[0][0] \
        == "p,q"


def test_merge_using_deeply_nested_subquery(spark, tmp_path):
    """The USING source is a balanced scan, not a finite-depth regex:
    doubly-nested function calls are ordinary SQL."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t USING txlog AS "
            "SELECT CAST(id AS BIGINT) AS id, "
            "CAST(id AS DOUBLE) AS v FROM range(5)")
    cat.sql("""
        MERGE INTO t USING (
            SELECT id, COALESCE(NULLIF(CAST(v AS DOUBLE), 0.0), 1.0)
                   AS v
            FROM (SELECT CAST(id AS BIGINT) AS id,
                         CAST(id * 2 AS DOUBLE) AS v FROM range(3))
        ) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = {r.id: r.v for r in cat.sql("SELECT * FROM t").collect()}
    assert got[0] == 1.0 and got[1] == 2.0 and got[2] == 4.0


def test_unregistered_dml_passes_through(spark, tmp_path):
    """The class contract: unregistered names belong to the session
    catalog — INSERT/DELETE/DROP on a plain temp view/table must not
    be hijacked with a lakehouse KeyError."""
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    spark.sql("DROP TABLE IF EXISTS plainper")
    spark.sql(f"CREATE TABLE plainper (a INT) USING parquet "
              f"LOCATION '{tmp_path / 'plain'}'")
    try:
        cat.sql("INSERT INTO plainper VALUES (1)")
        assert cat.sql("SELECT COUNT(*) FROM plainper"
                       ).collect()[0][0] == 1
        cat.sql("DROP TABLE plainper")
    finally:
        spark.sql("DROP TABLE IF EXISTS plainper")


def test_failed_create_leaves_no_catalog_entry(spark, tmp_path):
    import pytest as _pytest
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    with _pytest.raises(Exception):
        cat.sql("CREATE TABLE bad USING txlog AS "
                "SELECT * FROM definitely_not_a_view")
    assert cat.sql("SHOW TABLES").count() == 0
    # and a FRESH catalog agrees (nothing durable leaked)
    assert LakehouseCatalog(spark, warehouse=cat.warehouse
                            ).sql("SHOW TABLES").count() == 0


def test_pushdown_accumulates_range_bounds(spark, tmp_path):
    """BETWEEN arrives as >= AND <=; both sides must prune."""
    from aws_payment_data_lake_spark.sources.txlog_batch import (
        _SnapshotReader,
    )
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThanOrEqual,
    )
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(8000).selectExpr("id"),
             partition_by=["id"], partition_files=8)
    rd = _SnapshotReader({"path": t.path})
    list(rd.pushFilters([GreaterThanOrEqual(("id",), 3000),
                         LessThanOrEqual(("id",), 3999)]))
    kept = rd.partitions()
    assert 1 <= len(kept) <= 2      # the middle slice, not 5 files
    # end-to-end exactness through Spark
    from aws_payment_data_lake_spark.sources.txlog_batch import (
        register_txlog_source,
    )
    register_txlog_source(spark)
    got = (spark.read.format("txlog").option("path", t.path).load()
           .where("id >= 3000 AND id <= 3999").count())
    assert got == 1000


def test_writer_commits_checkpoint_on_cadence(spark, tmp_path):
    """A plain-Spark-only writer must checkpoint like every package
    path, or replay cost grows with each commit forever."""
    import os as _os
    from aws_payment_data_lake_spark.sources.txlog_batch import (
        register_txlog_source,
    )
    register_txlog_source(spark)
    p = str(tmp_path / "t")
    for i in range(11):
        (spark.range(i, i + 1).write.format("txlog").mode("append")
         .option("path", p).save())
    ckpts = [n for n in _os.listdir(_os.path.join(p, "_txlog"))
             if n.endswith(".checkpoint.parquet")]
    assert ckpts, "no checkpoint after 11 plain-Spark commits"
