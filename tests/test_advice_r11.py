"""Regression tests for the round-11 ADVICE items (ADVICE.md):

1. (medium) the sql() dispatcher routed every `CREATE OR ...` to
   _create(), hijacking ordinary session statements like
   `CREATE OR REPLACE TEMP VIEW` — only CREATE [OR REPLACE] TABLE is
   the lakehouse's business.
2. (low) batch `format("txlog_feed")` with readChangeFeed=true
   declared a _change_type column its batch reader never emitted —
   now refused loudly with a pointer to table_changes().
3. (low) REPLACE resets copy_sources/txn high-water marks
   (copy_sources_reset/txns_reset commit keys, spec v1.4): a
   COPY INTO re-run or idempotent-append re-delivery after REPLACE
   re-loads the data the replace wiped.
4. (low) the plain-Spark batch writer detects a column-mapping change
   (concurrent RENAME / DROP+re-ADD) between planning and commit and
   raises ConcurrentWriteError instead of publishing files that spell
   retired physical names.
"""

from __future__ import annotations

import json
import os

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    ConcurrentWriteError,
    TxnTable,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


# ---------------------------------------------------------- ADVICE #1
def test_create_or_replace_temp_view_passes_through(spark, cat):
    cat.sql("CREATE TABLE t USING txlog AS "
            "SELECT id, id * 2 AS v FROM range(10)")
    # a plain session statement — must NOT hit the txlog CREATE parser
    cat.sql("CREATE OR REPLACE TEMP VIEW small_t AS "
            "SELECT * FROM t WHERE id < 3")
    assert cat.sql("SELECT COUNT(*) AS n FROM small_t"
                   ).collect()[0].n == 3
    spark.catalog.dropTempView("small_t")


def test_create_or_replace_table_still_dispatches(spark, cat):
    cat.sql("CREATE TABLE t2 USING txlog AS SELECT id FROM range(5)")
    cat.sql("CREATE OR REPLACE TABLE t2 USING txlog AS "
            "SELECT id FROM range(3)")
    assert cat.sql("SELECT COUNT(*) AS n FROM t2").collect()[0].n == 3


# ---------------------------------------------------------- ADVICE #2
def test_batch_read_change_feed_refused_loudly(spark, cat):
    from aws_payment_data_lake_spark.sources.txlog_stream import (
        register_txlog_feed,
    )
    cat.sql("CREATE TABLE cf USING txlog AS SELECT id FROM range(4)")
    register_txlog_feed(spark)
    with pytest.raises(Exception, match="STREAMING option"):
        (spark.read.format("txlog_feed")
         .option("path", cat.table("cf").path)
         .option("readChangeFeed", "true").load().collect())


# ---------------------------------------------------------- ADVICE #3
def test_replace_resets_copy_into_idempotence(spark, cat, tmp_path):
    land = str(tmp_path / "landing")
    spark.range(6).selectExpr("id", "id * 3 AS v") \
        .write.parquet(land)
    cat.sql("CREATE TABLE cp (id bigint, v bigint) USING txlog")
    r1 = cat.sql(f"COPY INTO cp FROM '{land}' FILEFORMAT = PARQUET")
    assert dict((r.metric, r.value) for r in r1.collect()
                )["files_loaded"] > 0
    r2 = cat.sql(f"COPY INTO cp FROM '{land}' FILEFORMAT = PARQUET")
    assert dict((r.metric, r.value) for r in r2.collect()
                )["files_loaded"] == 0      # idempotent re-run
    cat.sql("CREATE OR REPLACE TABLE cp USING txlog AS "
            "SELECT CAST(NULL AS BIGINT) AS id, "
            "CAST(NULL AS BIGINT) AS v WHERE false")
    # the replace wiped the copied rows — the same source must load
    r3 = cat.sql(f"COPY INTO cp FROM '{land}' FILEFORMAT = PARQUET")
    assert dict((r.metric, r.value) for r in r3.collect()
                )["files_loaded"] > 0
    assert cat.sql("SELECT COUNT(*) AS n FROM cp").collect()[0].n == 6


def test_replace_resets_txn_high_water(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tx"))
    t.create(spark.range(2).selectExpr("id"))
    assert t.append(spark.range(3).selectExpr("id"),
                    txn_app="job", txn_batch=7) is not None
    # re-delivery below the mark is skipped
    assert t.append(spark.range(3).selectExpr("id"),
                    txn_app="job", txn_batch=7) is None
    t.replace(spark.createDataFrame([], "id bigint"))
    # the replace commit carries both reset keys
    head = max(t._versions_on_disk())
    with open(t._commit_path(head)) as f:
        c = json.load(f)
    assert c["op"] == "replace"
    assert c.get("copy_sources_reset") is True
    assert c.get("txns_reset") is True
    assert t._replay().txns == {}
    # the same (app, batch) re-delivery lands again post-replace
    assert t.append(spark.range(3).selectExpr("id"),
                    txn_app="job", txn_batch=7) is not None
    assert t.snapshot().count() == 3


def test_independent_reader_honors_txns_reset(spark, tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "txlog_reader",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "txlog_reader.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t = TxnTable(spark, str(tmp_path / "rd"))
    t.create(spark.range(1).selectExpr("id"))
    t.append(spark.range(1).selectExpr("id"),
             txn_app="job", txn_batch=3)
    t.replace(spark.createDataFrame([], "id bigint"))
    st = mod.IndependentTxlogReader(t.path).replay()
    assert st.txns == {}


# ---------------------------------------------------------- ADVICE #4
def test_writer_commit_detects_mapping_drift(spark, cat):
    from pyspark.sql.types import LongType, StructField, StructType

    from aws_payment_data_lake_spark.sources.txlog_batch import (
        _SnapshotWriter,
        _Staged,
    )
    cat.sql("CREATE TABLE md USING txlog AS "
            "SELECT id, id AS v FROM range(4)")
    cat.sql("ALTER TABLE md RENAME COLUMN v TO w")   # mapping exists
    schema = StructType([StructField("id", LongType()),
                         StructField("w", LongType())])
    w = _SnapshotWriter({"path": cat.table("md").path}, schema,
                        overwrite=False)             # plan pins mapping
    cat.sql("ALTER TABLE md RENAME COLUMN w TO z")   # concurrent DDL
    with pytest.raises(ConcurrentWriteError, match="mapping"):
        w.commit([_Staged([])])
    # and the un-raced path still publishes
    w2 = _SnapshotWriter({"path": cat.table("md").path},
                         StructType([StructField("id", LongType()),
                                     StructField("z", LongType())]),
                         overwrite=False)
    w2.commit([_Staged([])])
