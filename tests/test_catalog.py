"""Persistent lakehouse catalog (VERDICT r10 #1; sources/catalog.py).

The reference resolves every table through the Glue Data Catalog —
names persist across jobs (/root/reference/README.md:63,79-80;
src/glue_jobs/etl_transactions_bronze.py:123-125 reads
``from_catalog(database="payments_db", ...)``). These tests pin our
stand-in: registrations written through a crash-safe versioned log
(``<warehouse>/_catalog/``), a FRESH OS PROCESS resolving tables by
name with zero register() calls, rename/drop/re-register semantics,
cross-process visibility inside one live catalog, and the
concurrent-registration race (both CAS writers land)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import REPO

from aws_payment_data_lake_spark.sources.catalog import (
    CatalogLog,
    NoSuchTableError,
    TableExistsError,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


def _cat(spark, tmp_path) -> LakehouseCatalog:
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_register_is_durable_across_catalog_instances(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE t (id bigint, v string) USING txlog")
    cat.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    # a brand-new catalog object: no register() call anywhere
    cat2 = LakehouseCatalog(spark, warehouse=cat.warehouse)
    assert cat2.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 2
    assert cat2.table("t").path == cat.table("t").path


def test_fresh_os_process_resolves_by_name(spark, tmp_path):
    """The headline 'stranger runs it in production' claim: a second
    interpreter (its own SparkSession, its own module state) queries
    a table it never registered."""
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE sales USING txlog AS "
            "SELECT id, id * 10 AS amount FROM range(5)")
    probe = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("catalog-probe"), warehouse=sys.argv[2])
rows = cat.sql(
    "SELECT CAST(SUM(amount) AS BIGINT) AS s FROM sales").collect()
names = [r.tableName for r in cat.sql("SHOW TABLES").collect()]
print(json.dumps({"sum": rows[0][0], "tables": names}))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, cat.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {"sum": 100, "tables": ["sales"]}


def test_cross_process_create_visible_to_live_catalog(spark, tmp_path):
    """The crawler-keeps-it-current behavior: a table created by
    ANOTHER process appears in an already-constructed catalog without
    restarting it (head-version re-sync at each sql())."""
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE first (id bigint) USING txlog")
    assert [r.tableName for r in cat.sql("SHOW TABLES").collect()] \
        == ["first"]
    probe = r"""
import sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("catalog-probe2"), warehouse=sys.argv[2])
cat.sql("CREATE TABLE second (id bigint) USING txlog")
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, cat.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert [r.tableName for r in cat.sql("SHOW TABLES").collect()] \
        == ["first", "second"]
    assert cat.sql("SELECT COUNT(*) FROM second").collect()[0][0] == 0


def test_rename_drop_reregister_lifecycle(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE a USING txlog AS SELECT id FROM range(3)")
    cat.sql("ALTER TABLE a RENAME TO b")
    # rename is catalog metadata only: the data location is unmoved
    assert cat.sql("SELECT COUNT(*) FROM b").collect()[0][0] == 3
    with pytest.raises(KeyError):
        cat.table("a")
    cat.sql("CREATE TABLE a USING txlog AS SELECT id FROM range(7)")
    assert cat.sql("SELECT COUNT(*) FROM a").collect()[0][0] == 7
    cat.sql("DROP TABLE a")
    assert [r.tableName for r in cat.sql("SHOW TABLES").collect()] \
        == ["b"]
    # DROP removed the NAME, not the bytes: re-registering the same
    # managed location resurrects the table at its full history
    cat.register("a2", cat.table("b").path)
    assert cat.sql("SELECT COUNT(*) FROM a2").collect()[0][0] == 3
    # unregistered names pass through to the session catalog:
    # IF EXISTS is Spark's no-op, a bare DROP is Spark's error
    cat.sql("DROP TABLE IF EXISTS nope")
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        cat.sql("DROP TABLE nope")


def test_rename_collision_and_missing_raise(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE x (id bigint) USING txlog")
    cat.sql("CREATE TABLE y (id bigint) USING txlog")
    with pytest.raises(TableExistsError):
        cat.rename_table("x", "y")
    with pytest.raises(NoSuchTableError):
        cat.rename_table("ghost", "z")


def test_concurrent_registration_race_both_land(tmp_path):
    """Two OS processes racing different registrations through the
    CAS loop: both must land (the loser re-applies against the
    winner's map). Pure catalog-log test — no Spark needed."""
    wh = str(tmp_path / "wh")
    probe = r"""
import sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.sources.catalog import CatalogLog
log = CatalogLog(sys.argv[2])
name = sys.argv[3]
for i in range(20):
    entry = {"path": "/data/%s%d" % (name, i), "delete_mode": "cow"}
    log.commit("register", name + str(i),
               lambda t, k=name + str(i), e=entry: {**t, k: e})
"""
    procs = [subprocess.Popen(
        [sys.executable, "-c", probe, REPO, wh, who],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for who in ("alpha", "beta")]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-2000:]
    _, tables = CatalogLog(wh).load()
    assert {f"alpha{i}" for i in range(20)} <= set(tables)
    assert {f"beta{i}" for i in range(20)} <= set(tables)
    # and the log is gap-free: 40 commits -> versions 0..39
    assert CatalogLog(wh).head_version() == 39


def test_catalog_log_crash_safety_ignores_torn_tmp(tmp_path):
    """A crashed writer leaves only a .tmp- file; load() never sees
    it and the next commit proceeds normally."""
    wh = str(tmp_path / "wh")
    log = CatalogLog(wh)
    log.commit("register", "t",
               lambda t: {**t, "t": {"path": "/d", "delete_mode": "cow"}})
    torn = os.path.join(wh, "_catalog", ".tmp-deadbeef.json")
    with open(torn, "w") as f:
        f.write('{"tables": {"ev')    # torn mid-write
    v, tables = log.load()
    assert v == 0 and set(tables) == {"t"}
    log.commit("register", "u",
               lambda t: {**t, "u": {"path": "/e", "delete_mode": "dv"}})
    assert set(log.load()[1]) == {"t", "u"}


def test_history_records_ddl(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE h (id bigint) USING txlog")
    cat.sql("ALTER TABLE h RENAME TO h2")
    cat.sql("DROP TABLE h2")
    ops = [e["op"] for e in CatalogLog(cat.warehouse).history()]
    assert ops == ["register", "rename", "drop"]


def test_no_warehouse_stays_in_memory(spark, tmp_path):
    """Backwards compatibility: a warehouse-less catalog behaves
    exactly as before (explicit paths, session-local names)."""
    cat = LakehouseCatalog(spark)
    with pytest.raises(ValueError, match="needs a path"):
        cat.register("t")
    with pytest.raises(ValueError, match="warehouse"):
        cat.register("t", str(tmp_path / "t"), persist=True)
    cat.register("t", str(tmp_path / "t"))
    cat.sql("CREATE TABLE t (id bigint) USING txlog")
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 0
    with pytest.raises(KeyError, match="no warehouse"):
        cat.sql("CREATE TABLE unseen (id bigint) USING txlog")


def test_crawl_discovers_unregistered_tables(spark, tmp_path):
    """The reference's crawler role: data that appeared outside the
    job path (here: a TxnTable created directly at a warehouse
    location) becomes resolvable by name after crawl()."""
    from aws_payment_data_lake_spark.sources.txlog import TxnTable
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE known (id bigint) USING txlog")
    TxnTable(spark, os.path.join(cat.warehouse, "stray")).create(
        spark.range(6).selectExpr("id"))
    os.makedirs(os.path.join(cat.warehouse, "not_a_table"))
    assert cat.crawl() == ["stray"]
    assert cat.sql("SELECT COUNT(*) FROM stray").collect()[0][0] == 6
    assert cat.crawl() == []            # idempotent
    # a renamed table's old location must NOT resurrect under crawl
    cat.sql("ALTER TABLE stray RENAME TO found")
    assert cat.crawl() == []
    with pytest.raises(ValueError, match="warehouse"):
        LakehouseCatalog(spark).crawl()


def test_show_create_table_round_trips(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE t ("
            "pk bigint GENERATED ALWAYS AS IDENTITY "
            "(START WITH 5 INCREMENT BY 2), "
            "amount double NOT NULL DEFAULT 0.0, "
            "day string GENERATED ALWAYS AS "
            "(substring(cast(amount as string), 1, 1))"
            ") USING txlog PARTITIONED BY (day) "
            "TBLPROPERTIES ('owner' = 'etl')")
    cat.sql("ALTER TABLE t ADD CONSTRAINT amt_pos CHECK (amount >= 0)")
    ddl = cat.sql("SHOW CREATE TABLE t").collect()[0].createtab_stmt
    # the emitted DDL is RE-RUNNABLE: build a twin and compare specs
    for stmt in ddl.replace("TABLE t", "TABLE t2").split(";\n"):
        cat.sql(stmt)
    d1, d2 = (cat.table(n).describe_detail() for n in ("t", "t2"))
    for key in ("partition_by", "constraints", "properties",
                "defaults", "identity"):
        assert d1[key] == d2[key], key
    cat.sql("INSERT INTO t2 (amount) VALUES (3.5)")
    row = cat.sql("SELECT * FROM t2").collect()[0]
    assert (row.pk, row.amount, row.day) == (5, 3.5, "3")


def test_undrop_restores_last_registration(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE t USING txlog AS SELECT id FROM range(5)")
    path = cat.table("t").path
    cat.sql("DROP TABLE t")
    with pytest.raises(KeyError):
        cat.table("t")
    cat.sql("UNDROP TABLE t")
    assert cat.table("t").path == path
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 5
    # survives a fresh catalog (the undrop re-registered durably)
    cat2 = LakehouseCatalog(spark, warehouse=cat.warehouse)
    assert cat2.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 5
    with pytest.raises(TableExistsError, match="not dropped"):
        cat.undrop("t")
    with pytest.raises(NoSuchTableError, match="never existed"):
        cat.undrop("ghost")


def test_create_table_like(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.sql("CREATE TABLE src ("
            "pk bigint GENERATED ALWAYS AS IDENTITY "
            "(START WITH 10 INCREMENT BY 10), "
            "v double NOT NULL DEFAULT 1.5, "
            "tag string GENERATED ALWAYS AS "
            "(CASE WHEN v > 2 THEN 'hi' ELSE 'lo' END)"
            ") USING txlog TBLPROPERTIES ('team' = 'etl')")
    cat.sql("INSERT INTO src (v) VALUES (5.0), (9.0)")
    cat.sql("CREATE TABLE twin LIKE src "
            "TBLPROPERTIES ('team' = 'analytics')")
    assert cat.sql("SELECT COUNT(*) FROM twin").collect()[0][0] == 0
    d_src, d_twin = (cat.table(n).describe_detail()
                     for n in ("src", "twin"))
    assert d_twin["defaults"] == d_src["defaults"]
    assert d_twin["constraints"] == d_src["constraints"]
    assert d_twin["properties"]["team"] == "analytics"  # override
    # identity restarts from START WITH (no rows to collide with)
    cat.sql("INSERT INTO twin (v) VALUES (3.0)")
    row = cat.sql("SELECT * FROM twin").collect()[0]
    assert (row.pk, row.v, row.tag) == (10, 3.0, "hi")


def test_catalog_log_vacuum_bounds_history(spark, tmp_path):
    """Each catalog commit is a full snapshot, so old versions serve
    only history/UNDROP; vacuum prunes them without touching the
    head, and UNDROP skips pruned versions."""
    cat = _cat(spark, tmp_path)
    for i in range(8):
        cat.register(f"t{i}", f"/synth/{i}")
    cat.sql("CREATE TABLE real USING txlog AS SELECT id FROM range(3)")
    cat.sql("DROP TABLE real")
    log = CatalogLog(cat.warehouse)
    head = log.head_version()
    deleted = log.vacuum(retain_versions=3)
    assert deleted == head + 1 - 3
    assert log.head_version() == head          # head untouched
    # a fresh catalog still resolves everything (head is a snapshot)
    cat2 = LakehouseCatalog(spark, warehouse=cat.warehouse)
    assert len(cat2.sql("SHOW TABLES").collect()) == 8
    # UNDROP still works when its registration survives retention...
    cat2.sql("UNDROP TABLE real")
    assert cat2.sql("SELECT COUNT(*) FROM real").collect()[0][0] == 3
    # ...and degrades to a clean error when history is fully pruned
    cat2.sql("DROP TABLE real")
    log.vacuum(retain_versions=1)
    with pytest.raises(NoSuchTableError):
        cat2.undrop("real")
