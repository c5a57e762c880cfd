"""Database namespaces in the persistent catalog (VERDICT r11 #1).

The reference addresses every table as database+name —
``create_dynamic_frame.from_catalog(database="payments_db",
table_name=...)`` (/root/reference/src/glue_jobs/
etl_transactions_bronze.py:123-125) — and its medallion zones map
naturally onto databases (/root/reference/README.md:48-54). This
module pins: CREATE/DROP DATABASE + SHOW DATABASES/SHOW TABLES IN,
qualified db.table resolution through every verb family, USE-scoped
unqualified names, default-db back-compat (bare keys ARE `default`),
fresh-OS-process qualified resolution with zero register() calls,
UNDROP and crawl() per-database, and the qualified read-binding's
quote-awareness.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from aws_payment_data_lake_spark.sources.catalog import (
    DatabaseNotEmptyError,
    NoSuchDatabaseError,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_create_show_drop_database(cat):
    assert cat.databases() == ["default"]
    cat.sql("CREATE DATABASE payments_db")
    assert [r.namespace for r in cat.sql("SHOW DATABASES").collect()] \
        == ["default", "payments_db"]
    # IF NOT EXISTS is a no-op, a bare re-create raises
    cat.sql("CREATE DATABASE IF NOT EXISTS payments_db")
    with pytest.raises(Exception, match="exists"):
        cat.sql("CREATE DATABASE payments_db")
    cat.sql("DROP DATABASE payments_db")
    assert cat.databases() == ["default"]
    cat.sql("DROP DATABASE IF EXISTS payments_db")   # idempotent
    with pytest.raises(NoSuchDatabaseError):
        cat.sql("DROP DATABASE payments_db")


def test_qualified_lifecycle_through_every_verb(cat):
    cat.sql("CREATE DATABASE payments_db")
    cat.sql("CREATE TABLE payments_db.silver USING txlog AS "
            "SELECT id, id * 10 AS amount FROM range(10)")
    # reads: bare qualified, aggregate, metadata-only COUNT(*)
    assert cat.sql("SELECT COUNT(*) FROM payments_db.silver"
                   ).collect()[0][0] == 10
    assert cat.sql(
        "SELECT CAST(SUM(amount) AS BIGINT) AS s "
        "FROM payments_db.silver").collect()[0].s == 450
    # DML: INSERT / UPDATE / DELETE / MERGE
    cat.sql("INSERT INTO payments_db.silver VALUES (100, 1000)")
    cat.sql("UPDATE payments_db.silver SET amount = amount + 1 "
            "WHERE id = 100")
    cat.sql("DELETE FROM payments_db.silver WHERE id >= 8 AND id < 100")
    cat.sql("MERGE INTO payments_db.silver AS t USING "
            "(SELECT 0 AS id, 7 AS amount) AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    rows = {r.id: r.amount for r in
            cat.sql("SELECT * FROM payments_db.silver").collect()}
    assert rows[100] == 1001 and rows[0] == 7 and 8 not in rows
    # time travel + TVFs on a qualified name
    assert cat.sql("SELECT COUNT(*) AS n FROM payments_db.silver "
                   "VERSION AS OF 0").collect()[0].n == 10
    assert cat.sql("SELECT COUNT(*) AS n FROM "
                   "table_history('payments_db.silver')"
                   ).collect()[0].n >= 4
    # utility verbs
    cat.sql("DESCRIBE DETAIL payments_db.silver")
    cat.sql("SHOW TBLPROPERTIES payments_db.silver")
    ddl = cat.sql("SHOW CREATE TABLE payments_db.silver"
                  ).collect()[0].createtab_stmt
    assert "payments_db.silver" in ddl
    cat.sql("OPTIMIZE payments_db.silver")
    cat.sql("VACUUM payments_db.silver RETAIN 100 VERSIONS DRY RUN")
    # ALTER on a qualified name
    cat.sql("ALTER TABLE payments_db.silver ADD COLUMNS (note string)")
    assert "note" in cat.sql(
        "SELECT * FROM payments_db.silver").columns


def test_default_db_spellings_are_equivalent(cat):
    cat.sql("CREATE TABLE t USING txlog AS SELECT id FROM range(4)")
    # default.t and t are the SAME key
    assert cat.sql("SELECT COUNT(*) FROM default.t").collect()[0][0] == 4
    cat.sql("INSERT INTO default.t VALUES (99)")
    assert cat.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 5
    assert cat.table("default.t") is cat.table("t")


def test_use_scopes_unqualified_names(cat):
    cat.sql("CREATE DATABASE bronze")
    cat.sql("CREATE TABLE bronze.events USING txlog AS "
            "SELECT id FROM range(3)")
    cat.sql("CREATE TABLE events USING txlog AS "
            "SELECT id FROM range(7)")          # default-db twin
    cat.sql("USE bronze")
    try:
        # unqualified resolves in the USE'd database (strict)
        assert cat.sql("SELECT COUNT(*) FROM events"
                       ).collect()[0][0] == 3
        # the default-db twin stays reachable by qualification
        assert cat.sql("SELECT COUNT(*) FROM default.events"
                       ).collect()[0][0] == 7
        # creation lands in the current database
        cat.sql("CREATE TABLE staged USING txlog AS "
                "SELECT id FROM range(2)")
        names = [(r.database, r.tableName) for r in
                 cat.sql("SHOW TABLES IN bronze").collect()]
        assert ("bronze", "staged") in names
    finally:
        cat.sql("USE default")
    assert cat.sql("SELECT COUNT(*) FROM events").collect()[0][0] == 7


def test_show_tables_in_db_filters(cat):
    cat.sql("CREATE DATABASE zone_a")
    cat.sql("CREATE TABLE zone_a.x (id bigint) USING txlog")
    cat.sql("CREATE TABLE y (id bigint) USING txlog")
    all_rows = [(r.database, r.tableName)
                for r in cat.sql("SHOW TABLES").collect()]
    assert ("zone_a", "x") in all_rows and ("default", "y") in all_rows
    in_a = [(r.database, r.tableName)
            for r in cat.sql("SHOW TABLES IN zone_a").collect()]
    assert in_a == [("zone_a", "x")]
    with pytest.raises(NoSuchDatabaseError):
        cat.sql("SHOW TABLES IN nope")


def test_create_into_missing_database_refused(cat):
    with pytest.raises(NoSuchDatabaseError):
        cat.sql("CREATE TABLE nodb.t (id bigint) USING txlog")


def test_drop_database_refuses_nonempty_without_cascade(cat):
    cat.sql("CREATE DATABASE busy")
    cat.sql("CREATE TABLE busy.t (id bigint) USING txlog")
    with pytest.raises(DatabaseNotEmptyError):
        cat.sql("DROP DATABASE busy")
    r = cat.sql("DROP DATABASE busy CASCADE").collect()
    assert dict((x.metric, x.value) for x in r)["tables_dropped"] == 1
    assert cat.databases() == ["default"]
    # CASCADE unregisters names only — the data survives for UNDROP-
    # style recovery via re-registration
    assert cat.sql("SHOW TABLES").count() == 0


def test_undrop_restores_qualified_table(cat):
    cat.sql("CREATE DATABASE pay")
    cat.sql("CREATE TABLE pay.gold USING txlog AS "
            "SELECT id FROM range(6)")
    cat.sql("DROP TABLE pay.gold")
    assert cat.sql("SHOW TABLES IN pay").count() == 0
    cat.sql("UNDROP TABLE pay.gold")
    assert cat.sql("SELECT COUNT(*) FROM pay.gold").collect()[0][0] == 6


def test_rename_across_databases(cat):
    cat.sql("CREATE DATABASE a")
    cat.sql("CREATE DATABASE b")
    cat.sql("CREATE TABLE a.t USING txlog AS SELECT id FROM range(5)")
    cat.sql("ALTER TABLE a.t RENAME TO b.t2")
    assert cat.sql("SELECT COUNT(*) FROM b.t2").collect()[0][0] == 5
    assert cat.sql("SHOW TABLES IN a").count() == 0


def test_fresh_os_process_resolves_qualified_name(spark, cat):
    """VERDICT r11 #1 done-criterion: a second interpreter resolves
    payments_db.silver with ZERO register() calls."""
    cat.sql("CREATE DATABASE payments_db")
    cat.sql("CREATE TABLE payments_db.silver USING txlog AS "
            "SELECT id, id * 10 AS amount FROM range(5)")
    probe = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("ns-probe"), warehouse=sys.argv[2])
rows = cat.sql("SELECT CAST(SUM(amount) AS BIGINT) AS s "
               "FROM payments_db.silver").collect()
cat.sql("USE payments_db")
n = cat.sql("SELECT COUNT(*) FROM silver").collect()[0][0]
dbs = [r.namespace for r in cat.sql("SHOW DATABASES").collect()]
print(json.dumps({"sum": rows[0][0], "n": n, "dbs": dbs}))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, cat.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {"sum": 100, "n": 5,
                   "dbs": ["default", "payments_db"]}


def test_crawl_discovers_per_database_tables(spark, cat, tmp_path):
    """A txlog table that appeared INSIDE a database directory
    (warehouse/db/t) crawls in as db.t; top-level stays default."""
    from aws_payment_data_lake_spark.sources.txlog import TxnTable
    cat.sql("CREATE DATABASE zones")
    wh = cat.warehouse
    TxnTable(spark, os.path.join(wh, "zones", "arrived")).create(
        spark.range(3).selectExpr("id"))
    TxnTable(spark, os.path.join(wh, "loose")).create(
        spark.range(2).selectExpr("id"))
    found = cat.crawl()
    assert sorted(found) == ["loose", "zones.arrived"]
    assert cat.sql("SELECT COUNT(*) FROM zones.arrived"
                   ).collect()[0][0] == 3
    assert cat.sql("SELECT COUNT(*) FROM loose").collect()[0][0] == 2


def test_qualified_binding_is_quote_aware(cat):
    cat.sql("CREATE DATABASE q")
    cat.sql("CREATE TABLE q.t USING txlog AS "
            "SELECT id, 'q.t' AS tag FROM range(3)")
    rows = cat.sql("SELECT tag FROM q.t WHERE tag = 'q.t'").collect()
    assert len(rows) == 3 and rows[0].tag == "q.t"


def test_merge_into_qualified_uses_table_part_alias(cat):
    cat.sql("CREATE DATABASE m")
    cat.sql("CREATE TABLE m.t USING txlog AS "
            "SELECT id, 0 AS v FROM range(3)")
    # no explicit alias: the bare table part is the usable alias
    cat.sql("MERGE INTO m.t USING (SELECT 1 AS id, 9 AS v) AS s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    assert {(r.id, r.v) for r in
            cat.sql("SELECT * FROM m.t").collect()} \
        == {(0, 0), (1, 9), (2, 0)}


def test_managed_location_nests_under_database_dir(cat):
    cat.sql("CREATE DATABASE locdb")
    cat.sql("CREATE TABLE locdb.t (id bigint) USING txlog")
    path = cat.table("locdb.t").path
    assert path == os.path.join(cat.warehouse, "locdb", "t")


def test_show_views_and_describe_database(cat):
    cat.sql("CREATE DATABASE rep")
    cat.sql("CREATE TABLE rep.t1 (id bigint) USING txlog")
    cat.sql("CREATE TABLE loose (id bigint) USING txlog")
    cat.sql("CREATE VIEW rep.v1 AS SELECT id FROM rep.t1")
    cat.sql("CREATE VIEW vtop AS SELECT id FROM loose")
    allv = [(r.database, r.tableName)
            for r in cat.sql("SHOW VIEWS").collect()]
    assert set(allv) == {("rep", "v1"), ("default", "vtop")}
    inrep = [(r.database, r.tableName)
             for r in cat.sql("SHOW VIEWS IN rep").collect()]
    assert inrep == [("rep", "v1")]
    d = cat.sql("DESCRIBE DATABASE rep").collect()[0]
    assert (d.namespace, d.tables, d.views) == ("rep", 1, 1)
    assert d.location.endswith("/rep")
    ddef = cat.sql("DESCRIBE DATABASE default").collect()[0]
    assert (ddef.tables, ddef.views) == (1, 1)
    import pytest as _pytest
    from pyspark.errors import AnalysisException
    # an unknown database DELEGATES to the session catalog (3rd
    # review pass), whose error this is
    with _pytest.raises(AnalysisException):
        cat.sql("DESCRIBE DATABASE nope")


def test_stream_table_by_qualified_name(spark, cat, tmp_path):
    """cat.stream_table('db.t'): table-as-a-stream addressed by
    catalog name (Delta's readStream.table, the Glue way)."""
    cat.sql("CREATE DATABASE live")
    cat.sql("CREATE TABLE live.ev USING txlog AS "
            "SELECT id FROM range(5)")
    q = (cat.stream_table("live.ev")
         .writeStream.format("memory").queryName("ns_stream")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT id FROM ns_stream ORDER BY id").collect()
    assert [r.id for r in got] == [0, 1, 2, 3, 4]
    # a VIEW refuses with the guided error
    cat.sql("CREATE VIEW live.vv AS SELECT id FROM live.ev")
    import pytest as _pytest
    with _pytest.raises(KeyError, match="VIEW"):
        cat.stream_table("live.vv")
