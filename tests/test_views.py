"""Persistent views in the catalog log (VERDICT r11 #2).

The reference's declared analytics layer is Athena views over silver
(/root/reference/README.md:88-89). Pins: CREATE [OR REPLACE] VIEW /
DROP VIEW stored as SQL text (`kind: view` entries), read-time
expansion against current snapshots (a view is never stale), views
over views, time travel inside view bodies, cross-OS-process
resolution, SHOW CREATE TABLE emitting view DDL, name-collision
guards against tables, and qualified (db.view) names.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from aws_payment_data_lake_spark.sources.catalog import (
    TableExistsError,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    c.sql("CREATE TABLE pay USING txlog AS "
          "SELECT id, id % 3 AS grp, id * 10 AS amount FROM range(30)")
    return c


def test_view_reads_current_snapshot(cat):
    cat.sql("CREATE VIEW big AS "
            "SELECT * FROM pay WHERE amount >= 200")
    assert cat.sql("SELECT COUNT(*) AS n FROM big").collect()[0].n == 10
    # a view is NEVER stale: post-create DML shows through
    cat.sql("DELETE FROM pay WHERE id >= 25")
    assert cat.sql("SELECT COUNT(*) AS n FROM big").collect()[0].n == 5


def test_view_survives_fresh_os_process(cat):
    cat.sql("CREATE VIEW grp_total AS "
            "SELECT grp, CAST(SUM(amount) AS BIGINT) AS total "
            "FROM pay GROUP BY grp")
    probe = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("view-probe"), warehouse=sys.argv[2])
rows = cat.sql("SELECT * FROM grp_total ORDER BY grp").collect()
ddl = cat.sql("SHOW CREATE TABLE grp_total").collect()[0].createtab_stmt
print(json.dumps({"rows": [[r.grp, r.total] for r in rows],
                  "is_view_ddl": ddl.startswith("CREATE VIEW")}))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, cat.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["is_view_ddl"] is True
    assert got["rows"] == [[0, 1350], [1, 1450], [2, 1550]]


def test_view_over_view_and_time_travel_under_it(cat):
    cat.sql("DELETE FROM pay WHERE id >= 20")      # version 1
    cat.sql("CREATE VIEW v0 AS "
            "SELECT * FROM pay VERSION AS OF 0")   # pinned body
    cat.sql("CREATE VIEW v0_small AS SELECT id FROM v0 WHERE id < 3")
    assert cat.sql("SELECT COUNT(*) AS n FROM v0").collect()[0].n == 30
    assert cat.sql("SELECT COUNT(*) AS n FROM v0_small"
                   ).collect()[0].n == 3


def test_create_or_replace_and_drop(cat):
    cat.sql("CREATE VIEW w AS SELECT id FROM pay")
    with pytest.raises(TableExistsError):
        cat.sql("CREATE VIEW w AS SELECT grp FROM pay")
    cat.sql("CREATE OR REPLACE VIEW w AS SELECT grp FROM pay")
    assert cat.sql("SELECT * FROM w").columns == ["grp"]
    r = cat.sql("DROP VIEW w").collect()
    assert dict((x.metric, x.value) for x in r)["dropped"] == 1
    cat.sql("DROP VIEW IF EXISTS w")               # idempotent
    # name free again — as a TABLE this time
    cat.sql("CREATE TABLE w (id bigint) USING txlog")


def test_view_table_name_collisions_guarded(cat):
    cat.sql("CREATE VIEW col AS SELECT id FROM pay")
    with pytest.raises(TableExistsError, match="VIEW"):
        cat.sql("CREATE TABLE col USING txlog AS SELECT 1 AS x")
    with pytest.raises(TableExistsError):
        cat.sql("CREATE VIEW pay AS SELECT 1 AS x")
    # DROP VIEW on a table refuses; DML on a view refuses clearly
    with pytest.raises(Exception, match="TABLE"):
        cat.sql("DROP VIEW pay")
    with pytest.raises(KeyError, match="VIEW"):
        cat.table("col")


def test_broken_view_fails_its_author_not_readers(cat):
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW broken AS SELECT no_such_col FROM pay")
    assert cat.sql("SHOW TABLES").where("deleteMode = 'view'"
                                        ).count() == 0


def test_qualified_view_in_database(cat):
    cat.sql("CREATE DATABASE analytics")
    cat.sql("CREATE VIEW analytics.top AS "
            "SELECT id FROM pay WHERE amount >= 250")
    assert cat.sql("SELECT COUNT(*) AS n FROM analytics.top"
                   ).collect()[0].n == 5
    rows = [(r.database, r.tableName, r.deleteMode) for r in
            cat.sql("SHOW TABLES IN analytics").collect()]
    assert rows == [("analytics", "top", "view")]
    cat.sql("USE analytics")
    try:
        assert cat.sql("SELECT COUNT(*) AS n FROM top"
                       ).collect()[0].n == 5
    finally:
        cat.sql("USE default")


def test_temp_view_forms_stay_session_statements(cat, spark):
    cat.sql("CREATE OR REPLACE TEMP VIEW tv AS SELECT 1 AS one")
    assert cat.sql("SELECT * FROM tv").collect()[0].one == 1
    # not persisted: no catalog entry
    assert cat.sql("SHOW TABLES").where("deleteMode = 'view'"
                                        ).count() == 0
    spark.catalog.dropTempView("tv")


def test_cyclic_views_fail_loudly(cat, tmp_path):
    # a cycle can only be formed by writing entries directly (the
    # analyzer blocks self-reference at CREATE time) — simulate a
    # crawler bug and pin the loud failure
    cat.sql("CREATE VIEW a AS SELECT id FROM pay")
    log = cat._log
    def mut(tables):
        tables["a"] = {"kind": "view", "sql": "SELECT id FROM b"}
        tables["b"] = {"kind": "view", "sql": "SELECT id FROM a"}
        return tables
    log.commit("corrupt", "a", mut)
    cat._seen_version = -2
    with pytest.raises(ValueError, match="depth"):
        cat.sql("SELECT * FROM a")
