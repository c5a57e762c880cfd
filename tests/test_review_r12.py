"""Regressions for the round-12 self-review findings (code-review
pass over the round diff): view defining-database context, drop_view
CAS kind guard, crawl vs externally-registered paths, UNDROP of
externals, MERGE qualified-source alias, CREATE-over-external error
quality, and RENAME's stale-view drop ordering.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from aws_payment_data_lake_spark.sources.catalog import (
    CatalogLog,
    TableExistsError,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))


def test_view_expands_in_defining_db_context(spark, cat):
    """Finding 1: a view whose body holds a BARE default-db reference
    must resolve it the author's way even when the reader sits in a
    different USE database — and must never serve a stale snapshot."""
    cat.sql("CREATE TABLE pay USING txlog AS "
            "SELECT id, id * 10 AS amount FROM range(10)")
    cat.sql("CREATE DATABASE analytics")
    cat.sql("CREATE VIEW analytics.top AS "
            "SELECT id FROM pay WHERE amount >= 50")
    cat.sql("USE analytics")
    try:
        assert cat.sql("SELECT COUNT(*) AS n FROM analytics.top"
                       ).collect()[0].n == 5
        # freshness under USE: DML through the DEFAULT-db name shows
        cat.sql("DELETE FROM default.pay WHERE id >= 8")
        assert cat.sql("SELECT COUNT(*) AS n FROM analytics.top"
                       ).collect()[0].n == 3
    finally:
        cat.sql("USE default")


def test_view_ctx_survives_fresh_process_under_use(spark, cat):
    cat.sql("CREATE TABLE pay USING txlog AS "
            "SELECT id FROM range(6)")
    cat.sql("CREATE DATABASE a2")
    cat.sql("CREATE VIEW a2.v AS SELECT id FROM pay WHERE id < 4")
    probe = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
from aws_payment_data_lake_spark.session import get_spark
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog
cat = LakehouseCatalog(get_spark("ctx-probe"), warehouse=sys.argv[2])
cat.sql("USE a2")                       # reader context != author's
n = cat.sql("SELECT COUNT(*) FROM v").collect()[0][0]
print(json.dumps({"n": n}))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe, REPO, cat.warehouse],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1]) == {"n": 4}


def test_drop_view_refuses_concurrently_recreated_table(spark, cat):
    """Finding 2: a stale catalog's DROP VIEW must not unregister a
    TABLE another process re-created under the name."""
    cat.sql("CREATE TABLE src USING txlog AS SELECT id FROM range(3)")
    cat.sql("CREATE VIEW vv AS SELECT id FROM src")
    assert cat._resolve_view("vv") == "vv"     # cached as a view
    # another process: drop the view, re-create the name as a TABLE
    log = CatalogLog(cat.warehouse)
    def swap(tables):
        tables["vv"] = {"path": os.path.join(cat.warehouse, "vv_t"),
                        "delete_mode": "cow"}
        return tables
    log.commit("swap", "vv", swap)
    with pytest.raises(TableExistsError, match="TABLE"):
        cat.drop_view("vv")        # stale local view of 'vv'
    _, tables = log.load()
    assert "vv" in tables and tables["vv"].get("kind") != "view"


def test_crawl_skips_path_registered_as_external_elsewhere(spark,
                                                           cat):
    """Finding 3: a raw zone already registered under ANOTHER name
    must not duplicate-register under its directory name."""
    raw = os.path.join(cat.warehouse, "raw_zone")
    spark.range(5).coalesce(1).write.parquet(raw)
    cat.register_external("payments_raw", raw)
    assert cat.crawl() == []
    names = {r.tableName for r in cat.sql("SHOW TABLES").collect()}
    assert "payments_raw" in names and "raw_zone" not in names


def test_undrop_restores_external_with_format_and_schema(spark, cat):
    """Finding 4: UNDROP of a dropped external must restore it as an
    EXTERNAL (format + schema + options), not a broken txlog entry."""
    land = os.path.join(cat.warehouse, "csvland")
    os.makedirs(land)
    with open(os.path.join(land, "x.csv"), "w") as f:
        f.write("id,name\n7,zeta\n")
    cat.register_external("landing", land, fmt="csv",
                          schema="id bigint, name string")
    cat.sql("DROP TABLE landing")
    cat.sql("UNDROP TABLE landing")
    rows = cat.sql("SELECT * FROM landing").collect()
    assert [(r.id, r.name) for r in rows] == [(7, "zeta")]
    modes = {r.tableName: r.deleteMode
             for r in cat.sql("SHOW TABLES").collect()}
    assert modes["landing"] == "external-csv"
    # and UNDROP refuses while the external still resolves
    with pytest.raises(TableExistsError):
        cat.sql("UNDROP TABLE landing")


def test_merge_using_qualified_source_default_alias(spark, cat):
    """Finding 5: MERGE USING db.src without an alias gets the bare
    table part as its usable alias, like the target does."""
    cat.sql("CREATE DATABASE staging")
    cat.sql("CREATE TABLE tgt USING txlog AS "
            "SELECT id, 0 AS v FROM range(3)")
    cat.sql("CREATE TABLE staging.src USING txlog AS "
            "SELECT id, 9 AS v FROM range(1, 3)")
    cat.sql("MERGE INTO tgt USING staging.src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    assert {(r.id, r.v) for r in cat.sql("SELECT * FROM tgt"
                                         ).collect()} \
        == {(0, 0), (1, 9), (2, 9)}


def test_create_over_external_raises_guided_error(spark, cat):
    """Finding 6: CTAS targeting a crawled external raises the
    CONVERT pointer, not a bare KeyError."""
    raw = os.path.join(cat.warehouse, "zone2")
    spark.range(4).coalesce(1).write.parquet(raw)
    cat.crawl()
    with pytest.raises(KeyError, match="CONVERT TO TXLOG"):
        cat.sql("CREATE TABLE zone2 USING txlog AS SELECT 1 AS x")


def test_rename_drops_stale_qualified_snapshot_view(spark, cat):
    """Finding 7: RENAME must drop the MANGLED stale snapshot view of
    a qualified name (resolution happens before the rename)."""
    cat.sql("CREATE DATABASE rdb")
    cat.sql("CREATE TABLE rdb.t USING txlog AS "
            "SELECT id FROM range(4)")
    # a real scan (NOT the metadata-only COUNT(*) shape, which never
    # binds a view) pins the mangled snapshot view rdb__t
    cat.sql("SELECT SUM(id) AS s FROM rdb.t").collect()
    assert spark.catalog.tableExists("rdb__t")
    cat.sql("ALTER TABLE rdb.t RENAME TO rdb.t2")
    assert not spark.catalog.tableExists("rdb__t")
    assert cat.sql("SELECT COUNT(*) FROM rdb.t2"
                   ).collect()[0][0] == 4
