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
    assert spark.catalog.tableExists("__lake_q__rdb__t")
    cat.sql("ALTER TABLE rdb.t RENAME TO rdb.t2")
    assert not spark.catalog.tableExists("__lake_q__rdb__t")
    assert cat.sql("SELECT COUNT(*) FROM rdb.t2"
                   ).collect()[0][0] == 4


# ---------------------------------------------- second pass (modules)
def test_undrop_restores_table_into_original_db(spark, cat):
    """2nd-pass finding 1: UNDROP under USE db must restore a
    default-db table as default.t, not db.t."""
    cat.sql("CREATE DATABASE elsewhere")
    cat.sql("CREATE TABLE orders0 USING txlog AS "
            "SELECT id FROM range(5)")
    cat.sql("DROP TABLE orders0")
    cat.sql("USE elsewhere")
    try:
        cat.sql("UNDROP TABLE default.orders0")
        assert cat.sql("SELECT COUNT(*) FROM default.orders0"
                       ).collect()[0][0] == 5
        rows = [(r.database, r.tableName) for r in
                cat.sql("SHOW TABLES").collect()]
        assert ("default", "orders0") in rows
        assert ("elsewhere", "orders0") not in rows
    finally:
        cat.sql("USE default")


def test_register_cas_refuses_clobbering_concurrent_view(spark, cat):
    """2nd-pass finding 2: a stale register() must not overwrite a
    view entry another process committed."""
    cat.sql("CREATE TABLE base USING txlog AS SELECT id FROM range(2)")
    # another process creates view 'w2' (this catalog never refreshes
    # between its local check and its CAS commit)
    log = CatalogLog(cat.warehouse)
    def put_view(tables):
        tables["w2"] = {"kind": "view", "sql": "SELECT id FROM base",
                        "ctx_db": "default"}
        return tables
    log.commit("create_view", "w2", put_view)
    with pytest.raises(TableExistsError, match="VIEW"):
        cat.register("w2", os.path.join(cat.warehouse, "w2x"))
    _, tables = log.load()
    assert tables["w2"].get("kind") == "view"   # survived


def test_writer_create_race_schema_mismatch_refused(spark, cat,
                                                    tmp_path):
    """2nd-pass finding 3: an append planned against an ABSENT table
    must not publish mismatched-schema files when another writer's
    create wins the race."""
    from pyspark.sql.types import LongType, StructField, StructType
    from aws_payment_data_lake_spark.sources.txlog import (
        ConcurrentWriteError,
    )
    from aws_payment_data_lake_spark.sources.txlog_batch import (
        _SnapshotWriter,
        _Staged,
    )
    p = str(tmp_path / "race_create")
    w = _SnapshotWriter({"path": p},
                        StructType([StructField("other", LongType())]),
                        overwrite=False)      # planned: table absent
    # another writer creates the table first, different schema
    (spark.range(3).selectExpr("id")
     .write.format("txlog").mode("append").option("path", p).save())
    with pytest.raises(ConcurrentWriteError, match="schema"):
        w.commit([_Staged([])])


def test_mangled_view_name_cannot_collide_with_table(spark, cat):
    """2nd-pass finding 4: binding db.t uses a reserved __lake_q__
    name, so a real table named db__t keeps its own rows."""
    cat.sql("CREATE DATABASE db")
    cat.sql("CREATE TABLE db.t USING txlog AS "
            "SELECT id, 'dotted' AS src FROM range(3)")
    cat.sql("CREATE TABLE db__t USING txlog AS "
            "SELECT id, 'flat' AS src FROM range(7)")
    both = cat.sql(
        "SELECT (SELECT COUNT(*) FROM db.t) AS dotted, "
        "(SELECT COUNT(*) FROM db__t) AS flat").collect()[0]
    assert (both.dotted, both.flat) == (3, 7)
    assert {r.src for r in cat.sql("SELECT src FROM db__t").collect()} \
        == {"flat"}


def test_database_and_default_table_names_exclusive(spark, cat):
    """2nd-pass finding 5: a database and a default-db table may not
    share a name (crawl would descend the table dir as a database)."""
    cat.sql("CREATE TABLE clash USING txlog AS SELECT id FROM range(2)")
    with pytest.raises(TableExistsError, match="share its name"):
        cat.sql("CREATE DATABASE clash")
    cat.sql("CREATE DATABASE zone9")
    with pytest.raises(TableExistsError, match="DATABASE"):
        cat.register("zone9", os.path.join(cat.warehouse, "zx"))


def test_view_mention_inside_string_literal_not_expanded(spark, cat):
    """2nd-pass finding 6: a statement that mentions a (broken) view
    name only inside a literal must not expand the view."""
    cat.sql("CREATE TABLE vbase USING txlog AS SELECT id FROM range(2)")
    cat.sql("CREATE VIEW fragile AS SELECT id FROM vbase")
    cat.sql("DROP TABLE vbase")        # the view is now broken
    rows = cat.sql("SELECT 'fragile' AS tag").collect()
    assert rows[0].tag == "fragile"    # never tried to expand
    with pytest.raises(Exception):     # a REAL reference still fails
        cat.sql("SELECT * FROM fragile").collect()


def test_create_into_concurrently_dropped_use_db_refused(spark, cat):
    """2nd-pass finding 7: registrations into a USE'd database that
    another process dropped are refused, not silently committed."""
    from aws_payment_data_lake_spark.sources.catalog import (
        NoSuchDatabaseError,
    )
    cat.sql("CREATE DATABASE doomed")
    cat.sql("USE doomed")
    try:
        log = CatalogLog(cat.warehouse)
        log.commit("drop_database", "doomed", None,
                   lambda dbs: {k: v for k, v in dbs.items()
                                if k != "doomed"})
        with pytest.raises(NoSuchDatabaseError, match="dropped"):
            cat.sql("CREATE TABLE t9 (id bigint) USING txlog")
    finally:
        cat._current_db = "default"


def test_api_unregister_and_rename_refuse_views(spark, cat):
    """2nd-pass finding 8: the API paths match the SQL verbs' guards."""
    cat.sql("CREATE TABLE b2 USING txlog AS SELECT id FROM range(2)")
    cat.sql("CREATE VIEW v8 AS SELECT id FROM b2")
    with pytest.raises(ValueError, match="VIEW"):
        cat.unregister("v8")
    with pytest.raises(ValueError, match="VIEW"):
        cat.rename_table("v8", "v9")
    assert cat._resolve_view("v8") == "v8"     # untouched


# ------------------------------------------- third pass (post-close)
# (the throttled-restart regression lives in tests/test_txlog_feed.py
#  beside the feature, with the epoch-replay-tolerant harness)
def test_bind_gate_is_case_insensitive(spark, cat):
    """3rd-pass finding 2: the substring gate must not defeat the
    case-insensitive time-travel / TVF patterns."""
    cat.sql("CREATE TABLE fzc USING txlog AS SELECT id FROM range(4)")
    cat.sql("DELETE FROM fzc WHERE id = 0")
    assert cat.sql("SELECT COUNT(*) AS n FROM FZC VERSION AS OF 0"
                   ).collect()[0].n == 4
    assert cat.sql("SELECT COUNT(*) AS n FROM table_history('fzc')"
                   ).collect()[0].n >= 2


def test_show_views_describe_db_fall_through(spark, cat):
    """3rd-pass finding 4: shapes/databases that are not ours pass
    through to the session catalog instead of raising."""
    # DESCRIBE DATABASE default exists in Spark's session catalog too
    # — ours answers known dbs; an unknown one delegates to spark.sql
    import pytest as _pytest
    from pyspark.errors import AnalysisException
    with _pytest.raises(AnalysisException):   # spark's error, not ours
        cat.sql("DESCRIBE DATABASE no_such_db_anywhere")
    # SHOW VIEWS IN an unknown db likewise delegates
    with _pytest.raises(AnalysisException):
        cat.sql("SHOW VIEWS IN no_such_db_anywhere")


def test_describe_database_counts_externals(spark, cat):
    import os as _os
    cat.sql("CREATE DATABASE xd")
    raw = _os.path.join(cat.warehouse, "xd", "rawz")
    spark.range(3).coalesce(1).write.parquet(raw)
    cat.register_external("xd.rawz", raw)
    d = cat.sql("DESCRIBE DATABASE xd").collect()[0]
    assert d.tables == 1


def test_alter_add_columns_nested_paren_types(spark, cat):
    """3rd-pass finding 6: DECIMAL(10,2) (nested parens) now ALTERs."""
    cat.sql("CREATE TABLE adp (id bigint) USING txlog")
    cat.sql("ALTER TABLE adp ADD COLUMNS (d DECIMAL(10,2), s string)")
    assert dict(cat.sql("SELECT * FROM adp").dtypes)["d"] \
        == "decimal(10,2)"
