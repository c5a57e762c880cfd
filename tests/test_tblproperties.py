"""TBLPROPERTIES (sources/txlog.py set_properties/unset_properties,
TXLOG_FORMAT.md §Commit record `properties`): the property map
round-trips log + checkpoint, `txlog.appendOnly` blocks every
row-modifying op while append-shaped and layout-only ops stay open
(and activates the append_only writer feature), unknown engine keys
are rejected at SET time, `txlog.checkpointInterval` drives the
writer's cadence, and the SQL surface (SET/UNSET/SHOW) binds it."""

from __future__ import annotations

import json
import os

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    AppendOnlyError,
    TxnTable,
)
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


def _mk(spark, tmp_path, name="tbl", **kw):
    t = TxnTable(spark, str(tmp_path / name), **kw)
    t.create(spark.range(10).selectExpr("id", "id * 2 as v"))
    return t


def test_properties_roundtrip_log_and_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_every=1)
    t.set_properties({"owner": "data-eng", "pii": "false"})
    t.set_properties({"pii": "true"})          # merge, not replace-all
    assert t.describe_detail()["properties"] == {
        "owner": "data-eng", "pii": "true"}
    t.unset_properties(["owner", "never-set"])  # unknown key: no-op
    assert t.describe_detail()["properties"] == {"pii": "true"}
    # fresh handle replays from the checkpoint (every commit wrote one)
    t2 = TxnTable(spark, t.path, checkpoint_every=1)
    assert t2._read_checkpoint(t2.latest_version()) is not None
    assert t2.describe_detail()["properties"] == {"pii": "true"}


def test_unknown_engine_property_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown engine property"):
        t.set_properties({"txlog.appendOnIy": "true"})   # the typo
    with pytest.raises(ValueError, match="true|false"):
        t.set_properties({"txlog.appendOnly": "yes"})
    with pytest.raises(ValueError, match="positive"):
        t.set_properties({"txlog.checkpointInterval": "0"})


def test_append_only_blocks_mutation_allows_append(spark, tmp_path):
    t = _mk(spark, tmp_path)
    pre = t.latest_version()
    v = t.set_properties({"txlog.appendOnly": "true"})
    with open(t._commit_path(v)) as f:
        c = json.load(f)
    assert "append_only" in c["protocol"]["writer_features"]
    for blocked in (
            lambda: t.delete("id = 1"),
            lambda: t.delete("id = 1", mode="dv"),
            lambda: t.update({"v": "v + 1"}, "id = 1"),
            lambda: t.update({"v": "v + 1"}, "id = 1", mode="dv"),
            lambda: t.merge(spark.range(2).selectExpr(
                "id", "id as v"), on=["id"]),
            lambda: t.merge_clauses(
                spark.range(2).selectExpr("id", "id as v"), on=["id"],
                matched=[{"action": "delete"}]),
            lambda: t.overwrite(spark.range(3).selectExpr(
                "id", "id as v")),
            lambda: t.restore(version=pre)):
        with pytest.raises(AppendOnlyError):
            blocked()
    assert t.snapshot().count() == 10           # nothing moved
    # append-shaped and layout-only ops stay open
    t.append(spark.range(10, 13).selectExpr("id", "id * 2 as v"))
    t.compact(max_files=1)
    t.optimize(["id"])
    assert t.snapshot().count() == 13
    # UNSET restores mutability
    t.unset_properties(["txlog.appendOnly"])
    assert t.delete("id >= 10")["rows_changed"] == 3


def test_checkpoint_interval_property_drives_cadence(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_every=1000)
    t.set_properties({"txlog.checkpointInterval": "2"})
    for i in range(4):
        t.append(spark.range(100 + i, 101 + i)
                 .selectExpr("id", "id as v"))
    vs = [int(n.split(".")[0]) for n in os.listdir(t._log)
          if n.endswith(".checkpoint.parquet")]
    assert vs and max(vs) >= 4
    # a FRESH handle learns the cadence from the table, not the ctor
    t2 = TxnTable(spark, t.path, checkpoint_every=1000)
    t2.append(spark.range(990, 991).selectExpr("id", "id as v"))
    t2.append(spark.range(991, 992).selectExpr("id", "id as v"))
    vs2 = [int(n.split(".")[0]) for n in os.listdir(t._log)
           if n.endswith(".checkpoint.parquet")]
    assert max(vs2) > max(vs)


def test_sql_tblproperties_surface(spark, tmp_path):
    lake = LakehouseCatalog(spark)
    lake.register("pay", str(tmp_path / "pay"))
    lake.sql("CREATE TABLE pay USING txlog AS "
             "SELECT id, id * 2 AS v FROM range(8)")
    lake.sql("ALTER TABLE pay SET TBLPROPERTIES "
             "('txlog.appendOnly' = 'true', 'owner' = 'risk-team')")
    got = {r.key: r.value for r in
           lake.sql("SHOW TBLPROPERTIES pay").collect()}
    assert got == {"txlog.appendOnly": "true", "owner": "risk-team"}
    with pytest.raises(AppendOnlyError):
        lake.sql("DELETE FROM pay WHERE id = 1")
    lake.sql("INSERT INTO pay SELECT id, id * 2 AS v FROM range(8, 9)")
    assert lake.sql("SELECT COUNT(*) FROM pay").collect()[0][0] == 9
    lake.sql("ALTER TABLE pay UNSET TBLPROPERTIES ('txlog.appendOnly')")
    lake.sql("DELETE FROM pay WHERE id = 1")
    assert lake.sql("SELECT COUNT(*) FROM pay").collect()[0][0] == 8


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    """VACUUM ... DRY RUN: same candidate selection as the real
    sweep, zero filesystem mutation — then the real run deletes
    exactly what the dry run named."""
    t = TxnTable(spark, str(tmp_path / "vac"))
    t.create(spark.range(6).selectExpr("id", "id as v"))
    t.overwrite(spark.range(3).selectExpr("id", "id as v"))
    dry = t.vacuum(retain_versions=1, orphan_grace_s=0.0, dry_run=True)
    assert dry["dry_run"] is True and dry["data_files_deleted"] >= 1
    assert all(c.startswith("data" + os.sep) for c in dry["candidates"])
    assert t.snapshot(version=0).count() == 6    # nothing deleted yet
    real = t.vacuum(retain_versions=1, orphan_grace_s=0.0)
    assert real["data_files_deleted"] == dry["data_files_deleted"]
    # SQL surface
    lake = LakehouseCatalog(spark)
    lake.register("vac2", str(tmp_path / "vac2"))
    lake.sql("CREATE TABLE vac2 USING txlog AS SELECT id FROM range(4)")
    lake.sql("INSERT OVERWRITE vac2 SELECT id FROM range(2)")
    got = {r["metric"]: r["value"] for r in lake.sql(
        "VACUUM vac2 RETAIN 1 VERSIONS DRY RUN").collect()}
    assert got["dry_run"] == 1 and got["data_files_deleted"] >= 1
    assert lake.sql("SELECT COUNT(*) FROM vac2 VERSION AS OF 1"
                    ).collect()[0][0] == 2
