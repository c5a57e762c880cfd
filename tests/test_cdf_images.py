"""CDF update images (VERDICT r10 #5): with
``txlog.enableChangeDataFeed = true`` (Delta's table property), DML
commits carry WRITE-SIDE change-image files — ``update_preimage`` /
``update_postimage`` pairs, ``delete`` pre-images, and exact
``insert`` rows — and ``changes()`` / ``table_changes(...)`` emit
them instead of the add/dv derivation, so a downstream CDC consumer
can tell an update from delete+insert and sees no rewrite
amplification. With the property off (default), behavior is
byte-identical to round 10 (no cdc files, legacy derivation)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.sources.txlog import TxnTable
from aws_payment_data_lake_spark.sources.txsql import LakehouseCatalog


def _mk(spark, tmp_path, cdf=True, rows=10):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(rows).selectExpr(
        "id", "cast(id * 10 as double) AS amount"))
    if cdf:
        t.set_properties({"txlog.enableChangeDataFeed": "true"})
    return t


def _events(t, since=0):
    return [(r.id, r.amount, r._change_type, r._commit_version)
            for r in t.changes(since, include_deletes=True)
            .orderBy("_commit_version", "_change_type", "id")
            .collect()]


def test_cow_update_emits_image_pairs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.latest_version()
    t.update({"amount": "amount + 1"}, "id >= 8")
    ev = _events(t, since=v0)
    assert ev == [(8, 81.0, "update_postimage", v0 + 1),
                  (9, 91.0, "update_postimage", v0 + 1),
                  (8, 80.0, "update_preimage", v0 + 1),
                  (9, 90.0, "update_preimage", v0 + 1)]
    # plain mode (no _change_type): ONLY the post-images — the
    # surviving rewritten rows no longer amplify into the feed
    plain = t.changes(v0).collect()
    assert sorted((r.id, r.amount) for r in plain) \
        == [(8, 81.0), (9, 91.0)]


def test_dv_update_emits_image_pairs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.latest_version()
    t.update({"amount": "0.0"}, "id = 3", mode="dv")
    ev = _events(t, since=v0)
    assert ev == [(3, 0.0, "update_postimage", v0 + 1),
                  (3, 30.0, "update_preimage", v0 + 1)]


def test_cow_delete_emits_preimages_under_cdf(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.latest_version()
    t.delete("id < 2")
    ev = _events(t, since=v0)
    assert ev == [(0, 0.0, "delete", v0 + 1),
                  (1, 10.0, "delete", v0 + 1)]
    assert t.changes(v0).count() == 0    # plain mode: nothing added


def test_merge_fast_path_classifies_images(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=5)
    v0 = t.latest_version()
    src = spark.createDataFrame(
        [(3, 999.0, False), (4, 888.0, True), (100, 1.0, False),
         (200, 2.0, True)],
        "id long, amount double, _del boolean")
    t.merge(src, on=["id"], delete_when="_del",
            helper_cols=("_del",))
    ev = _events(t, since=v0)
    assert ev == [(4, 40.0, "delete", v0 + 1),
                  (100, 1.0, "insert", v0 + 1),
                  (3, 999.0, "update_postimage", v0 + 1),
                  (3, 30.0, "update_preimage", v0 + 1)]
    # flagged-but-unmatched (200) inserted nothing — and the table
    # agrees with the feed
    assert t.snapshot().where("id = 200").count() == 0


def test_merge_clauses_classifies_images(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=6)
    v0 = t.latest_version()
    src = spark.createDataFrame(
        [(1, 111.0), (2, 222.0), (50, 500.0)],
        "id long, amount double")
    t.merge_clauses(
        src, on=["id"],
        matched=[{"cond": "s.amount > 200", "action": "delete"},
                 {"cond": None, "action": "update",
                  "set": {"amount": "s.amount + t.amount"}}],
        not_matched=[{"cond": None, "action": "insert_star"}],
        talias="t", salias="s")
    ev = _events(t, since=v0)
    assert ev == [(2, 20.0, "delete", v0 + 1),
                  (50, 500.0, "insert", v0 + 1),
                  (1, 121.0, "update_postimage", v0 + 1),
                  (1, 10.0, "update_preimage", v0 + 1)]


def test_cdf_off_is_byte_identical_to_legacy(spark, tmp_path):
    t = _mk(spark, tmp_path, cdf=False)
    v0 = t.latest_version()
    t.update({"amount": "amount + 1"}, "id >= 8")
    with open(t._commit_path(v0 + 1)) as f:
        assert "cdc" not in json.load(f)
    # legacy derivation: the rewrite re-emits every surviving row of
    # the touched file as 'insert' (documented amplification)
    ev = t.changes(v0, include_deletes=True)
    assert ev.where("_change_type = 'update_postimage'").count() == 0
    assert ev.where("_change_type = 'insert'").count() > 0


def test_cdc_apply_round_trip_consumes_images(spark, tmp_path):
    """A replica built ONLY from the change feed's images equals the
    source table — the downstream-consumer contract the images exist
    for (an update must not look like delete+insert)."""
    t = _mk(spark, tmp_path, rows=8)
    replica = TxnTable(spark, str(tmp_path / "replica"))
    replica.create(t.snapshot())
    v0 = t.latest_version()
    t.update({"amount": "amount * 2"}, "id IN (1, 2)")
    t.delete("id = 5")
    t.merge(spark.createDataFrame([(7, 7000.0), (300, 3.0)],
                                  "id long, amount double"), on=["id"])
    feed = (t.changes(v0, include_deletes=True)
            .localCheckpoint(eager=True))
    # latest event per key decides (images make this well-defined:
    # update_postimage upserts, delete deletes, preimages are audit)
    latest = feed.where(F.col("_change_type")
                        .isin("insert", "update_postimage", "delete"))
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(
        F.desc("_commit_version"),
        # within one commit a key appears once in this filtered set
        F.desc("_change_type"))
    batch = (latest.withColumn("__rn", F.row_number().over(w))
             .where("__rn = 1").drop("__rn"))
    replica.merge(
        batch.select("id", "amount",
                     (F.col("_change_type") == "delete").alias("_d")),
        on=["id"], delete_when="_d", helper_cols=("_d",))
    got = sorted(tuple(r) for r in replica.snapshot().collect())
    want = sorted(tuple(r) for r in t.snapshot().collect())
    assert got == want


def test_vacuum_retention_governs_cdc_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.update({"amount": "amount + 1"}, "id = 0")       # v2: cdc
    with open(t._commit_path(t.latest_version())) as f:
        cdc = json.load(f)["cdc"]["files"]
    assert all(os.path.exists(os.path.join(t.path, f)) for f in cdc)
    for i in range(4):                                 # push v2 out
        t.append(spark.range(1).selectExpr(
            "id + 1000 as id", "cast(0 as double) as amount"))
    t.vacuum(retain_versions=2, orphan_grace_s=0.0)
    assert not any(os.path.exists(os.path.join(t.path, f))
                   for f in cdc)                       # reaped
    # within-retention cdc files survive a vacuum
    t.update({"amount": "amount + 1"}, "id = 1")
    with open(t._commit_path(t.latest_version())) as f:
        cdc2 = json.load(f)["cdc"]["files"]
    t.vacuum(retain_versions=2, orphan_grace_s=0.0)
    assert all(os.path.exists(os.path.join(t.path, f)) for f in cdc2)


def test_sql_table_changes_surfaces_images(spark, tmp_path):
    cat = LakehouseCatalog(spark, warehouse=str(tmp_path / "wh"))
    cat.sql("CREATE TABLE t USING txlog TBLPROPERTIES "
            "('txlog.enableChangeDataFeed' = 'true') AS "
            "SELECT id, CAST(id AS DOUBLE) AS v FROM range(4)")
    cat.sql("UPDATE t SET v = v + 0.5 WHERE id = 2")
    got = cat.sql(
        "SELECT id, v, _change_type FROM table_changes('t', 1, 1, "
        "true) ORDER BY _change_type").collect()
    assert [(r.id, r.v, r._change_type) for r in got] \
        == [(2, 2.5, "update_postimage"), (2, 2.0, "update_preimage")]


def test_streaming_read_change_feed(spark, tmp_path):
    """Delta's streaming CDF: format('txlog_feed') with
    readChangeFeed=true streams _change_type-tagged rows — cdc-image
    commits verbatim, DV deletes as derived pre-images, plain appends
    as inserts."""
    from aws_payment_data_lake_spark.sources.txlog_stream import (
        stream_table_feed,
    )
    t = _mk(spark, tmp_path, rows=6)
    t.update({"amount": "amount + 1"}, "id = 2")        # cdc images
    t.delete("id = 4", mode="dv")                       # dv pre-image
    t.append(spark.createDataFrame([(100, 1.0)],
                                   "id long, amount double"))
    q = (stream_table_feed(spark, t.path, read_change_feed=True)
         .writeStream.format("memory").queryName("cdf_feed")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cdf_feed").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append((r.id, r.amount))
    assert sorted(by_type["insert"]) \
        == sorted([(i, i * 10.0) for i in range(6)] + [(100, 1.0)])
    assert by_type["update_preimage"] == [(2, 20.0)]
    assert by_type["update_postimage"] == [(2, 21.0)]
    assert by_type["delete"] == [(4, 40.0)]
    # plain mode over the same log: no _change_type column, and the
    # update contributes ONLY its post-image (no amplification)
    q2 = (stream_table_feed(spark, t.path)
          .writeStream.format("memory").queryName("plain_feed")
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    plain = spark.sql("SELECT * FROM plain_feed").collect()
    assert "_change_type" not in plain[0].asDict()
    assert sorted((r.id, r.amount) for r in plain) \
        == sorted([(i, i * 10.0) for i in range(6)]
                  + [(2, 21.0), (100, 1.0)])
