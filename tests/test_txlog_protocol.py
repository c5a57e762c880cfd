"""Protocol versioning / table features (sources/txlog.py,
TXLOG_FORMAT.md §Protocol — Delta's minReader/minWriter + table
features model): feature activation rides the first commit that uses
a feature, readers refuse tables demanding capabilities they lack,
writers refuse before publishing a byte, protocols are monotone, and
the independent spec reader enforces the same gate."""

from __future__ import annotations

import json
import os

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    ProtocolError,
    TxnTable,
)


def _mk(spark, tmp_path, name="tbl", **kw):
    return TxnTable(spark, str(tmp_path / name), **kw)


def _commit(t, v):
    with open(t._commit_path(v)) as f:
        return json.load(f)


def _publish_raw(t, commit):
    """Append a hand-built commit to the log (a 'future client')."""
    v = t.latest_version() + 1
    p = t._commit_path(v)
    with open(p + ".tmp", "w") as f:
        json.dump(commit, f)
    os.replace(p + ".tmp", p)
    return v


def test_create_carries_explicit_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(5).selectExpr("id", "id as v"))
    p = _commit(t, 0)["protocol"]
    assert p["min_reader"] == 1 and p["min_writer"] == 1
    assert p["reader_features"] == [] and p["writer_features"] == []
    d = t.describe_detail()
    assert d["min_reader_version"] == 1
    assert d["table_features"] == []


def test_feature_activates_in_the_commit_that_first_uses_it(
        spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(5).selectExpr("id", "id as v"))
    v = t.rename_column("v", "w")
    c = _commit(t, v)
    assert "column_mapping" in c["protocol"]["reader_features"]
    # idempotent: a second mapping commit does not re-emit protocol
    v2 = t.rename_column("w", "w2")
    assert "protocol" not in _commit(t, v2)
    # a later, different feature unions into the existing set
    t.append(spark.range(5, 8).selectExpr("id", "id as w2"))
    vd = t.latest_version()
    t.delete("id = 6", mode="dv")
    c3 = _commit(t, vd + 1)
    assert set(c3["protocol"]["reader_features"]) == {
        "column_mapping", "deletion_vectors"}
    assert sorted(t.describe_detail()["table_features"]) == [
        "column_mapping", "deletion_vectors"]


def test_widen_column_tags_type_widening(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(4).selectExpr("id", "cast(id as int) as v"))
    v = t.widen_column("v", "bigint")
    assert "type_widening" in _commit(t, v)["protocol"]["reader_features"]


def test_constraints_and_generated_are_writer_features(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(4).selectExpr("id", "id as v"),
             generated={"d": "v * 2"}, not_null=["v"])
    p = _commit(t, 0)["protocol"]
    assert p["reader_features"] == []      # readers need nothing
    assert set(p["writer_features"]) == {
        "check_constraints", "generated_columns"}


def test_unknown_reader_feature_refused_by_both_readers(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(5).selectExpr("id", "id as v"))
    _publish_raw(t, {
        "op": "frobnicate", "ts": 0.0, "add": [], "remove": [],
        "protocol": {"min_reader": 1, "min_writer": 1,
                     "reader_features": ["frobnication"],
                     "writer_features": ["frobnication"]}})
    with pytest.raises(ProtocolError, match="frobnication"):
        t.snapshot()
    from scripts.txlog_reader import IndependentTxlogReader
    from scripts.txlog_reader import ProtocolError as ReaderProtocolError
    with pytest.raises(ReaderProtocolError, match="frobnication"):
        IndependentTxlogReader(t.path).replay()
    # time travel BEFORE the upgrade also refuses: protocol is
    # validated against the replayed-to state, and v0..v1 predate it
    assert t.snapshot(version=0).count() == 5


def test_min_reader_above_supported_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(3).selectExpr("id", "id as v"))
    _publish_raw(t, {
        "op": "upgrade", "ts": 0.0, "add": [], "remove": [],
        "protocol": {"min_reader": 99, "min_writer": 99,
                     "reader_features": [], "writer_features": []}})
    with pytest.raises(ProtocolError, match="reader version 99"):
        t.snapshot()


def test_unknown_writer_feature_blocks_writes_not_reads(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(5).selectExpr("id", "id as v"))
    _publish_raw(t, {
        "op": "upgrade", "ts": 0.0, "add": [], "remove": [],
        "protocol": {"min_reader": 1, "min_writer": 1,
                     "reader_features": [],
                     "writer_features": ["identity_columns_v9"]}})
    assert t.snapshot().count() == 5       # reading stays fine
    with pytest.raises(ProtocolError, match="identity_columns_v9"):
        t.append(spark.range(5, 8).selectExpr("id", "id as v"))
    # the refused write published nothing and staged garbage only
    assert t.latest_version() == 1
    assert t.snapshot().count() == 5


def test_protocol_survives_restore_and_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_every=2)
    t.create(spark.range(6).selectExpr("id", "id as v"))
    t.rename_column("v", "w")              # activates column_mapping
    pre = t.latest_version()
    for i in range(3):                     # cross a checkpoint
        t.append(spark.range(10 + i, 11 + i)
                 .selectExpr("id", "id as w"))
    t.restore(version=pre)
    snap = t._replay()
    assert "column_mapping" in snap.protocol["reader_features"]
    # checkpoint-fast replay enforces the same protocol
    ck = t._read_checkpoint(t.latest_version())
    assert ck is not None
    assert "column_mapping" in ck.protocol["reader_features"]
    # fresh handle (checkpoint + tail) agrees
    t2 = _mk(spark, tmp_path, checkpoint_every=2)
    assert "column_mapping" in t2._replay().protocol["reader_features"]


def test_legacy_table_without_protocol_reads_and_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(4).selectExpr("id", "id as v"))
    # strip the protocol action: simulate a table written before
    # versioning existed (the commit file is hard-link-published, so
    # rewrite it in place)
    c = _commit(t, 0)
    del c["protocol"]
    with open(t._commit_path(0), "w") as f:
        json.dump(c, f)
    t2 = _mk(spark, tmp_path)
    assert t2.snapshot().count() == 4      # implicit v1, no features
    v = t2.append(spark.range(4, 6).selectExpr("id", "id as v"))
    # a feature-free commit on a legacy table stays legacy
    assert "protocol" not in _commit(t2, v)
    # ... until a feature first fires, which upgrades explicitly
    v2 = t2.rename_column("v", "w")
    assert _commit(t2, v2)["protocol"]["reader_features"] == [
        "column_mapping"]
