"""txlog.autoCompact (sources/txlog.py _maybe_autocompact,
TXLOG_FORMAT.md §properties): Spark-side append-shaped writes bin
accumulated small files through the ordinary layout-only compact
commit — the small-file answer for micro-batch ingest. Pins the
trigger thresholds, content invariance, big-file exemption,
appendOnly compatibility, foreachBatch streaming composition, and
the change-feed invisibility of the auto commits."""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    TxnTable,
    txn_foreach_batch,
)


def _mk(spark, tmp_path, name="tbl", props=None):
    t = TxnTable(spark, str(tmp_path / name))
    t.create(spark.createDataFrame([], "id long, v long"))
    t.set_properties({"txlog.autoCompact": "true",
                      "txlog.autoCompact.minFiles": "4",
                      "txlog.autoCompact.smallFileRows": "1000",
                      **(props or {})})
    return t


def test_small_appends_collapse_big_files_exempt(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # one BIG file (>= smallFileRows): never an auto-compact input
    t.append(spark.range(5000).selectExpr("id", "id as v")
             .coalesce(1))
    for i in range(4):
        t.append(spark.range(10000 + i * 10, 10000 + i * 10 + 10)
                 .selectExpr("id", "id as v").coalesce(1))
    # the empty create file (0 rows) counts as small, so minFiles=4
    # fires after the THIRD small append (empty + A + B + C -> one
    # merged output); D then sits below the threshold: 2 small files
    snap = t._replay()
    small = [a for a in snap.live.values() if a.rows < 1000]
    assert len(small) == 2               # merged(30) + D(10)
    assert len(snap.live) == 3           # + the untouched big file
    assert any(h["op"] == "compact" for h in t.history())
    assert t.snapshot().count() == 5040  # content invariant
    # the auto commit is layout-only: the change feed skips it
    feed_ops = {h["op"] for h in t.history()}
    assert "compact" in feed_ops
    changes = t.changes(0)
    assert changes.count() == 5040       # inserts only, no re-emits


def test_disabled_or_below_threshold_leaves_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "off"))
    t.create(spark.createDataFrame([], "id long, v long"))
    for i in range(5):
        t.append(spark.range(i * 10, i * 10 + 10)
                 .selectExpr("id", "id as v").coalesce(1))
    # property off: grows freely (5 appends + the empty create file)
    assert len(t._replay().live) == 6
    t2 = _mk(spark, tmp_path, "under")
    for i in range(2):                   # empty + 2 = 3 < minFiles=4
        t2.append(spark.range(i * 10, i * 10 + 10)
                  .selectExpr("id", "id as v").coalesce(1))
    assert len(t2._replay().live) == 3


def test_append_only_table_still_autocompacts(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"txlog.appendOnly": "true"})
    for i in range(4):
        t.append(spark.range(i * 10, i * 10 + 10)
                 .selectExpr("id", "id as v").coalesce(1))
    # trigger fired (empty + 3 smalls), leaving merged + the 4th —
    # the point: compaction stays LEGAL under appendOnly (layout-only)
    assert len(t._replay().live) == 2
    assert any(h["op"] == "compact" for h in t.history())
    assert t.snapshot().count() == 40


def test_streaming_foreachbatch_triggers_autocompact(spark, tmp_path):
    (spark.range(40).selectExpr("id", "id as v")
     .coalesce(4).write.json(str(tmp_path / "in")))
    t = _mk(spark, tmp_path, "sunk")
    sdf = (spark.readStream.schema("id long, v long")
           .option("maxFilesPerTrigger", "1")
           .json(str(tmp_path / "in")))
    q = (sdf.writeStream
         .foreachBatch(txn_foreach_batch(t, "ac"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    snap = t._replay()
    assert t.snapshot().count() == 40
    assert len(snap.live) < 4            # micro-batch files got binned
    assert any(h["op"] == "compact" for h in t.history())


def test_property_validation(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "v"))
    t.create(spark.createDataFrame([], "id long, v long"))
    with pytest.raises(ValueError, match="true|false"):
        t.set_properties({"txlog.autoCompact": "on"})
    with pytest.raises(ValueError, match="positive int"):
        t.set_properties({"txlog.autoCompact.minFiles": "0"})
    with pytest.raises(ValueError, match="unknown engine property"):
        t.set_properties({"txlog.autoCompact.smalFileRows": "9"})
