"""txlog_feed Python Data Source: the ACID table as a batch snapshot
and as a structured stream of its commit log."""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.sources.txlog import TxnTable
from aws_payment_data_lake_spark.sources.txlog_stream import (
    read_table_feed,
    stream_table_feed,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in (df.select(*cols) if cols else df)
                  .collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.create(spark.range(3).selectExpr("id", "id * 2 as v"))
    t.append(spark.range(3, 7).selectExpr("id", "id * 2 as v"))
    return t


def test_batch_feed_matches_snapshot(spark, table):
    got = read_table_feed(spark, table.path)
    assert set(got.columns) == {"id", "v", "_commit_version"}
    assert _rows(got, "id", "v") == _rows(table.snapshot())
    vers = {r["id"]: r["_commit_version"] for r in got.collect()}
    assert all(vers[i] == 0 for i in range(3))
    assert all(vers[i] == 1 for i in range(3, 7))


def test_stream_feed_full_history(spark, table, tmp_path):
    q = (stream_table_feed(spark, table.path)
         .writeStream.format("memory").queryName("feed_full")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from feed_full")
    assert _rows(got, "id", "v") == _rows(table.snapshot())


def test_stream_feed_incremental_skips_layout_ops(spark, table, tmp_path):
    """Restart from a checkpoint: only NEW commits arrive, and an
    OPTIMIZE between runs re-emits nothing."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_into_parquet():
        q = (stream_table_feed(spark, table.path)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_into_parquet()
    first = _rows(spark.read.parquet(out), "id", "v")
    assert first == _rows(table.snapshot())

    table.compact(max_files=1)                      # layout-only
    table.append(spark.range(7, 9).selectExpr("id", "id * 2 as v"))
    run_into_parquet()
    got = spark.read.parquet(out)
    # compaction re-emitted nothing; only the append arrived
    assert got.count() == len(first) + 2
    assert _rows(got, "id", "v") == sorted(first + [(7, 14), (8, 16)])
    new_vers = {r["_commit_version"] for r in got.collect()} - {0, 1}
    assert new_vers == {3}                          # the append commit


def test_stream_feed_starting_version(spark, table):
    q = (stream_table_feed(spark, table.path, starting_version=1)
         .writeStream.format("memory").queryName("feed_sv")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from feed_sv")
    assert _rows(got, "id") == [(i,) for i in range(3, 7)]


def test_changes_skip_layout_ops(spark, table):
    before = table.changes(0).count()
    table.compact(max_files=1)
    assert table.changes(0).count() == before
    table.optimize(zorder_by=["id"], n_files=1)
    assert table.changes(0).count() == before
    table.append(spark.range(20, 22).selectExpr("id", "id * 2 as v"))
    assert table.changes(0).count() == before + 2
