"""Right-to-be-forgotten delete (sources/maintenance.forget_rows):
rows erased, surgical partition rewrites, untouched files untouched,
replay no-op, all-deleted-partition removal."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest


def _file_state(zone: str) -> dict[str, tuple[int, float]]:
    return {p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(zone, "*", "*.parquet"))}


@pytest.fixture()
def zone(spark, tmp_path):
    """4-day zone; user 7 appears on days 1 and 3 only; day 4 holds
    ONLY user 9 (the all-deleted-partition case)."""
    rows = []
    for day, users in [("2026-01-01", [7, 1, 2]), ("2026-01-02", [3, 4]),
                       ("2026-01-03", [7, 7, 5]), ("2026-01-04", [9])]:
        rows += [(u, day, float(10 * u)) for u in users]
    df = spark.createDataFrame(rows, "user_id long, d string, v double")
    out = str(tmp_path / "zone")
    df.write.partitionBy("d").parquet(out)
    return out


def test_forget_rows_surgical(spark, zone):
    from aws_payment_data_lake_spark.sources.maintenance import forget_rows

    before = _file_state(zone)
    res = forget_rows(spark, zone, "user_id", [7], "d")
    assert res == {"partitions_rewritten": 2, "rows_deleted": 3,
                   "rows_kept_in_rewritten": 3}
    back = spark.read.parquet(zone)
    assert back.where(F.col("user_id") == 7).count() == 0
    # every non-target row survives with its values (the partition
    # column reads back type-inferred as DATE — stringify to compare)
    assert sorted((r["user_id"], str(r["d"]), r["v"])
                  for r in back.collect()) \
        == [(1, "2026-01-01", 10.0), (2, "2026-01-01", 20.0),
            (3, "2026-01-02", 30.0), (4, "2026-01-02", 40.0),
            (5, "2026-01-03", 50.0), (9, "2026-01-04", 90.0)]
    # untouched partitions' files were never rewritten (same inode state)
    after = _file_state(zone)
    untouched = [p for p in before
                 if "/d=2026-01-02/" in p or "/d=2026-01-04/" in p]
    assert untouched
    for p in untouched:
        assert after[p] == before[p], p


def test_forget_replay_is_noop(spark, zone):
    from aws_payment_data_lake_spark.sources.maintenance import forget_rows

    forget_rows(spark, zone, "user_id", [7], "d")
    state = _file_state(zone)
    res = forget_rows(spark, zone, "user_id", [7], "d")
    assert res == {"partitions_rewritten": 0, "rows_deleted": 0,
                   "rows_kept_in_rewritten": 0}
    assert _file_state(zone) == state


def test_forget_removes_fully_matching_partition(spark, zone):
    """A partition whose rows ALL match must not survive as a stale
    directory (dynamic overwrite alone would never touch it)."""
    from aws_payment_data_lake_spark.sources.maintenance import forget_rows

    res = forget_rows(spark, zone, "user_id", [9], "d")
    assert res["partitions_rewritten"] == 1
    assert res["rows_deleted"] == 1
    assert res["rows_kept_in_rewritten"] == 0
    assert not os.path.isdir(os.path.join(zone, "d=2026-01-04"))
    back = spark.read.parquet(zone)
    assert back.where(F.col("user_id") == 9).count() == 0
    assert back.count() == 8  # everything else intact (9 rows - 1)


def test_expire_partitions(spark, zone):
    """TTL sweep drops exactly the below-cutoff partition dirs, touches
    no data otherwise, and replays as a no-op."""
    from aws_payment_data_lake_spark.sources.maintenance import (
        expire_partitions,
    )

    before = _file_state(zone)
    res = expire_partitions(spark, zone, "d", "2026-01-03")
    assert res == {"partitions_dropped": 2}
    assert not os.path.isdir(os.path.join(zone, "d=2026-01-01"))
    assert not os.path.isdir(os.path.join(zone, "d=2026-01-02"))
    back = spark.read.parquet(zone)
    assert {str(r["d"]) for r in back.select("d").distinct().collect()} \
        == {"2026-01-03", "2026-01-04"}
    after = _file_state(zone)
    survivors = [p for p in before
                 if "/d=2026-01-03/" in p or "/d=2026-01-04/" in p]
    assert survivors and all(after[p] == before[p] for p in survivors)
    assert expire_partitions(spark, zone, "d", "2026-01-03") \
        == {"partitions_dropped": 0}

def test_forget_keeps_null_key_rows(spark, tmp_path):
    """NULL match_col rows must SURVIVE the rewrite and not count as
    deleted: isin() is NULL (not False) for NULL keys, and ~NULL is
    NULL, so an un-coalesced predicate silently drops them from every
    rewritten partition — unaudited data loss in an erasure tool."""
    from aws_payment_data_lake_spark.sources.maintenance import forget_rows

    rows = [(7, "2026-01-01", 70.0), (None, "2026-01-01", 1.0),
            (2, "2026-01-01", 20.0), (None, "2026-01-02", 2.0),
            (3, "2026-01-02", 30.0)]
    df = spark.createDataFrame(rows, "user_id long, d string, v double")
    out = str(tmp_path / "zone_null")
    df.write.partitionBy("d").parquet(out)

    res = forget_rows(spark, out, "user_id", [7], "d")
    # only day 1 holds user 7; its NULL row is kept, not deleted
    assert res == {"partitions_rewritten": 1, "rows_deleted": 1,
                   "rows_kept_in_rewritten": 2}
    back = spark.read.parquet(out)
    assert back.where(F.col("user_id").isNull()).count() == 2
    assert back.count() == 4
