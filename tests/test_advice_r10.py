"""Regression tests for the round-10 ADVICE items (ADVICE.md):

1. (medium) int-typed identity columns: create() accepted `pk int`
   but _assign_identity hard-cast to long, so the first append hit
   the strict schema check — the accepted DDL shape bricked writes.
2. (low) SHALLOW CLONE now inherits TBLPROPERTIES (Delta parity):
   txlog.appendOnly survives the fork.
3. (low) _maybe_autocompact is best-effort: a post-commit compaction
   failure can never make a committed append look failed.
4. (low) autoCompact converges on partitioned tables: when every
   partition holds one permanently-small file it stops triggering
   (no unbounded write amplification).
5. (low) COPY INTO requires an existing target table (Delta posture)
   instead of implicitly creating version 0 with an inferred schema.
"""

from __future__ import annotations

import os
from unittest import mock

import pytest

from aws_payment_data_lake_spark.sources.txlog import (
    AppendOnlyError,
    TxnTable,
)


def test_int_identity_table_appends(spark, tmp_path):
    # ADVICE #1 (medium): int identity must allocate int values
    t = TxnTable(spark, str(tmp_path / "int_id"))
    t.create(spark.createDataFrame([], "pk int, v long"),
             identity={"pk": {"start": 1, "step": 1}})
    t.append(spark.range(5).selectExpr("id as v"))
    out = t.snapshot()
    assert dict(out.dtypes)["pk"] == "int"
    assert sorted(r.pk for r in out.collect()) == [1, 2, 3, 4, 5]
    t.append(spark.range(3).selectExpr("id as v"))
    assert len(set(r.pk for r in t.snapshot().collect())) == 8


def test_int_identity_overflow_rejected_loudly(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "int_hi"))
    t.create(spark.createDataFrame([], "pk int, v long"),
             identity={"pk": {"start": 2**31 - 2, "step": 1}})
    with pytest.raises(ValueError, match="overflows int32"):
        t.append(spark.range(5).selectExpr("id as v"))


def test_clone_inherits_tblproperties(spark, tmp_path):
    # ADVICE #2: appendOnly (and friends) travel with the clone
    src = TxnTable(spark, str(tmp_path / "src"))
    src.create(spark.range(4).selectExpr("id", "id * 2 as v"))
    src.set_properties({"txlog.appendOnly": "true",
                        "txlog.checkpointInterval": "7"})
    dst = TxnTable(spark, str(tmp_path / "dst")).clone_shallow(src)
    got = dst.describe_detail()["properties"]
    assert got["txlog.appendOnly"] == "true"
    assert got["txlog.checkpointInterval"] == "7"
    with pytest.raises(AppendOnlyError):
        dst.delete("id = 1")
    # and the contract is droppable independently of the source
    dst.unset_properties(["txlog.appendOnly"])
    dst.delete("id = 1")
    assert src.describe_detail()["properties"][
        "txlog.appendOnly"] == "true"


def test_autocompact_failure_never_fails_a_committed_append(
        spark, tmp_path):
    # ADVICE #3: post-commit policy work is best-effort
    t = TxnTable(spark, str(tmp_path / "ac_fail"))
    t.create(spark.range(2).selectExpr("id as v"))
    t.set_properties({"txlog.autoCompact": "true",
                      "txlog.autoCompact.minFiles": "1",
                      "txlog.autoCompact.smallFileRows": "1000"})
    with mock.patch.object(
            TxnTable, "compact",
            side_effect=RuntimeError("stage failure")):
        v = t.append(spark.range(3).selectExpr("id as v"))
    assert v is not None
    assert t.snapshot().count() == 5   # the append IS committed


def test_autocompact_size_tiered_amplification_bound(
        spark, tmp_path):
    # ADVICE #4: a permanently-small corpus must not be rewritten on
    # every trigger — the size-tiered guard only merges when the
    # small set is >= 2x its largest member
    t = TxnTable(spark, str(tmp_path / "ac_tier"))
    t.create(
        spark.range(24).selectExpr(
            "id", "cast(id % 6 as string) as p"),
        partition_by=["p"], partition_files=6)
    t.set_properties({"txlog.autoCompact": "true",
                      "txlog.autoCompact.minFiles": "2",
                      "txlog.autoCompact.smallFileRows": "1000"})
    # six 4-row files: 24 >= 2*4 -> the first qualifying append
    # triggers a merge down to one file
    t.append(spark.range(24, 25).selectExpr(
        "id", "cast(id % 6 as string) as p"))
    snap = t._replay()
    assert len(snap.live) == 1
    merged = next(iter(snap.live))
    # one tiny newcomer: 25 + 1 < 2*25 -> NO re-merge of the big
    # file (this is exactly the unbounded-amplification loop the
    # guard exists to break)
    t.append(spark.range(25, 26).selectExpr(
        "id", "cast(id % 6 as string) as p"))
    snap2 = t._replay()
    assert merged in snap2.live         # untouched
    assert len(snap2.live) == 2
    # newcomers accumulate; once their mass doubles the largest
    # member the merge fires again — O(log N) rewrites per byte
    for lo in range(26, 52, 5):
        t.append(spark.range(lo, lo + 5).selectExpr(
            "id", "cast(id % 6 as string) as p"))
    assert len(t._replay().live) < 7    # converged, not one-per-append
    assert t.snapshot().count() == 56   # and no rows lost


def test_copy_into_requires_existing_table(spark, tmp_path):
    # ADVICE #5: Delta posture — no implicit create
    land = tmp_path / "landing"
    os.makedirs(land)
    spark.range(3).toPandas().to_parquet(str(land / "a.parquet"))
    t = TxnTable(spark, str(tmp_path / "never_created"))
    with pytest.raises(FileNotFoundError, match="CREATE TABLE"):
        t.copy_into(str(land))
    assert not t.exists()               # and nothing was created
