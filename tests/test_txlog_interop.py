"""Second-reader interop proof of sources/TXLOG_FORMAT.md (VERDICT r8
#6): scripts/txlog_reader.py replays the log with pyarrow + DuckDB
only — zero imports from sources/txlog.py — and must hash-match
TxnTable.snapshot() across a lifecycle covering appends, MERGE, DVs,
checkpoint, restore, column rename/drop, and reorg. Red = the writer
or the spec drifted."""

from __future__ import annotations

import datetime as dt
import sys

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.sources.txlog import TxnTable
from tests.conftest import REPO

if REPO + "/scripts" not in sys.path:
    sys.path.insert(0, REPO + "/scripts")

from txlog_reader import IndependentTxlogReader  # noqa: E402


def _norm(v):
    """Canonical cell: DuckDB hands tz-aware datetimes for UTC-adjusted
    parquet timestamps, Spark hands session-UTC naive — same instant."""
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, float):
        return repr(v)          # exact: both sides read the same bytes
    return v


def _spark_rows(t, version=None):
    df = t.snapshot(version)
    return (df.columns,
            sorted(tuple(_norm(x) for x in r) for r in df.collect()))


def _indep_rows(reader, t, version=None, use_checkpoint=True):
    st = reader.replay(version, use_checkpoint=use_checkpoint)
    cols = [n for n, _ in st.fields]
    rows = sorted(tuple(_norm(x) for x in r)
                  for r in reader.snapshot_rows(
                      version, use_checkpoint=use_checkpoint))
    return cols, rows


def _assert_version_parity(t, reader, versions):
    for v in versions:
        sc, sr = _spark_rows(t, v)
        ic, ir = _indep_rows(reader, t, v)
        assert ic == sc, f"v{v}: columns {ic} != {sc}"
        assert ir == sr, f"v{v}: rows diverge ({len(ir)} vs {len(sr)})"
        assert reader.count_rows(v) == len(sr), f"v{v}: metadata count"


def test_independent_reader_full_lifecycle(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "interop"), checkpoint_every=4)
    ts = F.expr("timestamp'2024-03-01 10:00:00' + make_interval(0,0,0,0,0,0,id)")
    t.create(spark.range(40).select(
        "id", (F.col("id") * 2.5).alias("amount"),
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string"))
        .alias("user"), ts.alias("ts")))                       # v0
    t.append(spark.range(40, 60).select(
        "id", (F.col("id") * 2.5).alias("amount"),
        F.lit("u9").alias("user"), ts.alias("ts")),
        txn_app="ing", txn_batch=1)                            # v1
    t.merge(spark.range(55, 70).select(
        "id", F.lit(0.0).alias("amount"),
        F.lit("mg").alias("user"), ts.alias("ts")),
        on=["id"])                                             # v2
    t.delete("id % 9 = 2", mode="dv")                          # v3
    t.update({"amount": "amount + 1"}, "id < 3", mode="dv")    # v4 (+ckpt)
    t.rename_column("user", "account")                         # v5
    t.append(spark.range(70, 80).select(
        "id", F.lit(1.0).alias("amount"),
        F.lit("nw").alias("account"), ts.alias("ts")))         # v6
    t.drop_column("amount")                                    # v7
    t.add_columns({"amount": "double"})                        # v8 (+ckpt)
    t.materialize_dvs()                                        # v9 reorg
    t.restore(version=3)                                       # v10
    t.compact(max_files=2)                                     # v11

    reader = IndependentTxlogReader(t.path)
    versions = t._versions_on_disk()
    assert versions == list(range(12))
    _assert_version_parity(t, reader, versions)
    # the replayed STATE agrees, not just the rows
    st = reader.replay()
    snap = t._replay()
    assert st.column_mapping == snap.column_mapping
    assert st.dropped_physical == snap.dropped_physical
    assert sorted(st.live) == sorted(snap.live)
    assert st.dv_dead == snap.dv_dead
    assert st.txns == snap.txns


def test_independent_reader_checkpoint_equals_full_replay(spark,
                                                          tmp_path):
    """The checkpoint fast path and the raw JSON replay must agree —
    and a CORRUPT checkpoint must fall back, not fail."""
    t = TxnTable(spark, str(tmp_path / "ckpt"), checkpoint_every=3)
    t.create(spark.range(10).selectExpr("id", "id * 1.0 AS v"))
    for k in range(5):
        t.append(spark.range(10 * (k + 1), 10 * (k + 2))
                 .selectExpr("id", "id * 1.0 AS v"))
    t.delete("id % 10 = 1", mode="dv")
    reader = IndependentTxlogReader(t.path)
    fast = _indep_rows(reader, t, use_checkpoint=True)
    slow = _indep_rows(reader, t, use_checkpoint=False)
    assert fast == slow
    assert fast == _spark_rows(t)
    # corrupt the checkpoint pointer: fall back to full replay
    import os
    with open(os.path.join(t.path, "_txlog", "_last_checkpoint"),
              "w") as f:
        f.write("{not json")
    assert _indep_rows(reader, t) == slow


def test_independent_reader_on_converted_table(spark, tmp_path):
    """CONVERT TO TXLOG adoption (v0 referencing files outside data/)
    replays identically in the independent reader, through follow-on
    DML."""
    root = str(tmp_path / "legacy")
    (spark.range(30).selectExpr("id", "id * 1.5 AS v")
     .repartition(3).write.parquet(root))
    t = TxnTable(spark, root).convert_from_parquet()
    t.delete("id % 3 = 0", mode="dv")
    t.append(spark.range(30, 40).selectExpr("id", "id * 1.5 AS v"))
    reader = IndependentTxlogReader(t.path)
    for v in t._versions_on_disk():
        assert _indep_rows(reader, t, v) == _spark_rows(t, v), v
        assert reader.count_rows(v) == t.snapshot(v).count()
