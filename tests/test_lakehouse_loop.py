"""The full lakehouse loop on the engine's own pieces: silver lands in
an ACID table -> its commit log streams via format("txlog_feed") ->
each micro-batch's mergeable KPI delta-state APPENDS to a gold ACID
table under an (app, batch) txn marker -> the report merges state at
read time. Exactly-once by construction: a replayed micro-batch's
append is skipped by the marker, and merge-on-read (sums add, HLL
sketches union) makes the report equal the batch recompute
BIT-FOR-BIT regardless of batching (plans/gold.py invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.plans.gold import (
    merchant_kpi_report,
    merchant_kpi_state,
    merchant_kpi_state_merge,
)
from aws_payment_data_lake_spark.plans.pipeline import run_pipeline
from aws_payment_data_lake_spark.sources.txlog import (
    TxnTable,
    txn_foreach_batch,
)
from aws_payment_data_lake_spark.sources.txlog_stream import (
    stream_table_feed,
)


def test_table_to_stream_to_incremental_gold(spark, tmp_path):
    base = str(tmp_path / "lake")
    res = run_pipeline(spark, base, days=3, rows_per_day=300,
                       invalid_rate=0.05, duplicate_rate=0.02, seed=11)
    silver = spark.read.parquet(res["paths"]["silver"])
    days = sorted(r[0] for r in
                  silver.select("txn_date").distinct().collect())
    slices = [silver.where(F.col("txn_date") == d) for d in days]

    silver_acid = TxnTable(spark, str(tmp_path / "silver_acid"))
    silver_acid.create(slices[0])
    gold = TxnTable(spark, str(tmp_path / "gold_state"))
    gold.create(merchant_kpi_state(slices[0].limit(0)))  # empty state
    ckpt = str(tmp_path / "ckpt")

    def fold_batch(batch_df, batch_id):
        delta = merchant_kpi_state(batch_df.drop("_commit_version"))
        # append-only delta log under a txn marker: replays skip
        txn_foreach_batch(gold, "gold-fold")(delta, batch_id)

    def drain():
        q = (stream_table_feed(spark, silver_acid.path)
             .writeStream.foreachBatch(fold_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()                                   # day 1
    silver_acid.append(slices[1])
    silver_acid.append(slices[2])
    drain()                                   # days 2+3, restart

    got = merchant_kpi_report(
        merchant_kpi_state_merge(gold.snapshot()))
    want = merchant_kpi_report(merchant_kpi_state(silver))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))

    # exactly-once: replaying an already-folded batch id is skipped by
    # the txn marker — the gold log gains no version, report unchanged
    v = gold.latest_version()
    replayed = silver_acid.snapshot().withColumn(
        "_commit_version", F.lit(0))
    fold_batch(replayed, 0)                   # batch 0 already folded
    assert gold.latest_version() == v
    again = merchant_kpi_report(merchant_kpi_state_merge(gold.snapshot()))
    assert sorted(map(tuple, again.collect())) \
        == sorted(map(tuple, want.collect()))
