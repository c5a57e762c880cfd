"""Python Data Source (sources/pydatasource.py): planning, determinism,
Arrow-boundary fidelity, and the stream==batch contract.

The registered roundtrip row (variant='pysource' in
jsonl_events_roundtrip) already hash-checks the aggregate against a
DuckDB range(n) replay via test_queries_oracle.py; these tests pin the
mechanics underneath it: full-table bit-equality with the contract,
partition planning, task-retry purity, and micro-batch replay.
"""

from __future__ import annotations

import tempfile
import time

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.sources.pydatasource import (
    SOURCE_NAME,
    read_payments,
    register_payments_source,
    synth_batches,
)

_CONTRACT_SQL = """
SELECT i AS txn_id,
       a % 10000 AS user_id,
       (a // 7) % 1000000 AS amount_cents,
       CASE b % 5 WHEN 0 THEN 'AUD' WHEN 1 THEN 'EUR' WHEN 2 THEN 'GBP'
                  WHEN 3 THEN 'JPY' ELSE 'USD' END AS currency,
       CASE c % 4 WHEN 0 THEN 'completed' WHEN 1 THEN 'failed'
                  WHEN 2 THEN 'pending' ELSE 'refunded' END AS status,
       (1704067200 + a % 31536000) * 1000000 AS ts_us
FROM (
  SELECT i,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))::BIGINT AS a,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 16, 2))::BIGINT AS b,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 18, 2))::BIGINT AS c
  FROM range(0, {n}) t(i))
ORDER BY txn_id
"""


def test_full_table_matches_duckdb_contract(spark, duck):
    """Every cell of a 3k-row read equals DuckDB's md5 replay — the
    generator, the Arrow boundary, and the type mapping are all exact."""
    got = [tuple(r) for r in
           read_payments(spark, 3_000, 4).orderBy("txn_id").collect()]
    want = [tuple(r) for r in
            duck.execute(_CONTRACT_SQL.format(n=3_000)).fetchall()]
    assert got == want


def test_partition_planning(spark):
    """numPartitions is honored (generation parallelism scales with the
    option), and a degenerate n < partitions still covers every row."""
    df = read_payments(spark, 8_000, 4)
    n_parts = (df.select(F.spark_partition_id().alias("p"))
               .distinct().count())
    assert n_parts == 4
    tiny = read_payments(spark, 3, 8)
    assert tiny.count() == 3
    assert tiny.select(F.min("txn_id"), F.max("txn_id")).first() == (0, 2)


def test_generation_is_retry_pure():
    """synth_batches is a pure function of the range: a re-executed task
    (Spark retry) regenerates bit-identical Arrow batches."""
    a = list(synth_batches(100, 5_000))
    b = list(synth_batches(100, 5_000))
    assert [x.num_rows for x in a] == [x.num_rows for x in b]
    assert all(x.equals(y) for x, y in zip(a, b))
    # ranges compose: [0,n) == [0,k) ++ [k,n) row-for-row
    import pyarrow as pa
    whole = pa.Table.from_batches(synth_batches(0, 1_000))
    split = pa.Table.from_batches(
        list(synth_batches(0, 137)) + list(synth_batches(137, 1_000)))
    assert whole.equals(split)


def test_stream_equals_batch(spark):
    """Micro-batch reader drains to exactly the batch table: offsets are
    row indexes, so the union of all micro-batches is the full range with
    no gaps or dup rows (exactly-once with an idempotent sink). hwmPath
    enables PACED multi-batch draining (without it the source returns
    the full log end in one batch — r8 pacing redesign)."""
    register_payments_source(spark)
    ckpt = tempfile.mkdtemp(prefix="pysrc_ckpt_")
    hwm = tempfile.mktemp(prefix="pysrc_hwm_")
    sdf = (spark.readStream.format(SOURCE_NAME)
           .option("n", "6000").option("rowsPerBatch", "1700")
           .option("hwmPath", hwm)
           .option("numPartitions", "3").load())
    q = (sdf.writeStream.format("memory").queryName("pysrc_stream_eq")
         .option("checkpointLocation", ckpt).start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("pysrc_stream_eq").count() >= 6000:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    streamed = spark.table("pysrc_stream_eq")
    batch = read_payments(spark, 6_000, 3)
    assert streamed.count() == 6_000
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_restart_resumes_exactly_once(spark, tmp_path):
    """Offset-resume across a checkpointed restart (VERDICT r7 #8):
    with durable pacing state (hwmPath), leg 1 drains part of the log
    in rowsPerBatch-paced micro-batches and stops; leg 2 restarts from
    the checkpoint and must emit exactly the REMAINING rows — pacing
    resumes from the persisted floor, never below the WAL (a regressed
    end would re-emit delivered rows). Sink is the built-in append
    parquet sink, whose manifest makes delivered files exactly-once."""
    import time

    register_payments_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "rows")
    hwm = str(tmp_path / "hwm.json")

    def start():
        sdf = (spark.readStream.format(SOURCE_NAME)
               .option("n", "6000").option("rowsPerBatch", "1500")
               .option("numPartitions", "3")
               .option("hwmPath", hwm).load())
        return (sdf.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt).start())

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:   # leg 1: at least one paced batch
        try:
            if spark.read.parquet(out).count() >= 1500:
                break
        except Exception:
            pass
        time.sleep(0.5)
    q.stop()
    n1 = spark.read.parquet(out).count()
    assert 1500 <= n1 < 6000 and n1 % 1500 == 0

    q = start()                     # leg 2: resume from the floor
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.read.parquet(out).count() >= 6000:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 6000             # no loss ...
    assert got.select("txn_id").distinct().count() == 6000  # ... no dupes
    batch = read_payments(spark, 6_000, 3)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
