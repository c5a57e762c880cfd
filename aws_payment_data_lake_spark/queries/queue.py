"""Kafka-semantics queue source as a benched ingest path
(sources/queue_source.py).

Not in the <=50-query driver registry (streaming source; its contract
— Kafka schema, offset semantics, rate limiting, exactly-once into the
ACID table — is pytest-driven in tests/test_queue_source.py). This
entry benches the consumer path end-to-end: segment-planned,
Arrow-batched decode through the Python worker, the built-in from_json
deserialize, and a map-side-combinable aggregate — the per-message
cost a real broker reader would pay minus only the network hop.
"""

from __future__ import annotations

import atexit
import functools
import json
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.sources.queue_source import (
    parse_json_values,
    produce,
    read_queue,
)

_PAY_DDL = "txn_id bigint, user_id bigint, amount_cents bigint, status string"
_STATUSES = ("completed", "failed", "pending", "refunded")


@functools.lru_cache(maxsize=2)
def _produced_queue(n: int) -> str:
    """One-time producer per (process, n): the broker stand-in — data
    ARRIVAL is a broker's work, not the engine's, so the bench's
    best-of-2 records the warm-queue CONSUMER path. 4 produce calls x
    16 partitions = 64 immutable segments -> 64 read partitions."""
    tmp = tempfile.mkdtemp(prefix="queue-bench-")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    chunk = n // 4
    for c in range(4):
        produce(tmp, "pay", [
            {"key": f"u{i % 1000}",
             "value": json.dumps({
                 "txn_id": i, "user_id": i % 10_000,
                 "amount_cents": (i * 7919) % 1_000_000,
                 "status": _STATUSES[i % 4]})}
            for i in range(c * chunk, (c + 1) * chunk)],
            num_partitions=16)
    return tmp


def queue_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consume sf-proportional JSON payment messages from the file
    "broker": segment-planned queue scan -> from_json -> aggregate.
    200k messages at sf0.1, capped at 400k; per-message decode cost is
    what a real broker reader pays minus the network hop."""
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n = min(400_000, max(20_000, int(2_000_000 * sf)))
    parsed = parse_json_values(
        read_queue(spark, _produced_queue(n), "pay"), _PAY_DDL)
    out = (parsed.groupBy("status")
           .agg(F.count(F.lit(1)).alias("n_msgs"),
                F.approx_count_distinct("user_id").alias("n_users"),
                F.sum("amount_cents").alias("sum_cents"),
                F.max("offset").alias("max_offset"))
           .orderBy("status"))
    return out
