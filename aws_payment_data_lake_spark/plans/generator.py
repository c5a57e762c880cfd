"""Distributed, deterministic synthetic payments generator.

Re-expresses the reference's single-process CSV generator
(src/data_generator/generate_transaction_data.py:143-164 per-day loop,
:86-108 weighted domains, :111-140 invalid-row injection) as a Spark-native
plan over ``spark.range`` — so generating 100 TB of test input is one
distributed job, not a driver loop.

Determinism without ``random``: every stochastic choice is derived from
``xxhash64(seed, tag, row_id)``. Same seed => byte-identical output at any
parallelism (F.rand() would NOT give that — its draw depends on partition
layout). Each row's draws use independent tags, mirroring the reference's
per-field ``random.*`` calls.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.plans import schemas as S

_U64_BUCKETS = 1_000_000  # resolution of the uniform draws


def _h(tag: str, seed: int):
    """Deterministic per-row hash in [0, _U64_BUCKETS)."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), F.col("row_id")),
                  F.lit(_U64_BUCKETS))


def _u(tag: str, seed: int):
    """Deterministic per-row uniform double in [0, 1)."""
    return _h(tag, seed) / float(_U64_BUCKETS)


def _weighted_choice(tag: str, seed: int, values: list[str], weights: list[int]):
    """Weighted categorical via threshold scan (reference: random.choices,
    generate_transaction_data.py:102-106)."""
    total = sum(weights)
    draw = F.pmod(_h(tag, seed), F.lit(total))
    acc = 0
    expr = None
    for v, w in zip(values, weights):
        acc += w
        cond = draw < acc
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(values[-1])


def generate_transactions(spark: SparkSession, *, days: int = 3,
                          rows_per_day: int = 1000, start_date: str = "2024-01-01",
                          invalid_rate: float = 0.01, duplicate_rate: float = 0.0,
                          seed: int = 42) -> DataFrame:
    """Build the raw transactions DataFrame (all string columns, CSV-shaped).

    Matches the reference's distributions: 3-tier amount mixture 85/13/2
    (generate_transaction_data.py:86-94), weighted statuses (:97-108),
    uniform merchants/users/currencies/countries (:48,98-101,107), one
    corruption mode per invalid row (:111-140).

    ``duplicate_rate`` goes beyond the reference: uuid4 never collides, so
    dedup fixtures need injected duplicates (FIXTURES.md A.1) — duplicated
    rows share txn_id but carry a later txn_ts ("latest wins" must pick them).
    """
    n = days * rows_per_day
    df = spark.range(0, n, 1).withColumnRenamed("id", "row_id")

    day_idx = (F.col("row_id") / rows_per_day).cast("long")
    base_date = F.to_date(F.lit(start_date))
    txn_date = F.date_add(base_date, day_idx.cast("int"))
    sec_of_day = F.pmod(F.xxhash64(F.lit(seed), F.lit("ts"), F.col("row_id")),
                        F.lit(86400))
    txn_ts = F.timestamp_seconds(
        F.unix_timestamp(txn_date.cast("timestamp")) + sec_of_day)

    # txn_id: uuid4-shaped, deterministic (md5 of seed+row, 8-4-4-4-12).
    hx = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("row_id").cast("string")))
    txn_id = F.concat_ws(
        "-", hx.substr(1, 8), hx.substr(9, 4), hx.substr(13, 4),
        hx.substr(17, 4), hx.substr(21, 12))

    # amount: 85% U(1,80), 13% U(80,400), 2% U(400,2000), 2-dp string.
    tier = F.pmod(_h("amt_tier", seed), F.lit(100))
    u_amt = _u("amt_val", seed)
    amount = (
        F.when(tier < 85, 1.0 + u_amt * (80.0 - 1.0))
        .when(tier < 98, 80.0 + u_amt * (400.0 - 80.0))
        .otherwise(400.0 + u_amt * (2000.0 - 400.0))
    )
    amount_str = F.format_number(F.round(amount, 2), 2)
    amount_str = F.regexp_replace(amount_str, ",", "")  # no thousands sep

    merchant = F.format_string("m_%04d", F.pmod(_h("merchant", seed), F.lit(50)) + 1)
    user = F.format_string("u_%06d", F.pmod(_h("user", seed), F.lit(5000)) + 1)
    currency = _weighted_choice("currency", seed, S.CURRENCIES, [1] * len(S.CURRENCIES))
    status = _weighted_choice("status", seed, S.STATUSES, S.STATUS_WEIGHTS)
    country = _weighted_choice("country", seed, S.COUNTRIES, [1] * len(S.COUNTRIES))

    out = df.select(
        F.col("row_id"),
        txn_id.alias("txn_id"),
        merchant.alias("merchant_id"),
        user.alias("user_id"),
        amount_str.alias("amount"),
        currency.alias("currency"),
        status.alias("status"),
        F.date_format(txn_ts, "yyyy-MM-dd'T'HH:mm:ss").alias("txn_ts"),
        country.alias("country"),
        F.date_format(txn_date, "yyyy-MM-dd").alias("ingest_date"),
    )

    # Invalid-row injection: exactly one corruption mode per affected row
    # (generate_transaction_data.py:111-140).
    is_invalid = _u("invalid", seed) < invalid_rate
    mode = F.pmod(_h("invalid_mode", seed), F.lit(4))
    out = (
        out.withColumn(
            "amount",
            F.when(is_invalid & (mode == 0),
                   F.concat(F.lit("-"), F.col("amount"))).otherwise(F.col("amount")))
        .withColumn(
            "currency",
            F.when(is_invalid & (mode == 1), "ZZZ").otherwise(F.col("currency")))
        .withColumn(
            "status",
            F.when(is_invalid & (mode == 2), "PENDINGISH").otherwise(F.col("status")))
        .withColumn(
            "user_id",
            F.when(is_invalid & (mode == 3), "").otherwise(F.col("user_id")))
    )

    if duplicate_rate > 0:
        dups = (
            out.where(_u("dup", seed) < duplicate_rate)
            # same txn_id, strictly later ts -> dedup must keep the dup row
            .withColumn(
                "txn_ts",
                F.date_format(
                    F.to_timestamp(F.col("txn_ts"), "yyyy-MM-dd'T'HH:mm:ss")
                    + F.expr("INTERVAL 1 SECOND"),
                    "yyyy-MM-dd'T'HH:mm:ss"))
            .withColumn("amount", F.col("amount"))  # other fields unchanged
        )
        out = out.unionByName(dups)

    return out.drop("row_id").select(*S.RAW_COLUMNS, "ingest_date")


def write_raw_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Raw-zone CSV sink (S8): one Hive dir per ingest day, like the
    reference's ``ingest_date=YYYY-MM-DD/`` layout
    (generate_transaction_data.py:207-208)."""
    (df.write.mode(mode).partitionBy("ingest_date")
     .option("header", True).csv(path))
