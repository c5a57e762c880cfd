"""Bronze -> Silver: validation, curation, and the declared audit/DQ surface.

Reference: src/glue_jobs/etl_transactions_silver.py (filters :24-86,
curation :89-112, composition :115-130). The reference silently DROPS
invalid rows; its README declares an audit dataset with reasons plus a DQ
summary (README.md:83-87) that was never implemented — here it is
first-class: one validity pass tags every row with its first failing
reason, then silver/audit are complementary filters of the SAME tagged
frame (single scan, no ``except``/double-read — SURVEY.md §2.8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from aws_payment_data_lake_spark.sources.writers import write_zone
from aws_payment_data_lake_spark.plans.schemas import (
    CURRENCIES,
    STATUS_MAPPING,
    STATUS_UNKNOWN,
    STATUSES,
)

# (reason, predicate-is-INVALID) in priority order: a row gets the FIRST
# reason that fires. Mirrors F1/F2/F3 of etl_transactions_silver.py:24-86
# plus the generator's blank_user corruption mode the reference's silver
# never checks (generate_transaction_data.py:135-139).
def _invalid_conditions() -> list[tuple[str, F.Column]]:
    return [
        ("nonpositive_amount",
         F.col("amount").isNull() | (F.col("amount") <= 0)),
        ("unknown_currency", ~F.col("currency").isin(CURRENCIES)),
        ("unknown_status", ~F.col("status").isin(STATUSES)),
        ("blank_user",
         F.col("user_id").isNull() | (F.trim(F.col("user_id")) == "")),
    ]


def with_validity(df: DataFrame) -> DataFrame:
    """Add ``reason`` (NULL = valid) in one projection — single scan."""
    reason = F.lit(None).cast("string")
    # build reversed so the first listed reason wins
    for name, cond in reversed(_invalid_conditions()):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return df.withColumn("reason", reason)


def validate(df: DataFrame) -> DataFrame:
    """Keep only valid rows (the reference's three chained ``where``s,
    etl_transactions_silver.py:126-129, which Catalyst collapses into one
    conjunctive filter pushed to the parquet scan)."""
    return with_validity(df).where(F.col("reason").isNull()).drop("reason")


def audit(df: DataFrame) -> DataFrame:
    """The rejected complement, with its reason column (README.md:83-87)."""
    return with_validity(df).where(F.col("reason").isNotNull())


def curate_status(df: DataFrame) -> DataFrame:
    """CASE WHEN chain raw status -> curated category
    (etl_transactions_silver.py:89-112)."""
    expr = None
    for raw, curated in STATUS_MAPPING.items():
        cond = F.col("status") == raw
        expr = F.when(cond, curated) if expr is None else expr.when(cond, curated)
    return df.withColumn("status_curated", expr.otherwise(STATUS_UNKNOWN))


def run_silver(df: DataFrame, dq_rules=None, dq_runner=None) -> DataFrame:
    """validate -> curate (ordered, etl_transactions_silver.py:115-130).

    ``dq_rules`` (operators/dq.py Rules or dicts) optionally gates the
    hop: the rule set runs as ONE single-pass aggregate over the input
    and raises DQViolationError BEFORE any silver rows are produced
    when a blocking rule fails — the declarative layer of the
    reference's declared Deequ upgrade (README.md:131). ``dq_runner``
    persists the run's metrics (pass or fail) to the history table
    first, so a stopped pipeline leaves its evidence."""
    if dq_rules is not None:
        from aws_payment_data_lake_spark.operators.dq import gate
        df = gate(df, dq_rules, runner=dq_runner, dataset="silver_input")
    return curate_status(validate(df))


def dq_summary(df: DataFrame) -> DataFrame:
    """Counts by rejection reason + total/valid rows (the declared DQ
    summary JSON, README.md:87)."""
    return (
        with_validity(df)
        .groupBy(F.coalesce(F.col("reason"), F.lit("valid")).alias("reason"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy("reason")
    )


def write_silver(df: DataFrame, path: str, mode: str = "overwrite",
                 fmt: str = "parquet") -> None:
    """Partitioned sink (S7), idempotent by default like bronze; accepts
    the same gated fmt="delta" flag (sources.writers)."""
    write_zone(df, path, mode=mode, fmt=fmt)
