"""Medallion pipeline plans: Raw CSV -> Bronze -> Silver/Audit (+DQ).

Re-expresses the reference's two Glue jobs
(src/glue_jobs/etl_transactions_bronze.py, etl_transactions_silver.py) and
its data generator (src/data_generator/generate_transaction_data.py) as
ordered, deterministic, scale-ready Spark plans.
"""

from aws_payment_data_lake_spark.plans.bronze import run_bronze  # noqa: F401
from aws_payment_data_lake_spark.plans.generator import generate_transactions  # noqa: F401
from aws_payment_data_lake_spark.plans.silver import (  # noqa: F401
    dq_summary,
    run_silver,
    with_validity,
)
