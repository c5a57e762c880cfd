"""Canonical payments schemas and domains.

Mirrors the reference's declared schema (generate_transaction_data.py:52-61
dataclass, :170-173 CSV header) and value domains (:43-48). Explicit
StructType at the CSV boundary — the reference's local path uses
``inferSchema=True`` (transactions_bronze_dev.ipynb cell-2) which is both
nondeterministic and, at 100 TB, an extra full scan of the input.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw CSV: everything is a string (the generator writes formatted strings).
RAW_SCHEMA = T.StructType([
    T.StructField("txn_id", T.StringType()),
    T.StructField("merchant_id", T.StringType()),
    T.StructField("user_id", T.StringType()),
    T.StructField("amount", T.StringType()),
    T.StructField("currency", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("txn_ts", T.StringType()),
    T.StructField("country", T.StringType()),
])

RAW_COLUMNS = [f.name for f in RAW_SCHEMA.fields]

# Domains — generate_transaction_data.py:43-48.
CURRENCIES = ["GBP", "USD", "EUR", "JPY", "AUD", "CAD"]
STATUSES = ["AUTHORISED", "SETTLED", "REFUNDED", "CHARGEBACK",
            "DECLINED", "PENDING", "SUCCESS", "FAILED"]
COUNTRIES = ["GB", "FR", "DE", "ES", "IE", "NL", "IT", "JP", "AU", "CA"]

# Status weights — generate_transaction_data.py:104 (sum = 100).
STATUS_WEIGHTS = [30, 40, 5, 2, 15, 5, 2, 1]

# Raw status -> curated category — etl_transactions_silver.py:100-110.
STATUS_MAPPING = {
    "AUTHORISED": "PENDING",
    "SETTLED": "SUCCESS",
    "REFUNDED": "REFUNDED",
    "CHARGEBACK": "FAILED",
    "DECLINED": "FAILED",
    "PENDING": "PENDING",
    "SUCCESS": "SUCCESS",
    "FAILED": "FAILED",
}
STATUS_UNKNOWN = "UNKNOWN"

# Money is exact fixed-point — etl_transactions_bronze.py:9,35-36.
AMOUNT_DECIMAL = T.DecimalType(12, 2)
