"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``aws_payment_data_lake_spark.queries``): every implemented operator from
SURVEY.md §2 registers a (Spark callable, DuckDB oracle SQL) pair there;
this module just re-exports the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from aws_payment_data_lake_spark import queries as _q  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _q.all_queries()["q1_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return _q.oracle_sqls()
