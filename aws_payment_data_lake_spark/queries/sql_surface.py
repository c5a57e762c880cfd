"""The SQL endpoint surface (SURVEY.md §2.1 S9).

The reference DECLARES an Athena SQL layer over the curated zone
(README.md:33,67,88-89) but ships no queries. Here it is concrete:
testdata tables are registered as views in Spark's catalog and queried
with ``spark.sql`` — SQL string -> Spark parser -> Catalyst -> same
physical machinery as the DataFrame API. The oracle twin is (almost) the
same SQL text run by DuckDB, which is exactly the claim an Athena user
migrating to this engine cares about: ANSI SQL in, same rows out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import read_table


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


_DAILY_TOTALS = """
SELECT o_orderdate AS day,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS gross_value,
       max(o_totalprice) AS max_order_value
FROM orders
GROUP BY o_orderdate
ORDER BY day
"""

_STATUS_FUNNEL = """
WITH s AS (
  SELECT o_orderstatus,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS value
  FROM orders
  GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_orders, value,
       round(CAST(100 AS DOUBLE) * n_orders / t.total, 6) AS pct_orders
FROM s CROSS JOIN
     (SELECT CAST(sum(n_orders) AS DOUBLE) AS total FROM s) t
ORDER BY o_orderstatus
"""
# share-of-total through a re-aggregated one-row CROSS JOIN, not
# `sum(count(*)) OVER ()` — the empty window compiles to a
# partitionless WindowExec (single-task exchange + warning); the SQL
# stays verbatim-shared with the oracle, and the quotient is the same
# exact integer-count ratio.


@register(
    "sql_daily_totals",
    oracle=_DAILY_TOTALS,
    tags=("sql-endpoint", "gold", "daily-totals"),
)
def sql_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer daily totals (the reference's declared "daily totals"
    gold aggregate, README.md:130), issued as pure SQL text."""
    _view(spark, sf_dir, "orders")
    return spark.sql(_DAILY_TOTALS)


def sql_status_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status funnel with a window-over-aggregate share-of-total — SQL
    text shared verbatim with the would-be oracle. Unregistered (the
    registry is capped at the driver's 50-query window; the S9 SQL-text
    surface is already driver-checked via sql_daily_totals and
    grouping_sets_revenue) — still covered by tests/test_queries_extra.py
    and the bench."""
    _view(spark, sf_dir, "orders")
    return spark.sql(_STATUS_FUNNEL)
