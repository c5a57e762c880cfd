"""Python UDTF surface (Spark 4 user-defined table functions).

The reference has no table functions, but `posexplode`-style row
expansion is the canonical shape users reach for when native generators
run out — a Python UDTF is the Spark-4 escape hatch, so the engine
carries one end-to-end example with an oracle.

Scale note: a Python UDTF is the SLOW PATH (row-at-a-time Python, like a
classic UDF). This query exists for API coverage and correctness of the
plumbing; anything expressible as `explode(sequence(...))` should stay
native — the docstring math here IS expressible natively, and the test
in tests/test_queries_extra.py asserts the UDTF output equals that
native rewrite, which is also how a reviewer can see what the UDTF
computes.
"""

from __future__ import annotations

import datetime as _dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load


@udtf(returnType="orderkey: bigint, pos: int, quarter_start: date")
class OrderQuarters:
    """Expand each order into the quarter-start dates from its order date
    through the end of the following year (pos = 0-based quarter index).
    Pure-Python date math — deterministic, no library calls."""

    def eval(self, orderkey: int, year: int, quarter: int):  # noqa: D102
        # quarters from (year, quarter) through Q4 of year+1
        q_index = year * 4 + (quarter - 1)
        last = (year + 1) * 4 + 3
        for pos, qi in enumerate(range(q_index, last + 1)):
            y, q = divmod(qi, 4)
            yield orderkey, pos, _dt.date(y, q * 3 + 1, 1)


@register(
    "udtf_order_quarters",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           CAST(s.gs AS INT) AS pos,
           CAST(date_trunc('quarter', o.o_orderdate)
                + (CAST(s.gs AS INT) * INTERVAL '3 months') AS DATE)
             AS quarter_start
    FROM orders o
    JOIN generate_series(0, 7) AS s(gs)
      ON s.gs <= 8 - quarter(o.o_orderdate)
    WHERE o.o_orderkey % 100 = 0
    ORDER BY orderkey, pos
    """,
    tags=("udtf", "generator", "python"),
)
def udtf_order_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the OrderQuarters UDTF to a 1% slice of orders: each
    order expands into one row per quarter from its order quarter through
    Q4 of the next year. The oracle rebuilds the same expansion with
    generate_series + date arithmetic."""
    (orders,) = load(spark, sf_dir, "orders")
    spark.udtf.register("order_quarters", OrderQuarters)
    (orders.where(F.col("o_orderkey") % 100 == 0)
     .select("o_orderkey",
             F.year("o_orderdate").alias("yr"),
             F.quarter("o_orderdate").alias("qtr"))
     .createOrReplaceTempView("orders_udtf_slice"))
    return spark.sql("""
        SELECT q.orderkey, q.pos, q.quarter_start
        FROM orders_udtf_slice s,
             LATERAL order_quarters(s.o_orderkey, s.yr, s.qtr) q
        ORDER BY q.orderkey, q.pos
    """)
