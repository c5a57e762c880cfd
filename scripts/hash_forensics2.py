"""Stage 2: show concrete differing cells (pandas path) for queries where
driver verdict and pandas_str verdict disagree, plus the 9 driver failures."""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.sources import TESTDATA_TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

QUERIES = [
    # driver passed, pandas_str failed:
    "cube_events_type_date", "medallion_cast_derive_date",
    "retention_cohorts", "scalar_datetime_gallery",
    # driver failed:
    "event_funnel_conversion", "grouping_sets_revenue", "having_big_customers",
    "join_left_outer_order_lines", "q1_pricing_summary",
    "returned_revenue_by_customer", "rollup_orders_year_status",
    "scalar_string_math_gallery", "trade_flows_by_nation_year",
]


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    return cols_sorted, sorted(
        tuple("NULL" if v is None else str(v) for v in (r[i] for i in order))
        for r in rows)


def main():
    spark = get_spark(app_name="hash-forensics2")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    for name in QUERIES:
        sdf = qs[name](spark, SF_DIR)
        pdf = sdf.toPandas()
        ddf = con.execute(oracles[name]).df()
        scols, snorm = norm(list(pdf.columns),
                            [tuple(r) for r in pdf.itertuples(index=False)])
        dcols, dnorm = norm(list(ddf.columns),
                            [tuple(r) for r in ddf.itertuples(index=False)])
        print(f"\n=== {name}")
        print(f"  spark dtypes: {dict(pdf.dtypes.astype(str))}")
        print(f"  duck  dtypes: {dict(ddf.dtypes.astype(str))}")
        ndiff = 0
        for i, (a, b) in enumerate(zip(snorm, dnorm)):
            if a != b:
                ndiff += 1
                if ndiff <= 2:
                    for j, (x, y) in enumerate(zip(a, b)):
                        if x != y:
                            print(f"  row{i} col={scols[j]}: spark={x!r} duck={y!r}")
        print(f"  total differing rows (pandas_str): {ndiff}/{len(snorm)}")


if __name__ == "__main__":
    main()
