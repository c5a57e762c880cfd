"""localframe.local_frame (r13 optimization): driver-literal frames
must plan as a pure-JVM LocalTableScan — the Python-list
createDataFrame path plans a Scan ExistingRDD whose partitions
round-trip a Python worker on every re-execution of the subtree —
while carrying schemas and values identical to the list path."""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from datetime import datetime

from aws_payment_data_lake_spark.localframe import local_frame

DDL = "cent_id long, ce array<double>, name string, ts timestamp"
ROWS = [
    (0, [1.0, 2.5], "a", datetime(2024, 1, 1, 12)),
    (1, [0.0, -3.25], None, None),
]


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_plans_as_local_table_scan(spark):
    df = local_frame(spark, ROWS, DDL)
    plan = _plan(df)
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_schema_and_values_match_list_path(spark):
    lst = spark.createDataFrame(ROWS, DDL)
    arrow = local_frame(spark, ROWS, DDL)
    assert arrow.schema == lst.schema
    assert sorted(map(tuple, arrow.collect())) == \
        sorted(map(tuple, lst.collect()))


def test_empty_rows_keep_schema(spark):
    df = local_frame(spark, [], DDL)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == \
        ["cent_id", "ce", "name", "ts"]


def test_struct_type_schema_accepted(spark):
    from pyspark.sql.types import (LongType, StructField, StructType)
    schema = StructType([StructField("a", LongType()),
                         StructField("b", LongType())])
    df = local_frame(spark, [(1, 2), (3, 4)], schema)
    assert df.schema == schema
    assert df.count() == 2
