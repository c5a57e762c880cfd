"""Oracle-diff every registered query against DuckDB (driver's t2, locally).

Parametrized over the registry, so adding a query to
``aws_payment_data_lake_spark.queries`` automatically adds its oracle test.
"""

from __future__ import annotations

import pytest

from aws_payment_data_lake_spark.queries import all_queries
from tests.conftest import compare_with_oracle

_SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(_SPECS), ids=sorted(_SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = _SPECS[name]
    if spec.oracle is None:
        df = spec.fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0  # rows-only check, mirroring the driver
    else:
        compare_with_oracle(spark, duck, spec)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
