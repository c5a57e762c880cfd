"""Bucketed table layout: co-located, shuffle-free joins.

The 100 TB play the medallion zones set up for: write fact tables
bucketed (and sorted) by their join key, and every subsequent
equi-join/aggregation on that key runs WITHOUT an Exchange — the shuffle
is paid once at write time, amortized over every downstream query.
`tests/test_bucketing.py` asserts the join plan is literally
exchange-free on both sides.

Spark bucketing requires the table catalog (`saveAsTable`); with an
`option("path", ...)` the data lands where the zone layout wants it and
the catalog entry carries the bucket spec Catalyst needs to elide the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, bucket_col: str,
                   n_buckets: int, path: str | None = None,
                   sort: bool = True) -> None:
    """Write `df` as a bucketed (optionally bucket-sorted) catalog table.

    Sorting within buckets additionally removes the per-partition Sort
    from downstream sort-merge joins — the join becomes a pure merge.
    """
    writer = (df.write.format("parquet")
              .bucketBy(n_buckets, bucket_col))
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
