"""Z-order data layout: multi-dimensional clustering for file skipping
— what Delta Lake's OPTIMIZE ZORDER BY does (public semantics; Delta is
this repo's declared-but-unshippable upgrade path), re-expressed as
plain Spark + parquet.

Why it matters at 100 TB: engines skip parquet files/row-groups via
footer min/max stats, but a sort on one column only prunes filters on
THAT column. Interleaving the bits of several columns' bucket ranks
into one z-value and range-partitioning + sorting by it gives every
participating column locality, so a rectangle query on any subset of
them touches a bounded fraction of files. The layout pass is one
min/max aggregation (bounded driver literal, the centroid-table
contract), one range shuffle, and a per-partition sort — the minimum
any physical re-layout costs; everything is JVM-side integer math
inside codegen (no UDF).

Bucketing note: ranks default to linear (width_bucket over min..max),
the cheap variant matching Delta's default for int-like columns; pass
``quantile=True`` for equi-DEPTH buckets from approxQuantile boundaries
(round 6, VERDICT r5 #5) — on a heavily skewed column linear buckets
collapse (a zipf column with max 2^20 puts ~all rows in bucket 0, so
every file's min/max spans the dense region and nothing prunes), while
quantile buckets split the mass evenly and rectangle queries on the
dense region prune again. The boundary list is a bounded driver
literal (<= 2^bits-1 doubles per column, the same contract as the
linear min/max stats row); the per-row rank is a JVM-side
count-of-boundaries-below via a higher-order filter over the literal
array — no join, no UDF.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket_expr(col: str, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket rank of ``col`` in [0, 2^bits), as a long."""
    n = 1 << bits
    if hi <= lo:  # constant column: every row in bucket 0
        return F.lit(0).cast("long")
    # width_bucket returns 1..n+1 (n+1 for x == hi); clamp to [0, n-1].
    wb = F.width_bucket(F.col(col).cast("double"), F.lit(float(lo)),
                        F.lit(float(hi)), F.lit(n))
    return F.least(F.greatest(wb - 1, F.lit(0)), F.lit(n - 1)).cast("long")


def _quantile_bucket_expr(col: str, bounds: list[float]) -> Column:
    """Equi-depth bucket rank: count of quantile boundaries <= value.
    Null values rank 0 (width_bucket's behavior differs — it propagates
    null — but a rank must be total for the interleave, and nulls
    cluster at the low end either way once sorted)."""
    if not bounds:  # constant / all-null column
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    x = F.col(col).cast("double")
    return (F.when(x.isNull(), F.lit(0))
            .otherwise(F.size(F.filter(arr, lambda b: b <= x)))
            .cast("long"))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8,
               quantile: bool = False) -> Column:
    """The interleaved-bit z-value over ``cols`` (bits per column
    bounded so the key fits a long: len(cols) * bits <= 63). Linear
    ranks need one min/max aggregation; ``quantile=True`` ranks by
    approxQuantile boundaries instead (equi-depth — the skew-proof
    variant; see module docstring). Either way the driver holds only a
    bounded literal."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a long")
    from pyspark.sql.types import NumericType
    types = {f.name: f.dataType for f in df.schema.fields}
    bad = [c for c in cols if not isinstance(types.get(c), NumericType)]
    if bad:
        raise ValueError(
            f"zorder columns must be numeric (got {bad}); cast "
            "dates/timestamps to their epoch numbers first — a silent "
            "string->double null would collapse the column to one bucket")
    if quantile:
        n = 1 << bits
        probs = [k / n for k in range(1, n)]
        # one pass for every column; duplicate boundaries (heavy hitters
        # wider than a bucket) dedupe away — fewer, still-valid buckets
        allb = df.selectExpr(*[f"CAST({c} AS DOUBLE) AS {c}" for c in cols]
                             ).approxQuantile(cols, probs, 1.0 / (4 * n))
        ranks = [_quantile_bucket_expr(c, sorted(set(bs)))
                 for c, bs in zip(cols, allb)]
    else:
        stats = df.agg(*[f(c).cast("double").alias(f"{name}_{c}")
                         for c in cols for f, name in ((F.min, "lo"),
                                                       (F.max, "hi"))]
                       ).collect()[0]
        # empty input (or all-null column) -> null stats: constant-rank
        ranks = [_bucket_expr(c, stats[f"lo_{c}"] or 0.0,
                              stats[f"hi_{c}"] or 0.0, bits)
                 for c in cols]
    ncols = len(cols)
    # z = sum over (bit b of column i) shifted to position b*ncols + i
    parts = [
        F.shiftleft(F.shiftrightunsigned(rank, b).bitwiseAND(F.lit(1)),
                    b * ncols + i)
        for i, rank in enumerate(ranks) for b in range(bits)
    ]
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("z_value")


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 8, n_files: int = 16,
                   mode: str = "overwrite", quantile: bool = False) -> None:
    """Materialize ``df`` as ``n_files`` parquet files clustered by the
    z-value of ``cols``: range-partition by z (contiguous z-ranges per
    file → tight per-file min/max on every participating column), sort
    within partitions, drop the helper column on write. ``n_files`` is
    the file-size knob; at 100 TB it comes from target file size, not
    a constant. ``quantile=True`` uses equi-depth bucket ranks (see
    ``zorder_key``) — the right call on skewed columns."""
    (df.withColumn("z_value", zorder_key(df, cols, bits, quantile=quantile))
       .repartitionByRange(n_files, "z_value")
       .sortWithinPartitions("z_value")
       .drop("z_value")
       .write.mode(mode).parquet(path))


def write_with_bloom(df: DataFrame, path: str, bloom_cols: list[str],
                     ndv: int = 100_000, n_files: int = 16,
                     mode: str = "overwrite") -> None:
    """Write parquet with BLOOM FILTERS on ``bloom_cols`` — the
    equality-lookup complement to `write_zordered`'s range clustering:
    min/max stats can never prune a point lookup on a high-cardinality
    unsorted column (every file's [min,max] contains almost any key),
    but a bloom filter answers "key definitely absent" per row group,
    so Spark's parquet reader skips it on `col = literal` predicates.

    ``ndv`` sizes the filter (expected distinct values per row group —
    overestimating costs bytes, underestimating costs false positives);
    at 100 TB the knob is per-column. The feature is plain parquet
    (parquet.bloom.filter.* write options), readable by any engine."""
    writer = df.repartition(n_files).write.mode(mode)
    for c in bloom_cols:
        writer = (writer
                  .option(f"parquet.bloom.filter.enabled#{c}", "true")
                  .option(f"parquet.bloom.filter.expected.ndv#{c}",
                          str(ndv)))
    writer.parquet(path)
