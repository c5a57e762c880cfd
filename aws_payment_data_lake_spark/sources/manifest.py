"""File-level stats manifest + pruned reads: what Iceberg/Delta keep in
their metadata layer, on plain parquet — and the consumer that makes
`operators/layout.py`'s Z-order clustering pay off inside Spark.

Spark's own row-group pruning happens per task AFTER scheduling: every
file still becomes a task. At 100 TB / ~1e5 files, scheduling tasks
that footer-skip themselves is the overhead table formats exist to
avoid — they consult a manifest FIRST and plan only the overlapping
files. `build_manifest` harvests per-file min/max/rows once (footers
read ON EXECUTORS via an Arrow batch of file paths — the driver never
opens a file); `read_pruned` intersects it with a rectangle predicate
and hands Spark only the surviving files, then re-applies the
predicate exactly (manifest pruning is a superset filter, never a
substitute — late-arriving files simply miss the manifest until the
next build, the same freshness contract as any snapshot metadata).

Numeric columns only (the zorder_key contract): min/max travel as
doubles; a string column would need collation-aware bounds.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_MANIFEST_SCHEMA = ("file string, n_rows long, col string, "
                    "vmin double, vmax double")


def build_manifest(spark: SparkSession, path: str,
                   cols: list[str]) -> DataFrame:
    """One row per (file, column): (file, n_rows, col, vmin, vmax),
    from parquet footers read on executors."""
    if not cols:
        raise ValueError("build_manifest needs at least one column")
    files = spark.read.parquet(path).inputFiles()
    paths_df = spark.createDataFrame([(f,) for f in files], "file string")

    def stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq
        from urllib.parse import urlparse

        for pdf in batches:
            out = {"file": [], "n_rows": [], "col": [],
                   "vmin": [], "vmax": []}
            for uri in pdf["file"]:
                p = urlparse(uri)
                md = pq.ParquetFile(p.path if p.scheme in ("", "file")
                                    else uri).metadata
                names = {md.schema.column(i).name: i
                         for i in range(len(md.schema))}
                for c in cols:
                    # conservative contract: a file whose footer cannot
                    # bound the column (stats disabled, all-null row
                    # group, or a schema-evolved file lacking it) gets
                    # unbounded [-inf, inf] — it's always read, never
                    # wrongly skipped
                    mins, maxs = [], []
                    # zero row groups (an empty part file): unbounded
                    bounded = c in names and md.num_row_groups > 0
                    if bounded:
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(
                                names[c]).statistics
                            if (st is None or st.min is None
                                    or st.max is None):
                                bounded = False
                                break
                            mins.append(st.min)
                            maxs.append(st.max)
                    out["file"].append(uri)
                    out["n_rows"].append(md.num_rows)
                    out["col"].append(c)
                    out["vmin"].append(float(min(mins)) if bounded
                                       else float("-inf"))
                    out["vmax"].append(float(max(maxs)) if bounded
                                       else float("inf"))
            yield pd.DataFrame(out)

    # spread the file list so footer reads parallelize across the cluster
    n = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    return paths_df.repartition(n).mapInPandas(stats, _MANIFEST_SCHEMA)


def read_pruned(spark: SparkSession, path: str, manifest: DataFrame,
                predicates: dict[str, tuple[float, float]]) -> DataFrame:
    """Read only the files whose manifest bounds overlap every
    [lo, hi] predicate, then re-apply the predicates exactly.

    The candidate file list is collected — bounded by FILE count (the
    manifest pattern: Iceberg plans from manifests on the driver too);
    the data itself never moves until the pruned scan runs."""
    if not predicates:
        return spark.read.parquet(path)
    overlap = manifest.where(reduce(
        lambda a, b: a | b,
        [(F.col("col") == c) & ((F.col("vmin") > hi) | (F.col("vmax") < lo))
         for c, (lo, hi) in predicates.items()]))
    keep = (manifest.select("file").distinct()
            .join(overlap.select("file").distinct(), "file", "left_anti"))
    files = [r["file"] for r in keep.collect()]
    cond = reduce(lambda a, b: a & b,
                  [F.col(c).between(lo, hi)
                   for c, (lo, hi) in predicates.items()])
    if not files:
        return spark.read.parquet(path).where(cond).limit(0)
    return spark.read.parquet(*files).where(cond)
