"""Narrow-scan spread guard, shared by every CPU-heavy operator.

Problem (round-1 verdict): locally a small parquet table arrives as 1-2
input splits, pinning explode/n-gram/Arrow-matmul work to one or two
tasks; but at production scale the scan already yields thousands of
splits and an unconditional repartition "to spread the work" is a pure
extra shuffle of the whole table. So the spread is GATED on input
parallelism.

Probe choice: ``df.inputFiles()`` — pure scan metadata from the file
index. The previous probe, ``df.rdd.getNumPartitions()``, compiles the
logical plan to an RDD, ~1-2 s of driver work PER CALL (measured while
building lm_quality: two probes added ~4 s to a 7 s cold query). File
count undercounts split count for multi-split files (a 1 GB file is ~8
scan splits), so the guard fires slightly more eagerly than the RDD
probe — harmless: it can only trigger on scans narrower than the
threshold, i.e. never on a production-scale table. Frames with no file
leaves (in-memory frames, post-shuffle inputs) fall back to the RDD
probe — the round-1 guard covered those too, and the probe's driver
cost only bites on the hot scan paths, which always have files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def spread_narrow_scan(df: DataFrame, key: str | None = None,
                       target: int | None = None,
                       threshold: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` partitions (hash by ``key`` when
    given) iff its scan is narrower than ``threshold`` files.
    Defaults: target = defaultParallelism, threshold = target."""
    if df.isStreaming:
        # streaming frames expose neither inputFiles nor an RDD; their
        # parallelism comes from the source (maxFilesPerTrigger /
        # partitions), so the guard passes them through untouched
        return df
    sc = df.sparkSession.sparkContext
    tgt = target if target is not None else sc.defaultParallelism
    thr = threshold if threshold is not None else tgt
    width = len(df.inputFiles()) or df.rdd.getNumPartitions()
    if 0 < width < thr:
        return df.repartition(tgt, F.col(key)) if key else df.repartition(tgt)
    return df
