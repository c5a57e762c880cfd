"""Skew-resistant aggregation: two-phase salted combine.

AQE's skew-join splitting (on in session.py) handles skewed JOINS at
runtime; a skewed AGGREGATION key (one merchant with half the traffic)
still funnels through a single reducer under plain groupBy when partial
aggregation can't compress (e.g. distinct-heavy or high-cardinality
sub-aggregates). Salting splits each hot key across `n_salts` reducers,
then a second (tiny: keys x salts rows) aggregation merges the partials.

Only ALGEBRAIC aggregates (sum/count/min/max — mergeable partials) can be
salted this way; that limitation is the API: callers pass the partial and
merge expressions explicitly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_SALTS = 16


def salted_agg(df: DataFrame, key: str,
               partials: dict[str, Column],
               merges: dict[str, Column],
               n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).

    `partials` maps output name -> aggregate over the raw rows;
    `merges` maps final name -> aggregate over the partial columns.
    The salt derives deterministically from the whole row (xxhash64), so
    results are reproducible at any parallelism.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(n_salts))
    partial = (df.withColumn("_salt", salt)
               .groupBy(key, "_salt")
               .agg(*[expr.alias(name) for name, expr in partials.items()]))
    return partial.groupBy(key).agg(
        *[expr.alias(name) for name, expr in merges.items()])


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = DEFAULT_SALTS, how: str = "inner") -> DataFrame:
    """Skew-resistant fact⋈dim equi-join: replicate the DIM side
    `n_salts` ways and spread each fact key's rows across the replicas,
    so one hot key occupies `n_salts` reducers instead of one.

    When to reach for this instead of AQE's skew split
    (spark.sql.adaptive.skewJoin, on by default in session.py): AQE
    splits oversized PARTITIONS after the shuffle is materialized, which
    handles moderate skew transparently; a pathological single key
    (one merchant with half of 100 TB) still writes its entire shuffle
    block set through the map side before AQE can split it, and AQE
    cannot split a broadcast-ineligible dim row set. Salting moves the
    fix BEFORE the shuffle. Cost: the dim side is duplicated n_salts
    times (dim must be small-ish — the usual case; a fact⋈fact skewed
    join needs two-sided salting on the hot-key list instead).

    The fact salt derives deterministically from the whole row, so
    results reproduce at any parallelism. Join type is restricted to
    inner/left: the dim-side replication would multiply unmatched right
    rows under right/full outer.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                  F.lit(n_salts))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (fact_s.join(dim_s, [key, "_salt"], how)
            .drop("_salt"))


def salted_user_value_totals(events: DataFrame,
                             n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Per-user event count + value sum, salted (the concrete shape used
    by tests and as the pattern reference)."""
    return salted_agg(
        events, "user_id",
        partials={"_n": F.count(F.lit(1)), "_s": F.sum("value")},
        merges={"n_events": F.sum("_n"),
                "sum_value": F.round(F.sum("_s"), 4)},
        n_salts=n_salts)
