"""Misra-Gries heavy hitters: the provable bound IS the contract —
true - N/capacity <= est <= true for every emitted item, and every item
with true count > N/capacity survives, at any partitioning."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.sketches import heavy_hitters
from aws_payment_data_lake_spark.sources import load


def _check_bounds(spark, df, col, capacity, n_parts):
    data = df.repartition(n_parts)
    exact = {r[col]: r["n"] for r in
             data.groupBy(df[col].cast("string").alias(col))
             .agg({"*": "count"}).withColumnRenamed("count(1)", "n")
             .collect()}
    total = sum(exact.values())
    bound = total / capacity
    got = {r[col]: r["est_count"]
           for r in heavy_hitters(data, col, capacity).collect()}
    for item, est in got.items():
        assert item in exact, item
        assert est <= exact[item], (item, est, exact[item])
        assert est >= exact[item] - bound, (item, est, exact[item], bound)
    for item, true in exact.items():
        if true > bound:
            assert item in got, (item, true, bound)
    return got, exact


def test_bounds_on_zipfish_tokens(spark):
    """Document tokens are zipf-ish: the stopword-like head must
    survive a small sketch with near-exact counts."""
    (docs,) = load(spark, SF_DIR, "documents")
    import pyspark.sql.functions as F
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    got, exact = _check_bounds(spark, tokens, "tok",
                               capacity=64, n_parts=8)
    # sketch top-5 == exact top-5 for a head this heavy
    top_got = sorted(got, key=lambda t: (-got[t], t))[:5]
    top_true = sorted(exact, key=lambda t: (-exact[t], t))[:5]
    assert set(top_got) == set(top_true)


def test_bounds_hold_across_partitionings(spark):
    (docs,) = load(spark, SF_DIR, "documents")
    import pyspark.sql.functions as F
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    for n_parts in (1, 3, 17):
        _check_bounds(spark, tokens, "tok", capacity=32, n_parts=n_parts)


def test_planted_heavy_hitter_and_edges(spark):
    """An item holding >1/4 of a long-tail stream must survive a
    capacity-8 sketch; capacity<1 rejects; nulls are excluded."""
    rows = ([("hot",)] * 400
            + [(f"tail{i}",) for i in range(1200)] + [(None,)] * 10)
    df = spark.createDataFrame(rows, "k string").repartition(5)
    got = {r["k"]: r["est_count"]
           for r in heavy_hitters(df, "k", capacity=8).collect()}
    assert "hot" in got
    assert 400 - 1600 / 8 <= got["hot"] <= 400
    assert None not in got
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", capacity=0)
