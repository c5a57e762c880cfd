"""Property-based tests (SURVEY.md §5.2.4) over the medallion transforms.

Hypothesis drives adversarial row content through the bronze/silver
functions; each property is one the pipeline's correctness argument
leans on. Example counts are small (Spark pays ~0.5 s per example) but
the strategies bias toward the nasty region: empty strings, whitespace,
unicode, nulls, negative/huge amounts, bad timestamps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from aws_payment_data_lake_spark.plans import bronze as B
from aws_payment_data_lake_spark.plans import silver as S

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])

maybe_text = st.one_of(
    st.none(),
    st.text(min_size=0, max_size=12),
    st.sampled_from(["  padded  ", "", "ZZZ", "usd", "PENDINGISH",
                     "Ünïcødé", "\ttab\t"]))
maybe_amount = st.one_of(
    st.none(),
    st.sampled_from(["-1.00", "0.00", "0.01", "99999999999.99", "nan",
                     "not-a-number", "1e3", " 5.00 "]),
    st.decimals(min_value=-10**6, max_value=10**6, places=2).map(str))
maybe_ts = st.one_of(
    st.none(),
    st.sampled_from(["2024-01-01T00:00:00", "2024-13-40T99:99:99",
                     "garbage", "", "2024-02-29T12:00:00"]))

row = st.tuples(maybe_text, maybe_text, maybe_text, maybe_amount,
                maybe_text, maybe_text, maybe_ts, maybe_text)

SCHEMA = T.StructType([T.StructField(n, T.StringType()) for n in
                       ("txn_id", "merchant_id", "user_id", "amount",
                        "currency", "status", "txn_ts", "country")])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@SETTINGS
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_curate_status_is_total(spark, rows):
    out = S.curate_status(_df(spark, rows)).select("status_curated").collect()
    allowed = {"PENDING", "SUCCESS", "REFUNDED", "FAILED", "UNKNOWN"}
    assert all(r[0] in allowed for r in out)  # never null, never novel


@SETTINGS
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_validation_split_partitions_bronze(spark, rows):
    df = B.cast_dtypes(_df(spark, rows))
    n = df.count()
    n_valid = S.validate(df).count()
    n_audit = S.audit(df).count()
    assert n_valid + n_audit == n  # audit ∪ silver = bronze, disjoint


@SETTINGS
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_bronze_never_throws_and_dedup_idempotent(spark, rows):
    out = B.run_bronze(_df(spark, rows))
    once = out.collect()  # ANSI mode: try_* casts must absorb any input
    again = B.deduplicate(out).collect()
    key = repr  # rows contain None: not orderable natively
    assert sorted(map(tuple, once), key=key) == sorted(map(tuple, again), key=key)


@SETTINGS
@given(rows=st.lists(row, min_size=1, max_size=8))
def test_normalise_idempotent(spark, rows):
    df = _df(spark, rows)
    one = B.normalise_strings(df)
    two = B.normalise_strings(one)
    assert sorted(map(tuple, one.collect()), key=repr) == \
        sorted(map(tuple, two.collect()), key=repr)
