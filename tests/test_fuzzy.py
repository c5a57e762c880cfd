"""Fuzzy string-similarity join (operators/fuzzy.py): brute-force
parity, short-string fallback, multiset gram tagging, pruning power."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.operators.fuzzy import (
    string_similarity_join,
)
from aws_payment_data_lake_spark.sources import load
from tests.conftest import SF_DIR


def _brute(values, k):
    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    out = set()
    for a, b in itertools.combinations(sorted(set(values)), 2):
        if abs(len(a) - len(b)) <= k:
            d = ed(a, b)
            if d <= k:
                out.add((a, b, d))
    return out


def test_matches_bruteforce_on_part_names(spark, duck):
    (part,) = load(spark, SF_DIR, "part")
    got = {tuple(r) for r in
           string_similarity_join(part, "p_name", max_ed=2).collect()}
    vals = [r[0] for r in duck.execute(
        "SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL"
    ).fetchall()]
    assert got == _brute(vals, 2)
    assert got  # the vocabulary actually produces close pairs


def test_short_strings_and_repeated_grams(spark):
    """Strings below the count-filter bound (a k-edit can destroy every
    q-gram) go through the cross branch; repeated-gram strings exercise
    the multiset occurrence tagging (a distinct-gram join would
    undercount 'aaaa' vs 'aaab' overlap)."""
    vals = ["ab", "cd", "abc", "aaaa", "aaab", "aaaaaa", "banana",
            "bananas", "bandana", "x", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {tuple(r) for r in
           string_similarity_join(df, "s", max_ed=2).collect()}
    assert got == _brute(vals, 2)


def test_count_filter_actually_prunes(spark):
    """The blocked candidate set — the pairs that actually reach the
    levenshtein verify — is well below the n^2/2 cross-join space on
    real names (a vacuous filter would mean the verify degenerates to
    the cross join)."""
    from aws_payment_data_lake_spark.operators.fuzzy import (
        similarity_join_candidates,
    )

    (part,) = load(spark, SF_DIR, "part")
    n = part.select("p_name").where(
        F.col("p_name").isNotNull()).distinct().count()
    cands = similarity_join_candidates(part, "p_name", max_ed=2).count()
    assert n >= 20
    assert cands < (n * (n - 1) // 2) * 0.35
