"""Fuzzy string-similarity self-join: all pairs within edit distance k,
without the cross join.

The classic string-similarity-join problem (ED-Join / q-gram count
filtering, Xiao et al. 2008; Gravano et al. 2001): entity names arrive
dirty — "red widget" vs "red widgets" — and the dedup/reconciliation
join needs every pair with levenshtein <= k. A cross join is O(n^2)
verifications; at lake scale the join must BLOCK first.

Plan (all built-ins, one shuffle on the gram key):
  1. q-grams per string, OCCURRENCE-TAGGED row-locally
     (`transform(grams, (g,i) -> g#<count of g before i>)`) so the
     gram-key equijoin counts MULTISET gram overlap — the count-filter
     theorem is about multisets, and a distinct-gram join would
     undercount and falsely reject true pairs;
  2. equijoin on the tagged gram, group by pair, count shared grams;
  3. count filter: ed(s,t) <= k implies shared multiset q-grams
     >= max(#grams) - k*q (each edit destroys at most q grams) — pairs
     below the bound are pruned BEFORE any edit-distance work;
  4. length filter |len(s)-len(t)| <= k;
  5. verify survivors with levenshtein (JVM built-in) <= k.

Strings too short for the filter to hold anything (fewer than k*q + 1
q-grams — a k-edit rewrite can destroy EVERY gram) are routed through
an explicit small-cross branch against their length band, so
correctness never depends on the pruning bound being positive. Pairs
are emitted once (s_a < s_b).

Cost model at scale: the gram join shuffles ~L rows per string (L =
string length) keyed by gram+occurrence; frequent grams fan out — the
standard mitigation (not needed at this corpus' name cardinalities) is
prefix filtering on rare grams, which drops candidates further but
needs a gram-frequency pass first."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _tagged_grams(col: str, q: int) -> F.Column:
    """Occurrence-tagged q-grams, row-local: duplicate grams within a
    string become g#0, g#1, ... so an equijoin computes multiset
    intersection sizes. The occurrence index of gram i is the count of
    equal grams among the first i (a slice+filter fold — no window,
    no shuffle)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({col}) - {q - 1}, 0)), "
        f"i -> substring({col}, i, {q}))")
    return F.transform(
        grams,
        lambda g, i: F.concat_ws(
            "#", g,
            F.size(F.filter(F.slice(grams, F.lit(1), i),
                            lambda x: x == g)).cast("string")))


def similarity_join_candidates(names: DataFrame, col: str,
                               max_ed: int = 2, q: int = 2) -> DataFrame:
    """(s_a, s_b): the BLOCKED candidate pairs (count filter + length
    filter + short-string cross branch) — every true <=max_ed pair is
    guaranteed present; the verify step prunes the rest. Exposed
    separately so pruning power is measurable (tests/test_fuzzy.py)."""
    s = names.select(F.col(col).alias("s")).where(
        F.col("s").isNotNull()).distinct()
    n_grams = F.greatest(F.length("s") - (q - 1), F.lit(0))
    blockable = s.where(n_grams > max_ed * q)
    short = s.where(n_grams <= max_ed * q)

    g = blockable.select(
        "s", F.explode(_tagged_grams("s", q)).alias("g"))
    pairs = (g.alias("a").join(g.alias("b"), "g")
             .where(F.col("a.s") < F.col("b.s"))
             .groupBy(F.col("a.s").alias("s_a"),
                      F.col("b.s").alias("s_b"))
             .agg(F.count(F.lit(1)).alias("shared")))
    bound = (F.greatest(F.length("s_a"), F.length("s_b")) - (q - 1)
             - max_ed * q)
    blocked = pairs.where(F.col("shared") >= bound)

    # short strings: the count bound is vacuous — cross them against
    # every string within the length filter (a k-edit can rewrite the
    # whole value). The short set is bounded by construction (values
    # with <= k*q+q-1 characters).
    short_side = s.where(F.length("s") <= (max_ed * q + q - 1) + max_ed)
    crossed = (short.alias("a")
               .crossJoin(short_side.alias("b"))
               .where(F.col("a.s") < F.col("b.s"))
               .select(F.col("a.s").alias("s_a"),
                       F.col("b.s").alias("s_b")))

    cand = (blocked.select("s_a", "s_b")
            .unionByName(crossed).distinct())
    return cand.where(
        F.abs(F.length("s_a") - F.length("s_b")) <= max_ed)


def string_similarity_join(names: DataFrame, col: str,
                           max_ed: int = 2, q: int = 2) -> DataFrame:
    """(s_a, s_b, edit_distance): every unordered pair of DISTINCT
    values of ``names.col`` with levenshtein <= max_ed."""
    return (similarity_join_candidates(names, col, max_ed, q)
            .withColumn("edit_distance", F.levenshtein("s_a", "s_b"))
            .where(F.col("edit_distance") <= max_ed))
