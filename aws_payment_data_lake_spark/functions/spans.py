"""Token-interval (span) column builders shared by the span-surgery
operators: benchmark-decontamination scrub (operators/decontam.py) and
exact duplicate-span removal (operators/dedup.py). All array-local
Catalyst expressions — the per-doc hit list is tiny, so the merge and
complement math never leaves the row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# typed empty array<struct<s,e>> literal (SQL string for F.expr)
EMPTY_SPANS = "CAST(array() AS array<struct<s: int, e: int>>)"


def merge_spans(ivs: Column) -> Column:
    """Merge a SORTED array of [s, e] token intervals; adjacent
    intervals merge too (the segment between them would be empty)."""
    def step(acc: Column, iv: Column) -> Column:
        last = F.element_at(acc, -1)
        return (
            F.when(F.size(acc) == 0, F.array(iv))
            .when(iv["s"] <= last["e"] + 1,
                  F.concat(F.slice(acc, 1, F.size(acc) - 1),
                           F.array(F.struct(
                               last["s"].alias("s"),
                               F.greatest(last["e"], iv["e"]).alias("e")))))
            .otherwise(F.concat(acc, F.array(iv))))

    return F.aggregate(ivs, F.expr(EMPTY_SPANS), step)


def split_tokens_by_spans(d: DataFrame, text_col: str,
                          min_tokens: int = 1) -> DataFrame:
    """Emit the complement of the (merged, disjoint) removal ``spans``
    as one row per surviving piece: (doc_id, segment_idx, n_tokens,
    <text_col>). Expects columns (doc_id, tk, spans). Pieces shorter
    than ``min_tokens`` drop; ``segment_idx`` keeps its positional
    value even when earlier pieces are dropped (stable provenance).
    Docs with empty spans emit one whole-doc segment 0; fully-covered
    docs emit nothing."""
    starts = F.concat(F.array(F.lit(0)),
                      F.transform("spans", lambda iv: iv["e"] + 1))
    ends = F.concat(F.transform("spans", lambda iv: iv["s"]),
                    F.array(F.size("tk")))  # exclusive
    bounds = F.zip_with(starts, ends,
                        lambda s, e: F.struct(s.alias("s"), e.alias("e")))
    return (
        d.select("doc_id", "tk",
                 F.posexplode(bounds).alias("segment_idx", "b"))
        .select("doc_id", "segment_idx",
                (F.col("b.e") - F.col("b.s")).alias("n_tokens"),
                F.array_join(
                    F.slice("tk", F.col("b.s") + 1,
                            F.greatest(F.col("b.e") - F.col("b.s"),
                                       F.lit(0))), " ").alias(text_col))
        .where((F.col("n_tokens") > 0)
               & (F.col("n_tokens") >= min_tokens))
    )
