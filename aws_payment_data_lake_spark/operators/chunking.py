"""Document chunking: split each document into fixed-token windows with
overlap — the step between a curated corpus and a context-window-bounded
training/RAG dataloader (reference scope: the corpus tables the medallion
pipeline curates; chunking is the standard downstream consumer the
reference's "Potential Upgrades" stops short of).

Shape: pure flatMap — tokenize once (`split`), generate the window start
offsets with `sequence` (0, stride, 2·stride, … while < n_tokens),
`posexplode`, `slice` + `array_join` to build each chunk. No shuffle, no
UDF, no window function: every row is processed locally and the whole
plan stays inside WholeStageCodegen. Output row count is
ceil(n_tokens / stride) per doc, so total output ∝ corpus tokens ×
window/stride — the overlap factor is the only blowup and it is a fixed
parameter, which is why this holds at 100 TB: chunking 100 TB is one
scan producing ~(window/stride)·100 TB, perfectly partition-parallel.

Trailing-chunk rule: a chunk that starts past 0 is emitted only when it
contains at least one token the previous chunk did not cover
(`start + window - stride < n_tokens`). Because starts increase, at most
the LAST start can fail the rule, so chunk indices stay consecutive.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_documents(docs: DataFrame, window: int = 64, stride: int = 48,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One row per (doc, chunk): (id, chunk_idx, start_token,
    n_chunk_tokens, chunk_text).

    Tokens are whitespace tokens (the corpus convention — pass a
    pre-tokenized column for anything else). ``window`` is the chunk
    size in tokens, ``stride`` the distance between chunk starts;
    ``stride < window`` gives ``window - stride`` tokens of overlap so
    no training example loses cross-boundary context. Deterministic and
    order-independent: chunk_idx = start // stride depends only on the
    document text.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # sequence(0, n-1, stride) = all starts < n (split never yields an
    # empty array, so n >= 1 and the sequence is well-formed).
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    new_tokens = (F.col("start") == 0) | (
        F.col("start") + F.lit(window - stride) < F.col("n_tokens"))
    return (
        docs.select(id_col, F.col(text_col),
                    toks.alias("_toks"), n.alias("n_tokens"))
        .select(id_col, "n_tokens", "_toks",
                F.explode(starts).alias("start"))
        .where(new_tokens)
        .select(
            id_col,
            (F.col("start") / F.lit(stride)).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_token"),
            F.least(F.lit(window), F.col("n_tokens") - F.col("start"))
             .cast("long").alias("n_chunk_tokens"),
            F.array_join(F.slice("_toks", F.col("start") + 1, window), " ")
             .alias("chunk_text"),
        )
    )
