"""Vendored byte-pair-encoding subword tokenizer (pure Python, no
external deps) — the "BPE count column" that packing.py's docstring
promises.

Scale shape: BPE training does NOT need the corpus, only the
word -> frequency dict (Sennrich et al. 2016 operate on exactly that
table). Word counts are computed DISTRIBUTED (one explode + groupBy, the
same shape as text_vocab_topk) and only the dict — bounded by vocabulary
size (Heaps' law; ~31 words in this corpus), optionally capped at
``top_k`` — is collected to the driver. Merge learning is then a
driver-side loop over that tiny dict, the same sample-to-driver pattern
as kmeans_centroids (operators/similarity.py). Encoding ships the merge
ranks (a small dict) in a pandas_udf closure and memoizes per DISTINCT
word inside each Arrow batch, so per-row cost is a dict lookup for all
but the first occurrence of a word.

Determinism: merge selection breaks frequency ties lexicographically on
the pair, so the learned merge list is a pure function of the word-freq
dict, which is a pure function of the data — identical at any partition
count.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

# End-of-word sentinel, appended to each word's final character so merges
# can distinguish suffixes from interior sequences ("s</w>" vs "s").
EOW = "</w>"


# ---------------------------------------------------------------- training

def word_frequencies(docs: DataFrame, text_col: str = "text",
                     top_k: int = 50_000) -> dict[str, int]:
    """Distributed word -> count over the corpus; collects at most
    ``top_k`` rows (most frequent first, word-lexicographic tiebreak).
    The cap bounds driver memory at any corpus size — rare tail words
    contribute negligible pair mass to BPE training anyway."""
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(top_k)
        .collect()
    )
    return {r["word"]: r["n"] for r in rows}


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_pair(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    merged = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe_merges(word_freqs: dict[str, int],
                     n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency dict: each word
    starts as its character sequence (+ EOW on the last char); repeat
    n_merges times: count adjacent-pair frequencies weighted by word
    frequency, merge the most frequent pair (ties -> lexicographically
    smallest pair, so the result is deterministic). Stops early when no
    pair occurs twice."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs.items():
        if not word:
            continue
        symbols = tuple(word[:-1]) + (word[-1] + EOW,)
        vocab[symbols] = vocab.get(symbols, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_pair(s, pair): f for s, f in vocab.items()}
    return merges


# ---------------------------------------------------------------- encoding

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with rank-greedy BPE (always apply the
    lowest-rank — earliest-learned — applicable merge first, the GPT-2
    convention; equivalent to replaying the merge list in order)."""
    if not word:
        return []
    symbols = list(word[:-1]) + [word[-1] + EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_token_count_column(text_col: str | Column,
                           merges: list[tuple[str, str]]) -> Column:
    """Column: number of BPE tokens in ``text_col``. Arrow-batched
    pandas_udf; the merge ranks ride the closure (small: n_merges
    entries) and per-word encodings are memoized across the batch, so
    cost is proportional to DISTINCT words per batch, not rows."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def count_one(text: str) -> int:
            if text is None:
                return 0
            total = 0
            for w in text.split(" "):
                if not w:
                    continue
                n = cache.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(count_one).astype("int32")

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _count(c)


def bpe_encode_column(text_col: str | Column,
                      merges: list[tuple[str, str]]) -> Column:
    """Column: the full BPE token sequence (array<string>, EOW markers
    included) — the shard-materialization twin of
    ``bpe_token_count_column``, same memoized Arrow-batched shape but
    shipping the pieces instead of their count."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def encode_one(text: str) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return texts.map(encode_one)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _encode(c)
