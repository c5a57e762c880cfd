"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark set, and scrub the leaked spans.

The standard pre-training hygiene gate (e.g. GPT-3 appendix C / PaLM
§C: 8-gram—13-gram overlap between training corpus and eval sets):
a training document containing any n-gram that also appears in a
benchmark document leaks eval data into training and must be dropped
or scrubbed before the shard-packing stage. Both remedies live here:
``benchmark_contamination`` is the flag gate (drop the doc);
``scrub_contaminated`` is the surgical one (remove the overlapping
token span, keep the clean remainder as split pieces — the GPT-3
appendix-C procedure). ``n`` accepts a single size or the full
``SPEC_NGRAMS`` = 8..13 union.

Scale shape: the benchmark side is SMALL by nature (eval sets are
thousands of docs, the corpus is billions), so its distinct-gram-hash
table broadcasts and the corpus side is one explode + broadcast hash
join + per-doc aggregation — no corpus-sized shuffle at all. Grams
join on the md5-based 60-bit hash (functions.text.hash60), not the
raw string: an 8-gram averages ~50 bytes vs 8 hash bytes, so the
broadcast table and the probe rows shrink ~6x. A 60-bit collision can
flag a clean doc (P ~ |bench grams| * |corpus grams| / 2^60 — at a
billion-gram benchmark x a trillion-gram corpus, ~1e-3 spurious doc
flags corpus-wide); decontamination tolerates false POSITIVES by
contract (dropping one extra doc is free, leaking eval data is not),
the same trade Bloom-filter decontam pipelines make.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from aws_payment_data_lake_spark.functions import (
    hash60,
    tokens,
    word_ngrams_upto,
)
from aws_payment_data_lake_spark.functions.spans import (
    EMPTY_SPANS,
    merge_spans,
    split_tokens_by_spans,
)
from aws_payment_data_lake_spark.operators.spread import spread_narrow_scan

DEFAULT_NGRAM = 8
# GPT-3 appendix C / PaLM §C use 8-to-13-gram overlap; the union over
# the whole range is the conservative spec (a 13-gram leak whose doc is
# only 12 tokens long is invisible at n=13 but caught at n<=12).
SPEC_NGRAMS = tuple(range(8, 14))

# Gram-hash knob: hash60 over the joined gram STRING is the ORACLE
# tier — DuckDB can recompute it, so every driver/pytest parity claim
# runs through it. Production corpora don't need a cross-engine twin,
# and round 6 measured that gram STRING construction (not hashing)
# dominates the pass — so the production tier skips the strings
# entirely: HASH_FAST hashes the token SUB-ARRAY itself
# (xxhash64(slice(tk, i, n)) per window — native, codegen'd, zero
# concatenation; array equality <=> gram equality, exactly the same
# set-membership semantics). Both tiers share the collision contract
# documented above. tests/test_decontam.py asserts the two paths
# produce identical flags and identical scrubbed pieces; round 7
# measured the slice tier + dropped cosmetic sort at 1.9x on the sf1.0
# scrub (14.9 -> 8.0 s, see BASELINE.md).
HASH_ORACLE = hash60


class _SliceHashTier:
    """Sentinel: hash token slices directly, never build gram strings."""

    def __repr__(self) -> str:  # pragma: no cover - repr only
        return "HASH_FAST(xxhash64-over-token-slice)"


HASH_FAST = _SliceHashTier()


def _ns(n: int | Sequence[int]) -> tuple[int, ...]:
    return (n,) if isinstance(n, int) else tuple(n)


def _all_grams(tk: Column, ns: tuple[int, ...]) -> Column:
    """One flat array of every n-gram for n in ``ns``, via the shared
    incremental zip_with build (each tier extends the previous — the
    multi-n union costs barely more than the largest single n)."""
    tiers = word_ngrams_upto(tk, max(ns))
    return F.flatten(F.array(*[tiers[n] for n in ns]))


def _win_positions(tk: Column, k: int) -> Column:
    """0-based window start positions for n-gram size ``k`` (empty for
    docs shorter than k)."""
    return (F.when(F.size(tk) >= k, F.sequence(F.lit(0), F.size(tk) - k))
            .otherwise(F.expr("CAST(array() AS array<int>)")))


def _slice_gh(tk: Column, k: int):
    """position -> xxhash64 of the k-token sub-array (factory keeps the
    F.transform lambda at arity 1)."""
    return lambda i: F.xxhash64(F.slice(tk, i + 1, k))


def _slice_gram_hashes(tk: Column, ns: tuple[int, ...]) -> Column:
    """Flat array of per-window xxhash64 hashes for every n in ``ns``,
    directly from token slices — the HASH_FAST tier's builder, zero
    string construction. Slice-tier-only by design: a string-tier
    variant would hash inside a transform lambda (interpreted per
    element); the string tier instead hashes AFTER its explode so the
    md5 stays in whole-stage codegen (review r7 — an earlier general
    helper carried exactly that slow dead branch)."""
    return F.flatten(F.array(*[
        F.transform(_win_positions(tk, k), _slice_gh(tk, k))
        for k in ns]))


def benchmark_gram_hashes(benchmark: DataFrame,
                          n: int | Sequence[int] = DEFAULT_NGRAM,
                          text_col: str = "text",
                          hash_fn=HASH_ORACLE) -> DataFrame:
    """Distinct hashes of every word n-gram (all sizes in ``n``) in the
    benchmark set — the (small) probe table a decontamination pass
    joins against. In production this is a stored table rebuilt when
    eval sets change. String tier hashes AFTER the explode: lambdas
    inside F.transform are interpreted per element, while the
    post-explode hash stays in whole-stage codegen."""
    tk = tokens(text_col)
    ns = _ns(n)
    if isinstance(hash_fn, _SliceHashTier):
        return (benchmark
                .select(F.explode(_slice_gram_hashes(tk, ns))
                        .alias("gh"))
                .distinct())
    return (
        benchmark
        .select(F.explode(_all_grams(tk, ns)).alias("gram"))
        .select(hash_fn(F.col("gram")).alias("gh"))
        .distinct()
    )


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            n: int | Sequence[int] = DEFAULT_NGRAM,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            broadcast_bench: bool = True,
                            hash_fn=HASH_ORACLE) -> DataFrame:
    """One row per corpus document: (doc_id, n_grams, n_hits,
    contamination_frac, contaminated).

    ``n`` may be a single size or a sequence (pass ``SPEC_NGRAMS`` for
    the GPT-3/PaLM 8-13 union). n_grams counts the doc's DISTINCT
    n-grams across all requested sizes (set semantics — one leaked gram
    repeated 50 times is one leak); n_hits counts how many of those
    appear anywhere in the benchmark; `contaminated` is the
    conservative any-hit flag downstream filters key on. Docs shorter
    than every n emit (0, 0, 0.0, false) rather than vanishing.

    ``broadcast_bench=False`` falls back to a plain shuffled join for
    the rare benchmark set too large to broadcast; the output contract
    is identical."""
    ns = _ns(n)
    # Narrow-scan spread guard: the n-gram build is the CPU-heavy part
    # (operators/spread.py has the full rationale). Measured at sf1.0:
    # warm 11.5 s -> ~2 s.
    corpus = spread_narrow_scan(corpus, id_col)
    # Per-doc distinct BEFORE hashing on the string tier (repetition-
    # heavy docs carry many intra-doc repeats; hashing them first costs
    # an md5 per repeat — measured 1.4x on the flag gate). The slice
    # tier distincts the hashes (identical counting under the collision
    # contract); both tiers emit the same (doc_id, gh) shape.
    tk = tokens(text_col)
    if isinstance(hash_fn, _SliceHashTier):
        gh_arr = F.array_distinct(_slice_gram_hashes(tk, ns))
        grams = corpus.select(F.col(id_col).alias("doc_id"),
                              F.explode_outer(gh_arr).alias("gh"))
    else:
        grams = (corpus.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(F.array_distinct(_all_grams(tk, ns)))
            .alias("gram"))
            .select("doc_id", hash_fn(F.col("gram")).alias("gh")))
    bench = benchmark_gram_hashes(benchmark, ns, text_col,
                                  hash_fn=hash_fn).withColumn(
        "hit", F.lit(1))
    if broadcast_bench:
        bench = F.broadcast(bench)
    # left join: null gh (short doc) and misses both keep the row with
    # hit = null, so the per-doc aggregation sees every document.
    n_hits = F.count("hit")
    n_grams = F.count("gh")
    return (
        grams.join(bench, "gh", "left")
        .groupBy("doc_id")
        .agg(n_grams.alias("n_grams"),
             n_hits.alias("n_hits"),
             F.round(n_hits / F.greatest(n_grams, F.lit(1)).cast("double"),
                     6).alias("contamination_frac"),
             (n_hits > 0).alias("contaminated"))
    )


# ---------------------------------------------------------------------------
# Scrub action (round 6, VERDICT r5 #4): the GPT-3-style remedy removes
# the contaminated SPAN and keeps the clean remainder as separate
# pieces, rather than dropping whole documents the flag-only gate would.
# ---------------------------------------------------------------------------

def _win_tier(k: int, hash_fn):
    """(gram, idx) -> struct(s, e, gh) for n-gram size ``k`` (factory —
    a default-arg lambda would change the arity F.transform inspects)."""
    return lambda g, i: F.struct(
        i.alias("s"), (i + F.lit(k - 1)).alias("e"), hash_fn(g).alias("gh"))


def _slice_win_tier(tk: Column, k: int):
    """position -> struct(s, e, gh) with gh hashed from the token
    slice (HASH_FAST twin of _win_tier)."""
    return lambda i: F.struct(
        i.alias("s"), (i + F.lit(k - 1)).alias("e"),
        F.xxhash64(F.slice(tk, i + 1, k)).alias("gh"))


def contaminated_spans(corpus: DataFrame, benchmark: DataFrame,
                       n: int | Sequence[int] = DEFAULT_NGRAM,
                       id_col: str = "doc_id", text_col: str = "text",
                       broadcast_bench: bool = True,
                       hash_fn=HASH_ORACLE) -> DataFrame:
    """(doc_id, spans): merged token-index intervals [s, e] covered by
    ANY benchmark-overlapping n-gram (all sizes in ``n``). Docs with no
    hits are absent — callers left-join. Same scale shape as the flag
    gate: broadcast hash probe, one per-doc aggregation; the interval
    merge is array-local arithmetic over the (tiny) per-doc hit list."""
    ns = _ns(n)
    corpus = spread_narrow_scan(corpus, id_col)
    tk = tokens(text_col)
    if isinstance(hash_fn, _SliceHashTier):
        win = F.flatten(F.array(*[
            F.transform(_win_positions(tk, k), _slice_win_tier(tk, k))
            for k in ns]))
    else:
        tiers = word_ngrams_upto(tk, max(ns))
        win = F.flatten(F.array(*[
            F.transform(tiers[k], _win_tier(k, hash_fn)) for k in ns]))
    bench = benchmark_gram_hashes(benchmark, ns, text_col, hash_fn=hash_fn)
    if broadcast_bench:
        bench = F.broadcast(bench)
    return (
        corpus.select(F.col(id_col).alias("doc_id"),
                      F.explode(win).alias("w"))
        .select("doc_id", "w.s", "w.e", "w.gh")
        .join(bench, "gh")
        .groupBy("doc_id")
        .agg(merge_spans(
            F.array_sort(F.collect_list(F.struct("s", "e")))).alias("spans"))
    )


def scrub_contaminated(corpus: DataFrame, benchmark: DataFrame,
                       n: int | Sequence[int] = DEFAULT_NGRAM,
                       min_tokens: int = 1, id_col: str = "doc_id",
                       text_col: str = "text",
                       broadcast_bench: bool = True,
                       hash_fn=HASH_ORACLE) -> DataFrame:
    """Remove every contaminated span and emit the clean remainder as
    one row per surviving piece: (doc_id, segment_idx, n_tokens,
    <text_col>).

    Pieces are the complement of the merged hit intervals, so NO output
    gram (at any requested size) can overlap the benchmark: every gram
    inside a piece is an original-document gram that was probed and
    missed — a re-run of ``benchmark_contamination`` over the output
    finds zero hits by construction (asserted in tests/test_decontam.py).
    Splitting (not re-joining around the hole) is what guarantees this:
    re-joined text would mint NEW grams across the seam that were never
    probed. Clean docs pass through whole as segment 0; fully
    contaminated docs vanish. ``min_tokens`` drops crumbs (GPT-3 uses a
    ~200-char floor); ``segment_idx`` keeps its positional value even
    when earlier pieces are dropped, preserving provenance."""
    spans = contaminated_spans(corpus, benchmark, n, id_col, text_col,
                               broadcast_bench, hash_fn=hash_fn)
    tok = spread_narrow_scan(corpus, id_col).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("tk"))
    d = tok.join(spans, "doc_id", "left").select(
        "doc_id", "tk",
        F.coalesce(F.col("spans"), F.expr(EMPTY_SPANS)).alias("spans"))
    return split_tokens_by_spans(d, text_col, min_tokens)
