"""Deduplication family: exact, shingle-Jaccard, MinHash-LSH, SimHash.

Four operators with distinct scale profiles:

  exact            one hash aggregation on md5(text) — the 100 TB default.
  shingle-Jaccard  exact pairwise similarity via a shingle co-occurrence
                   join — the correctness baseline; O(sum of per-shingle
                   doc-frequency^2), only viable when shingles are rare.
  MinHash-LSH      64-permutation signatures, 32 bands x 2 rows; only
                   banded candidates are exact-verified. THE scale path:
                   candidate count ~ true-pair count, not n^2. P(miss) for
                   a Jaccard-0.6 pair = (1-0.6^2)^32 ~ 6e-7, so results
                   equal the exact baseline (which is what the oracle
                   checks).
  SimHash          60-bit fingerprints; Hamming<=5 pairs found by 6-chunk
                   pigeonhole banding (>=1 of 6 10-bit chunks must match
                   exactly — lossless, unlike probabilistic LSH).

All hashing is the md5-based hash60 (functions/text.py) so every stage is
reproducible in DuckDB SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from aws_payment_data_lake_spark.functions import (
    MERSENNE_P,
    hash60,
    hash60_mod_p,
    shingles,
    tokens,
)

# ---------------------------------------------------------------------------
# MinHash parameters: 64 affine permutations h_i(x) = (a_i*x + b_i) mod p,
# constants from a fixed LCG so the oracle SQL embeds the same numbers.
# ---------------------------------------------------------------------------
N_HASHES = 64
N_BANDS = 32          # r = 2 rows per band
JACCARD_THRESHOLD = 0.6


def minhash_coefficients(n: int = N_HASHES, seed: int = 1234567):
    """Deterministic (a_i, b_i) pairs, 1 <= a,b < p (plain LCG — must be
    reproducible from the literal seed, not from random module state)."""
    coeffs, state = [], seed
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % (MERSENNE_P - 1) + 1
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % (MERSENNE_P - 1) + 1
        coeffs.append((a, b))
    return coeffs


MINHASH_COEFFS = minhash_coefficients()


# ---------------------------------------------------------------------------
# Shared shapes
# ---------------------------------------------------------------------------

def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) with distinct 3-gram shingles per doc.

    Output columns are ALWAYS named (doc_id, shingle) whatever the
    caller's ``id_col`` is — every downstream dedup stage (signature
    aggregation, size counts, co-occurrence joins) groups on the literal
    ``doc_id``, so normalizing the name here is what makes the
    ``id_col`` parameter actually work across the family.

    Repartitions on the doc id first: the docs table typically arrives as
    few large files (locally: ONE parquet -> one task), and the
    tokenize/shingle/md5 chain below is the CPU-heavy part of every
    dedup operator — one narrow shuffle of the compact pre-explode rows
    buys full-cluster parallelism for it."""
    shuffle_n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        docs.repartition(shuffle_n, F.col(id_col))
        .select(F.col(id_col).alias("doc_id"), F.explode(
            F.array_distinct(shingles(tokens(text_col)))).alias("shingle"))
    )


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           prefix_len: int | None = None) -> DataFrame:
    """Exact dedup: group on md5(text); emit only groups with >1 copy,
    canonical = min id. One shuffle, fully scalable.

    `prefix_len` switches the key to md5 of the first N characters —
    prefix-fingerprint dedup (the C4/RealNews-style boilerplate variant):
    near-identical docs share their opening characters long before they
    are byte-identical, so this tier fires on corpora where full-text
    exact dedup is vacuous.

    `doc_ids` is a comma-joined sorted string, not an array: registered
    outputs carry no collection-typed columns (convention,
    queries/relational.py) because the driver's pandas canonicalizer
    cannot sort list cells."""
    key = F.col(text_col)
    if prefix_len is not None:
        key = F.substring(key, 1, prefix_len)
    return (
        docs.groupBy(F.md5(key).alias("text_md5"))
        .agg(F.count(F.lit(1)).alias("n_copies"),
             F.min(id_col).alias("canonical_doc_id"),
             F.array_join(F.sort_array(F.collect_list(id_col)), ",")
             .alias("doc_ids"))
        .where(F.col("n_copies") > 1)
    )


def jaccard_pairs(docs: DataFrame, threshold: float = JACCARD_THRESHOLD,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold, via co-occurrence:
    self-join the (doc, shingle) table on shingle (intersection counts),
    then |A|+|B|-|A∩B| for the union. No n^2 scan — cost follows shingle
    doc-frequency, and 3-gram shingles are rare by construction."""
    sh = doc_shingles(docs, id_col, text_col).persist()
    # Materialization barrier (same shape as minhash_lsh_pairs): the
    # final action's three branches (sizes + both self-join sides) can
    # race to populate the cache and recompute the tokenize/shingle
    # chain. Measured cost-neutral here (2.0 vs 2.1 s solo at sf0.1 —
    # this plan's branches schedule sequentially), kept because the same
    # race DID cost minhash 3x in round 1 and plan scheduling is not a
    # contract.
    sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn("union_sh", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .where(F.col("inter") >= F.lit(threshold) * F.col("union_sh"))
        .select("doc_a", "doc_b", "inter", "union_sh",
                F.round(F.col("inter") / F.col("union_sh"), 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """One row per doc with sig0..sig63: min over shingles of
    (a_i * (hash60(s) mod p) + b_i) mod p. Single exploded aggregation —
    64 mins computed in one pass with map-side partial combine."""
    sh = doc_shingles(docs, id_col, text_col).withColumn(
        "h", hash60_mod_p(F.col("shingle")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"sig{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def incremental_minhash_dedup(new_docs: DataFrame, corpus_sigs: DataFrame,
                              est_threshold: float = JACCARD_THRESHOLD,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Dedup a NEW document batch against an EXISTING corpus using ONLY
    the corpus's stored signature table — the production shape at
    100 TB: the corpus text is never re-read (the signature table is the
    persisted dedup state, ~0.5 KB/doc), the delta batch is signed and
    banded, candidates come from a band-hash equi-join, and matches are
    scored by the MinHash Jaccard ESTIMATE (fraction of agreeing
    signature components, std ~sqrt(J(1-J)/64) ≈ 0.06 at J=0.6) — exact
    verification would need both documents' shingles, i.e. corpus text.

    The new side of the band join is the delta batch — orders of
    magnitude smaller than the corpus — so AQE broadcasts it and the
    corpus signature table never shuffles. Emits one row per
    (new_doc_id, corpus_doc_id) with est_jaccard >= est_threshold; the
    caller drops or canonicalizes the matched new docs.

    Append path: union the NEW batch's signatures (`minhash_signatures`)
    into the stored table afterward — signatures are per-doc, so the
    state update is a blind append, no rebuild.

    ``corpus_sigs`` contract: columns ``doc_id, sig0..sig{N_HASHES-1}``
    (what ``minhash_signatures`` emits — it normalizes any ``id_col`` to
    ``doc_id`` via ``doc_shingles``). ``id_col``/``text_col`` rename the
    NEW batch's columns only."""
    new_sigs = minhash_signatures(new_docs, id_col, text_col)

    def banded(sigs: DataFrame, out: str) -> DataFrame:
        bands = F.array(*[
            F.xxhash64(F.lit(j), F.col(f"sig{2 * j}"), F.col(f"sig{2 * j + 1}"))
            for j in range(N_BANDS)
        ])
        return sigs.select(
            F.col("doc_id").alias(out),
            F.posexplode(bands).alias("band_idx", "band_hash"))

    cands = (
        banded(new_sigs, "new_doc_id")
        .join(banded(corpus_sigs, "corpus_doc_id"), ["band_idx", "band_hash"])
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    n = (new_sigs.select("doc_id", *[F.col(f"sig{i}").alias(f"a{i}")
                                     for i in range(N_HASHES)])
         .withColumnRenamed("doc_id", "new_doc_id"))
    c = (corpus_sigs.select("doc_id", *[F.col(f"sig{i}").alias(f"b{i}")
                                        for i in range(N_HASHES)])
         .withColumnRenamed("doc_id", "corpus_doc_id"))
    agree = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
                for i in range(N_HASHES))
    return (
        cands.join(n, "new_doc_id").join(c, "corpus_doc_id")
        .select("new_doc_id", "corpus_doc_id",
                F.round(agree / F.lit(float(N_HASHES)), 6)
                .alias("est_jaccard"))
        .where(F.col("est_jaccard") >= est_threshold)
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Band signatures into 32 (band_idx, xxhash64(sig_2j, sig_2j+1))
    buckets; pairs are expanded WITHIN buckets. Band hashing needs no
    oracle twin — banding only shapes the CANDIDATE set; correctness
    comes from verification.

    Bucket-and-expand, not a banded self-join: a self-join evaluates the
    signature plan once per side (the 64-min aggregation twice) and
    shuffles the full banded table against itself, where the groupBy
    collects each bucket's ids in ONE shuffle of the banded rows and the
    double explode only touches buckets with >1 member. The pair blowup
    on a hot bucket (e.g. a boilerplate corpus where thousands of docs
    share a band) is |bucket|^2 in BOTH shapes — banding radius, not
    join strategy, is the knob for that. Candidate set is identical.

    Measured at sf0.1 (5000 docs, 160k banded rows): candidates stage
    3.2 s -> ~1 s; full minhash_lsh_pairs 3.3 -> ~2.3 s."""
    bands = F.array(*[
        F.xxhash64(F.lit(j), F.col(f"sig{2 * j}"), F.col(f"sig{2 * j + 1}"))
        for j in range(N_BANDS)
    ])
    buckets = (
        sigs.select("doc_id", F.posexplode(bands).alias("band_idx", "band_hash"))
        .groupBy("band_idx", "band_hash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = JACCARD_THRESHOLD,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified: banded candidates ->
    exact Jaccard filter. Output contract identical to jaccard_pairs."""
    # One exploded+hashed shingle table feeds signatures AND the
    # verification joins — persist it instead of recomputing the
    # tokenize/shingle/md5 chain per consumer (at 100 TB: a persisted or
    # checkpointed intermediate; locally: MEMORY_AND_DISK). The shingle
    # count n_sh rides the SAME groupBy as the 64 signature mins (one
    # pass, one shuffle — not a separate sizes aggregation), and the
    # 5000-row sigs table is itself persisted so banding and both size
    # joins never re-run the 64-min agg. The count() on sigs is a
    # MATERIALIZATION BARRIER populating both caches in one job: without
    # it the final action's branching stages race to populate the cache
    # and can each recompute the chain (the round-1 bench showed exactly
    # that — 10.9 s driver run vs 3.2 s recorded with a warm cache).
    sh = doc_shingles(docs, id_col, text_col).withColumn(
        "h", hash60_mod_p(F.col("shingle"))).persist()
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"sig{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    sigs = (sh.groupBy("doc_id")
            .agg(*aggs, F.count(F.lit(1)).alias("n_sh"))
            .persist())
    sigs.count()
    cands = lsh_candidate_pairs(sigs)
    sizes = sigs.select("doc_id", "n_sh")
    # intersection restricted to candidate pairs: expand doc_a's shingles,
    # then equi-join on (doc_b, shingle) to count the overlap
    inter = (
        cands
        .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
              ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn("union_sh", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .where(F.col("inter") >= F.lit(threshold) * F.col("union_sh"))
        .select("doc_a", "doc_b", "inter", "union_sh",
                F.round(F.col("inter") / F.col("union_sh"), 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60          # fits signed 64-bit, aligns with hash60
SIMHASH_CHUNKS = 6         # 10 bits each
HAMMING_THRESHOLD = 5      # <=5 differing bits => >=1 of 6 chunks equal


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """60-bit SimHash over distinct shingles: bit j of the fingerprint is
    the sign of sum over shingles of (2*bit_j(hash60)-1). Explode to
    (doc, bit) rows — stays JVM-side, shuffles once on (doc, bit)."""
    sh = doc_shingles(docs, id_col, text_col).withColumn(
        "h", hash60(F.col("shingle")))
    # 60 conditional-sum aggregates in ONE map-side-combinable groupBy:
    # bit j is set iff (# shingles with bit j) * 2 > (# shingles), i.e.
    # sign of sum(+-1 votes). The alternative — exploding to (doc, bit)
    # rows — shuffles 60x the shingle count; this shuffles 62 longs per
    # doc regardless of document size.
    bit_sums = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    agged = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *bit_sums)
    fingerprint = sum(
        (F.col(f"b{j}") * 2 > F.col("n")).cast("long") * F.lit(2**j)
        for j in range(SIMHASH_BITS)
    )
    return agged.select("doc_id", fingerprint.alias("fingerprint"))


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 50,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components over the near-dup pair graph -> canonical doc
    per duplicate cluster (min doc_id), the step that turns pairwise
    similarity into trainable keep/drop decisions.

    Alternating large-star / small-star rounds (the two-phase MapReduce
    connected-components algorithm, Kiveris et al. 2014): each round
    contracts every node's neighborhood toward its minimum, so label
    distance shrinks multiplicatively and the loop converges in
    O(log d) rounds on diameter-d graphs — vs the d rounds of plain
    1-hop min-label propagation. Near-dup graphs are usually shallow
    (diameter <= 2 locally), where both shapes cost the same handful of
    rounds; on adversarial chain-shaped graphs (transitive near-dup
    chains at corpus scale) this version wins asymptotically. Each round
    is two groupBy-min + join passes over the PAIR graph, which is
    orders of magnitude smaller than the corpus.

      large-star: for each node u with neighborhood G(u) (symmetric),
                  m = min(G(u) ∪ {u}); emit (v, m) for v in G(u), v > u.
      small-star: orient edges (u, v) with u > v; m = min(N(u) ∪ {u});
                  emit (v, m) for v in N(u) ∪ {u}, v != m.

    At fixpoint the edge set is a union of stars (child -> component
    minimum). Convergence detection: the edge set is compared by
    (count, exact decimal sum of per-edge xxhash64) — two cheap
    aggregates, no join-and-compare; a hash-sum tie on different edge
    sets is astronomically unlikely, and max_iter bounds the loop
    regardless (the algorithm's round count is provably O(log n)).

    Each round ends in a checkpoint (not ``persist``): one round's
    plan references its input ~12x (symmetrize-union + two self-joins +
    star-union), so without lineage TRUNCATION the analyzed tree grows
    ~12^rounds and the driver OOMs on analysis alone by round ~7 —
    caching the data is not enough. The checkpointed table is the
    (small) pair graph, so materializing it per round is cheap.

    ``checkpoint_dir``: on a real cluster pass a durable location
    (HDFS/S3) and rounds use reliable ``checkpoint`` — localCheckpoint
    blocks live in executor memory/disk and die with their executor,
    which kills a long-running iterative job at 1000-executor scale.
    Default None keeps the fast local path for tests/bench.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        return (df.checkpoint(eager=True) if checkpoint_dir is not None
                else df.localCheckpoint())

    edges = ckpt(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src) != F.col(dst))
        .distinct())
    all_nodes = (edges.select(F.col("u").alias("node"))
                 .union(edges.select(F.col("v").alias("node")))
                 .distinct())

    def checksum(e: DataFrame):
        return tuple(e.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))).first())

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m")))
        return (sym.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .distinct())

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(F.greatest("u", "v").alias("u"),
                            F.least("u", "v").alias("v"))
        # u > every neighbor v here, so min(N(u) ∪ {u}) = min(v)
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (oriented.join(mins, "u")
               .where(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
        own = mins.select("u", F.col("m").alias("v"))
        return nbr.union(own).distinct()

    prev = checksum(edges)
    for _ in range(max_iter):
        edges = ckpt(small_star(large_star(edges)))
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur

    # Fixpoint edges are (child, root) stars; roots appear only on the
    # right. Every node labels itself unless a star edge points it at a
    # smaller root.
    labels = (all_nodes.join(edges, all_nodes.node == edges.u, "left")
              .select("node", F.coalesce("v", "node").alias("label")))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("group_size"))
    return (labels.join(sizes, "label")
            .select(F.col("node").alias("doc_id"),
                    F.col("label").alias("canonical_doc_id"),
                    "group_size"))


def simhash_pairs(docs: DataFrame, max_hamming: int = HAMMING_THRESHOLD,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pairs with Hamming(fp_a, fp_b) <= 5, via pigeonhole banding: split
    60 bits into 6 chunks; <=5 flips can't touch all 6 chunks, so every
    qualifying pair shares >=1 exact chunk — candidates are found by 6
    equi-joins (one exploded join), recall is EXACTLY 1."""
    # The chunk equi-join below is a SELF-join: without a persisted input
    # both sides recompute the whole tokenize/shingle/61-agg fingerprint
    # chain (AQE's broadcast conversion defeats shuffle-exchange reuse —
    # measured 10 s vs 6 s at sf0.1). Fingerprints are 2 longs per doc,
    # so persisting is cheap at any scale; count() is the materialization
    # barrier (see minhash_lsh_pairs).
    fps = simhash_fingerprints(docs, id_col, text_col).persist()
    fps.count()
    chunks = F.array(*[
        F.shiftright(F.col("fingerprint"), 10 * k).bitwiseAND(F.lit(1023))
        for k in range(SIMHASH_CHUNKS)
    ])
    ck = fps.select("doc_id", "fingerprint",
                    F.posexplode(chunks).alias("chunk_idx", "chunk_val"))
    a, b = ck.alias("a"), ck.alias("b")
    cands = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.fingerprint").alias("fp_a"),
                F.col("b.fingerprint").alias("fp_b"))
        .distinct()
    )
    hamming = F.bit_count(F.expr("fp_a ^ fp_b"))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "fp_a", "fp_b", "hamming")
    )
