"""Zone maintenance: small-file compaction — the read-side complement
to write_zone's ``files_per_partition`` write-side bound.

Streaming sinks and frequent appends accrete files far below the
target size; at 100 TB the scan cost becomes footer reads and
task-per-file overhead instead of data. Delta/Iceberg solve it with
OPTIMIZE/rewrite_data_files (this repo's declared-but-unshippable
upgrade path); on plain parquet the maintenance job is: size the
directory, pick ceil(total/target) output files, rewrite, swap.

Safety protocol (the self-referential-overwrite hazard documented on
plans/upsert.py: a lazy scan dangles once its files are replaced):
the input is MATERIALIZED with localCheckpoint before anything is
deleted, the compacted output lands in a sibling temp dir, and the
swap is two renames with the old data intact until the final step.
Local-filesystem renames are atomic per rename; an object-store
deployment would swap via its commit protocol instead (or use a real
table format — that's exactly what ACID formats are for).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    if p.scheme in ("", "file"):
        return p.path or uri
    raise ValueError(
        f"compact_parquet_dir handles local paths only (got {uri!r}); "
        "object stores need a commit-protocol swap or a table format")


def compact_parquet_dir(spark: SparkSession, path: str,
                        target_file_bytes: int = 128 << 20,
                        min_files_to_compact: int = 2) -> dict:
    """Rewrite a flat parquet directory into ~ceil(total/target) files.

    Trigger rule (Delta OPTIMIZE's convention, plus a progress bound):
    compaction runs only when at least ``min_files_to_compact`` files
    are SMALLER than half the target AND the rewrite would strictly
    reduce the file count. Re-encoding can shrink byte totals (parquet
    per-file overhead dominates at small sizes), so a single pass may
    leave room for another; the strict-decrease bound guarantees
    repeated runs CONVERGE to a no-op (file count is a decreasing
    positive integer) — at production file sizes one pass is the norm.
    Returns a report dict (files_before, files_after, bytes_total,
    compacted). Partitioned zones call this per partition directory
    (the partition value is in the path, not the rows)."""
    base_dir = _local_path(path).rstrip("/")
    bak0 = base_dir + ".compact-bak"
    if os.path.isdir(bak0) and not os.path.isdir(base_dir):
        # Crash window of a previous run: between os.replace(base, bak)
        # and os.replace(tmp, base) the zone exists only at .compact-bak.
        # Restore it before doing anything else — the backup IS the
        # pre-compaction data, whole and readable (ADVICE r5).
        os.replace(bak0, base_dir)
    parts = [e.name for e in os.scandir(base_dir)
             if e.is_dir() and "=" in e.name]
    if parts:
        raise ValueError(
            f"{path!r} is Hive-partitioned ({parts[0]}, ...): a flat "
            "rewrite would silently demote the partition layout — "
            "compact each partition directory instead")
    df = spark.read.parquet(path)
    files = [_local_path(f) for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, -(-total // target_file_bytes))
    small = [f for f in files
             if os.path.getsize(f) < target_file_bytes // 2]
    if len(small) < min_files_to_compact or n_target >= len(files):
        return {"files_before": len(files), "files_after": len(files),
                "bytes_total": total, "compacted": False}

    # materialize BEFORE touching the source files (dangling-scan guard)
    snap = df.repartition(n_target).localCheckpoint(eager=True)
    base = _local_path(path).rstrip("/")
    tmp, bak = base + ".compact-tmp", base + ".compact-bak"
    for d in (tmp, bak):
        shutil.rmtree(d, ignore_errors=True)
    snap.write.mode("overwrite").parquet(tmp)
    os.replace(base, bak)   # old data stays whole until the swap lands
    os.replace(tmp, base)
    shutil.rmtree(bak, ignore_errors=True)

    n_after = len(spark.read.parquet(path).inputFiles())
    return {"files_before": len(files), "files_after": n_after,
            "bytes_total": total, "compacted": True}


def forget_rows(spark: SparkSession, path: str, match_col: str,
                match_values: list, partition_col: str) -> dict:
    """Right-to-be-forgotten delete: remove every row whose
    ``match_col`` is in ``match_values`` from a ``partition_col``-
    partitioned parquet zone, REWRITING ONLY the partitions that
    actually contain such rows.

    The surgical part is the scale story: a GDPR erasure request
    against a years-deep 100 TB zone must not rewrite the table. Pass 1
    finds affected partitions with a predicate-pushed scan of just
    (match_col, partition_col) — column-pruned, and the IN-list reaches
    the parquet row-group filter. Pass 2 rewrites those partitions
    minus the matching rows via dynamic partition overwrite, which
    REPLACES only the partition directories it writes — untouched
    partitions' files are never opened for write. (A table format would
    log a delete vector instead; this is the plain-parquet equivalent,
    same posture as compact_parquet_dir above.)

    Replay-safe: a second run finds zero affected partitions and
    rewrites nothing. Returns {"partitions_rewritten", "rows_deleted",
    "rows_kept_in_rewritten"} for the erasure audit log.

    Input rows are MATERIALIZED before the overwrite (the
    self-referential-overwrite hazard: a lazy scan dangles once its
    files are replaced — see module docstring)."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(path)
    # NULL-safe membership: isin() yields NULL (not False) for NULL
    # keys, and `~NULL` is NULL, so a bare predicate would silently
    # drop NULL-key rows from every rewritten partition without
    # counting them as deleted. Coalesce to False so NULL-key rows
    # are KEPT and the erasure audit counts stay truthful.
    hit = F.coalesce(F.col(match_col).isin(*match_values), F.lit(False))
    parts = [r[0] for r in (df.where(hit)
                            .select(partition_col).distinct().collect())]
    if not parts:
        return {"partitions_rewritten": 0, "rows_deleted": 0,
                "rows_kept_in_rewritten": 0}
    affected = df.where(F.col(partition_col).isin(parts))
    deleted = affected.where(hit).count()
    keep = affected.where(~hit).localCheckpoint(eager=True)
    kept = keep.count()
    # dynamic overwrite only replaces partitions PRESENT in the written
    # frame — a partition whose rows ALL matched writes nothing and its
    # directory (still holding the to-be-forgotten rows) would survive.
    # Those directories are removed explicitly.
    kept_parts = {r[0] for r in
                  keep.select(partition_col).distinct().collect()}
    base = _local_path(path)
    for p in parts:
        if p not in kept_parts:
            shutil.rmtree(os.path.join(base, f"{partition_col}={p}"),
                          ignore_errors=True)
    if kept:
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            (keep.write.mode("overwrite").partitionBy(partition_col)
             .parquet(path))
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev)
    return {"partitions_rewritten": len(parts), "rows_deleted": deleted,
            "rows_kept_in_rewritten": kept}


def expire_partitions(spark: SparkSession, path: str,
                      partition_col: str, keep_from: str) -> dict:
    """Retention sweep: drop every ``partition_col=<value>`` directory
    whose value sorts strictly below ``keep_from`` (ISO dates sort
    lexically, so a date cutoff needs no parsing). The complement of
    `forget_rows`: erasure keyed by TIME instead of identity, and
    cheaper still — expiry is a directory unlink per partition, ZERO
    data scanned or rewritten, because the partition layout already IS
    the index (the same reason date-ranged reads prune). Hive-encoded
    values are compared in their encoded (directory-name) form —
    exactly what a date/int partition column yields.

    Replay-safe (a second run finds nothing below the cutoff) and
    crash-safe (each rmtree is independent; a partial sweep just
    leaves fewer partitions for the retry). Returns audit counts."""
    base = _local_path(path)
    prefix = f"{partition_col}="
    dropped = 0
    for d in sorted(os.listdir(base)):
        if d.startswith(prefix) and d[len(prefix):] < keep_from:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            dropped += 1
    return {"partitions_dropped": dropped}
