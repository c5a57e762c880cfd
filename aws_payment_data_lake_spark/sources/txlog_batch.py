"""Batch `spark.read.format("txlog")` (VERDICT r10 #3) — reading an
ACID table from PLAIN Spark, no package import required.

The interop story so far was the spec (sources/TXLOG_FORMAT.md), an
independent script reader (scripts/txlog_reader.py), and the
streaming feed (txlog_stream.py). This closes the batch half: any
Spark session that registers this Python Data Source (one call, or a
cluster-wide ``spark.sql.dataSources`` package) reads a txlog table
by path with

    spark.read.format("txlog").option("path", p)
        [.option("versionAsOf", n) | .option("timestampAsOf", ts)]
        .load()

matching ``TxnTable.snapshot()`` row-for-row: time travel, column
mapping, schema evolution (null-fill + safe upcasts via the feed's
head-schema reconciliation, reconciled against the PINNED version's
schema), deletion vectors applied per file, and external files
(shallow clones) followed by absolute path.

Scale + pruning: planning is driver-side log metadata (KBs); each
live file is one input partition, so parallelism is file-granular
like a native scan. Predicate pushdown lands as FILE SKIPPING: Spark
4.1's Python Data Source ``pushFilters`` hands the reader its
comparison filters, which prune partitions against the log's footer
min/max stats — the same Iceberg-style skip ``TxnTable.scan()``
does — and every filter is returned "unsupported" so Spark still
applies it row-level (the stats cut I/O, never correctness).
Executors read parquet via Arrow with zero Python row loops; DV
anti-filtering is a vectorized ``is_in`` mask on the row index.
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from aws_payment_data_lake_spark.sources.txlog import TxnTable
from aws_payment_data_lake_spark.sources.txlog_stream import (
    reconcile_arrow,
)

SOURCE_NAME = "txlog"


class _SnapPart(InputPartition):
    def __init__(self, path: str, key: str, schema_json: str | None,
                 mapping: dict, dv_files: list[str]) -> None:
        self.path = path              # absolute data file path
        self.key = key                # the file's LOG key (DV target)
        self.schema_json = schema_json
        self.mapping = mapping
        self.dv_files = dv_files      # absolute sidecar paths


class _Pinned:
    """Driver-side snapshot resolver (TxnTable's filesystem half; no
    SparkSession — runs inside the data-source planner)."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError(
                "format('txlog') requires .option('path', ...)")
        self.table = TxnTable(None, path)
        ver = options.get("versionasof", options.get("versionAsOf"))
        ts = options.get("timestampasof", options.get("timestampAsOf"))
        if ver is not None and ts is not None:
            raise ValueError("pass versionAsOf OR timestampAsOf, "
                             "not both")
        if ts is not None:
            try:
                epoch = float(ts)
            except ValueError:
                d = dt.datetime.fromisoformat(str(ts))
                if d.tzinfo is None:
                    d = d.replace(tzinfo=dt.timezone.utc)
                epoch = d.timestamp()
            ver = self.table.version_at(epoch)
        self.snap = self.table._replay(
            int(ver) if ver is not None else None)

    def schema(self) -> StructType:
        return self.snap.schema or StructType([])

    def parts(self, keep: set[str] | None = None) -> list[_SnapPart]:
        snap = self.snap
        root = os.path.abspath(self.table.path)
        out = []
        for key in sorted(snap.live):
            if keep is not None and key not in keep:
                continue
            p = key if os.path.isabs(key) else os.path.join(root, key)
            dvs = [f if os.path.isabs(f) else os.path.join(root, f)
                   for f in snap.dvs.get(key, [])]
            out.append(_SnapPart(p, key, snap.schema_json,
                                 dict(snap.column_mapping), dvs))
        return out


def _stats_keep(snap, bounds: dict[str, list]) -> set[str]:
    """Files whose footer [min,max] can satisfy every pushed bound —
    TxnTable._overlaps generalized to a filter list. Files missing
    stats for a column are conservatively kept."""
    keep = set()
    for key, a in snap.live.items():
        ok = True
        for col, (op, val) in bounds.items():
            mm = a.stats.get(col)
            if not mm or mm[0] is None:
                continue
            lo, hi = mm
            try:
                if ((op == "=" and not (lo <= val <= hi))
                        or (op == ">" and not (hi > val))
                        or (op == ">=" and not (hi >= val))
                        or (op == "<" and not (lo < val))
                        or (op == "<=" and not (lo <= val))
                        or (op == "in"
                            and not any(lo <= v <= hi for v in val))):
                    ok = False
                    break
            except TypeError:
                continue   # filter/stats type mismatch (e.g. a date
                # literal vs JSON-string stats): keep the file — the
                # stats cut I/O only, Spark's re-applied filter is
                # the correctness
        if ok:
            keep.add(key)
    return keep


class _SnapshotReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = options
        self._pinned = _Pinned(options)
        self._bounds: dict[str, list] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Record comparison filters for footer-stats FILE SKIPPING,
        then hand every filter back as unsupported — Spark re-applies
        them row-level, so the stats only ever cut I/O."""
        snap = self._pinned.snap
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr and len(attr) == 1:
                col = snap.phys(attr[0])   # stats keys are PHYSICAL
                if isinstance(f, EqualTo):
                    self._bounds[col] = ["=", f.value]
                elif isinstance(f, GreaterThan):
                    self._bounds[col] = [">", f.value]
                elif isinstance(f, GreaterThanOrEqual):
                    self._bounds[col] = [">=", f.value]
                elif isinstance(f, LessThan):
                    self._bounds[col] = ["<", f.value]
                elif isinstance(f, LessThanOrEqual):
                    self._bounds[col] = ["<=", f.value]
                elif isinstance(f, In):
                    self._bounds[col] = ["in", list(f.value)]
            yield f                        # all re-applied by Spark

    def partitions(self) -> list[InputPartition]:
        keep = (_stats_keep(self._pinned.snap, self._bounds)
                if self._bounds else None)
        return (self._pinned.parts(keep)
                or [_SnapPart("", "", None, {}, [])])

    def read(self, partition: _SnapPart) -> Iterator:
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        if partition.dv_files:
            dead = set()
            for f in partition.dv_files:
                dv = pq.read_table(f, columns=["target", "pos"])
                mask = pc.equal(dv.column("target"),
                                pa.scalar(partition.key))
                dead.update(dv.filter(mask).column("pos").to_pylist())
            if dead:
                idx = pa.array(range(table.num_rows), type=pa.int64())
                alive = pc.invert(pc.is_in(
                    idx, value_set=pa.array(sorted(dead),
                                            type=pa.int64())))
                table = table.filter(alive)
        table = reconcile_arrow(table, partition.schema_json,
                                partition.mapping)
        yield from table.to_batches()


class TxlogDataSource(DataSource):
    """`format("txlog")`: batch snapshot reads with time travel.
    Options: path (required), versionAsOf | timestampAsOf (unix
    seconds or ISO timestamp)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        return _Pinned(self.options).schema()

    def reader(self, schema) -> DataSourceReader:
        return _SnapshotReader(self.options)


def register_txlog_source(spark: SparkSession) -> None:
    """Idempotent per-session registration. Python-data-source filter
    pushdown is opt-in (Spark 4.1) and a reader implementing
    pushFilters REFUSES to plan while it is off — so registration
    turns it on (runtime conf, session-scoped). A consumer
    registering the class by hand with the conf off gets Spark's own
    instructive DATA_SOURCE_PUSHDOWN_DISABLED error."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxlogDataSource)


def read_txlog(spark: SparkSession, path: str,
               version: int | None = None,
               timestamp: Any | None = None):
    register_txlog_source(spark)
    r = spark.read.format(SOURCE_NAME).option("path", path)
    if version is not None:
        r = r.option("versionAsOf", str(version))
    if timestamp is not None:
        r = r.option("timestampAsOf", str(timestamp))
    return r.load()
