"""The ACID table as a SOURCE: `format("txlog_feed")` reads a
sources/txlog.py table either as a batch snapshot or as a structured
stream of its commit log — the Delta "table streaming / change data
feed" capability (Armbrust et al., VLDB 2020 §4.3) on the engine's own
format, built on the Spark 4 Python Data Source API like the synthetic
payments source (pydatasource.py) and the audit sink (audit_sink.py).

Stream semantics:
  * Offsets are LOG VERSIONS — `{"version": N}` means "commits < N
    processed". The log is append-only and commit files are immutable,
    so a replayed offset range re-reads byte-identical files:
    exactly-once content with any idempotent sink, with zero
    source-side state beyond the checkpointed offset.
  * Each micro-batch emits the rows ADDED by the commits in its
    version range, tagged `_commit_version`. Layout-only commits
    (compact / optimize) are SKIPPED — their adds rewrite existing
    rows without changing content (Delta's dataChange=false), and a
    feed that re-emitted the whole table after every OPTIMIZE would be
    useless. Merge/delete rewrites do re-emit surviving rows of
    touched files (the same rewrite amplification Delta CDF has
    without row tracking; documented, bounded by file granularity).
  * `startingVersion` picks up mid-log (default 0 = full history).

Scale: planning reads only the commit JSONs in the version range
(driver-side metadata, ~KB per commit); each ADDED FILE becomes one
input partition, so read parallelism is file-granular exactly like a
native parquet scan, and executors read parquet via Arrow with no
Python row loop."""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from aws_payment_data_lake_spark.sources.txlog import TxnTable

SOURCE_NAME = "txlog_feed"


class _FilePart(InputPartition):
    def __init__(self, path: str, version: int,
                 schema_json: str | None = None,
                 mapping: dict | None = None) -> None:
        self.path = path
        self.version = version
        self.schema_json = schema_json
        self.mapping = mapping or {}


def reconcile_arrow(table, schema_json: str | None, mapping: dict):
    """RECONCILE one staged parquet file's Arrow table to a declared
    head schema — what lets one pinned schema span the table's whole
    history: physical file columns alias back to logical names
    (column mapping), columns a file predates null-fill, retired
    physical columns drop, and safely-widened types (int32 under a
    bigint schema) Arrow-cast up — the same upcasts the pinned-schema
    batch scan performs. An impossible cast fails loudly. Shared by
    the stream feed and the batch `format("txlog")` reader."""
    import json as _json

    import pyarrow as pa

    if not schema_json:
        return table
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType as _ST

    declared = _ST.fromJson(_json.loads(schema_json))
    names, cols = [], []
    for f in declared.fields:
        at = to_arrow_type(f.dataType)
        if pa.types.is_timestamp(at) and at.tz is None:
            at = pa.timestamp(at.unit, tz="UTC")
        phys = (mapping or {}).get(f.name, f.name)
        if phys in table.column_names:
            col = table.column(phys)
            if col.type != at:
                col = col.cast(at)       # safe widenings; else raises
        else:
            col = pa.nulls(table.num_rows, type=at)
        names.append(f.name)
        cols.append(col)
    return pa.table(cols, names=names)


def _read_file_batches(part: _FilePart) -> Iterator:
    """One staged parquet file -> Arrow batches reconciled to the
    feed's declared schema + the constant _commit_version column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = reconcile_arrow(pq.read_table(part.path),
                            part.schema_json, part.mapping)
    col = pa.array([part.version] * table.num_rows, type=pa.int64())
    table = table.append_column("_commit_version", col)
    yield from table.to_batches()


class _Log:
    """Driver-side log inspector shared by the batch and stream
    readers (TxnTable's filesystem half; no SparkSession needed)."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("txlog_feed requires .option('path', ...)")
        self.table = TxnTable(None, path)

    def commit_adds(self, lo: int, hi: int) -> list[_FilePart]:
        """File partitions for commits in [lo, hi), skipping
        layout-only ops. Every partition carries the HEAD schema +
        column mapping so read-side reconciliation aliases physical
        names and null-fills/upcasts historical files."""
        snap = self.table._replay()
        parts: list[_FilePart] = []
        for v in self.table._versions_on_disk():
            if not lo <= v < hi:
                continue
            with open(self.table._commit_path(v)) as f:
                c = json.load(f)
            if c.get("op") in TxnTable._LAYOUT_OPS:
                continue
            parts.extend(
                _FilePart(os.path.join(self.table.path, a["path"]), v,
                          snap.schema_json, dict(snap.column_mapping))
                for a in c.get("add", []))
        return parts

    def live_parts(self) -> list[_FilePart]:
        snap = self.table._replay()
        added_at: dict[str, int] = {}
        for v in self.table._versions_on_disk():
            with open(self.table._commit_path(v)) as f:
                c = json.load(f)
            for a in c.get("add", []):
                added_at[a["path"]] = v
        return [_FilePart(os.path.join(self.table.path, p),
                          added_at.get(p, snap.version),
                          snap.schema_json, dict(snap.column_mapping))
                for p in sorted(snap.live)]

    def schema(self) -> StructType:
        base = self.table._replay().schema or StructType([])
        return StructType(list(base.fields)
                          + [StructField("_commit_version", LongType())])


class _FeedBatchReader(DataSourceReader):
    """Batch mode: the CURRENT snapshot, each row tagged with the
    commit that added its file."""

    def __init__(self, options: dict) -> None:
        self.options = options

    def partitions(self) -> list[InputPartition]:
        return _Log(self.options).live_parts() or [_FilePart("", -1)]

    def read(self, partition: _FilePart) -> Iterator:
        if partition.version < 0:
            return
        yield from _read_file_batches(partition)


class _FeedStreamReader(DataSourceStreamReader):
    """Stream legs always reconcile to the CURRENT HEAD schema (see
    _read_file_batches), which equals the schema Spark pinned at
    query start for as long as no schema change lands mid-stream.
    A mid-stream change makes the reconciled batches disagree with
    the pinned schema, failing the query once — and a RESTART always
    recovers: the re-pinned schema and the reconcile target are both
    the new head, and every historical file (pre-evolution, renamed,
    narrower types) replays under it via null-fill/alias/upcast. The
    restart-heals contract is test-pinned; offsets stay the plain
    {'version': n} cursor, so existing checkpoints keep working."""

    def __init__(self, options: dict) -> None:
        self.options = options
        self.start = int(options.get("startingVersion", 0))

    def initialOffset(self) -> dict:
        return {"version": self.start}

    def latestOffset(self) -> dict:
        log = _Log(self.options)
        vs = log.table._versions_on_disk()
        return {"version": (vs[-1] + 1) if vs else self.start}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts = _Log(self.options).commit_adds(int(start["version"]),
                                               int(end["version"]))
        # Spark requires >= 1 partition per batch; empty ranges (e.g.
        # a version window holding only layout-only commits) emit a
        # no-op sentinel
        return parts or [_FilePart("", -1)]

    def read(self, partition: _FilePart) -> Iterator:
        if partition.version < 0:
            return
        yield from _read_file_batches(partition)

    def commit(self, end: dict) -> None:
        pass                            # offsets live in the checkpoint


class TxlogFeedDataSource(DataSource):
    """`format("txlog_feed")`, options: path (required),
    startingVersion (stream). Schema = table schema + _commit_version."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> StructType:
        return _Log(self.options).schema()

    def reader(self, schema) -> DataSourceReader:
        return _FeedBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _FeedStreamReader(self.options)


def register_txlog_feed(spark: SparkSession) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(TxlogFeedDataSource)


def read_table_feed(spark: SparkSession, path: str):
    """Batch: current snapshot with _commit_version per row."""
    register_txlog_feed(spark)
    return spark.read.format(SOURCE_NAME).option("path", path).load()


def stream_table_feed(spark: SparkSession, path: str,
                      starting_version: int = 0):
    """Stream: every future (and, from startingVersion, past) commit's
    added rows as micro-batches."""
    register_txlog_feed(spark)
    return (spark.readStream.format(SOURCE_NAME)
            .option("path", path)
            .option("startingVersion", str(starting_version)).load())
