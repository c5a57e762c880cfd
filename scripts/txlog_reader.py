"""Independent txlog reader: replays the ACID table format from
`sources/TXLOG_FORMAT.md` ALONE, using pyarrow + DuckDB — **zero
imports from aws_payment_data_lake_spark** (VERDICT r8 #6).

Purpose: the interop proof. `tests/test_txlog_interop.py` drives a
full lifecycle through the Spark-side writer and asserts this reader's
replay hash-matches `TxnTable.snapshot()` at every version. If either
the writer or the spec drifts, that test goes red — the spec stays
load-bearing instead of decorative.

Covers every reader-visible spec feature: ordered JSON commits,
checkpoint + `_last_checkpoint` fast replay with corrupt-checkpoint
fallback, add/remove, schema evolution, deletion-vector sidecars
(raw-row positions, LEFT ANTI application, retirement on rewrite),
restore's `dv_state`, column mapping (physical scan names -> logical
projection, retired names), layout-only ops, and the metadata-only
row count (sum of live rows minus dv_dead).
"""

from __future__ import annotations

import json
import os
from typing import Any

_LOG = "_txlog"

# Protocol support (spec §Protocol): the reader features whose on-disk
# semantics this reader implements. A table demanding min_reader > 1
# or a feature outside this set MUST be refused — reading on anyway
# would silently misinterpret bytes (the spec's compatibility rule).
_READER_VERSION = 1
_READER_FEATURES = frozenset({
    "column_mapping", "deletion_vectors", "type_widening",
    "external_files",
})


class ProtocolError(RuntimeError):
    """Table requires reader capabilities this reader lacks."""

# Spark simpleString -> DuckDB type, for NULL-filling columns a file
# predates and for casting projections. Decimal passes through below.
_TYPES = {
    "long": "BIGINT", "integer": "INTEGER", "int": "INTEGER",
    "short": "SMALLINT", "byte": "TINYINT", "double": "DOUBLE",
    "float": "FLOAT", "string": "VARCHAR", "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "date": "DATE", "binary": "BLOB",
}


def _duck_type(spark_type: Any) -> str:
    if isinstance(spark_type, str):
        if spark_type.startswith("decimal"):
            return spark_type.upper()
        return _TYPES.get(spark_type, "VARCHAR")
    return "VARCHAR"        # nested types: out of the interop surface


class TxlogState:
    """Replayed snapshot state, exactly the spec's reader rules."""

    def __init__(self) -> None:
        self.version = -1
        self.schema_json: str | None = None
        self.live: dict[str, dict] = {}          # rel -> add entry
        self.dvs: dict[str, list[str]] = {}      # rel -> sidecar rels
        self.dv_dead: dict[str, int] = {}
        self.column_mapping: dict[str, str] = {}
        self.dropped_physical: list[str] = []
        self.partition_by: list[str] = []
        self.constraints: dict[str, str] = {}
        self.txns: dict[str, int] = {}
        self.protocol: dict | None = None    # None = legacy version-1

    @property
    def fields(self) -> list[tuple[str, Any]]:
        if not self.schema_json:
            return []
        return [(f["name"], f["type"])
                for f in json.loads(self.schema_json)["fields"]]

    def phys(self, col: str) -> str:
        return self.column_mapping.get(col, col)


class IndependentTxlogReader:
    def __init__(self, table_path: str) -> None:
        self.path = os.path.abspath(table_path)
        self.log = os.path.join(self.path, _LOG)

    # ------------------------------------------------------------ log
    def versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.log):
            if n.endswith(".json") and not n.startswith("."):
                try:
                    out.append(int(n[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def _commit(self, v: int) -> dict:
        with open(os.path.join(self.log, f"{v:020d}.json")) as f:
            return json.load(f)

    def _checkpoint(self, upto: int) -> TxlogState | None:
        """Newest usable checkpoint at version <= upto (spec: corrupt
        or missing checkpoints fall back to full JSON replay)."""
        try:
            import pyarrow.parquet as pq
            with open(os.path.join(self.log, "_last_checkpoint")) as f:
                last = json.load(f)
            v, parts = last["version"], int(last.get("parts", 1))
            if v > upto:
                return None
            if parts == 1:
                ck = os.path.join(self.log,
                                  f"{v:020d}.checkpoint.parquet")
                if not os.path.isfile(ck):
                    return None
                t = pq.read_table(ck)
                rows = t.to_pylist()
            else:                       # multi-part (spec §Checkpoint)
                paths = [os.path.join(
                    self.log, f"{v:020d}.checkpoint.{i:05d}.parquet")
                    for i in range(parts)]
                if not all(os.path.isfile(p) for p in paths):
                    return None         # torn -> full JSON replay
                t = pq.read_table(paths[0])   # meta rides every part
                rows = []
                for p in paths:
                    rows.extend(pq.read_table(p).to_pylist())
            meta = json.loads(t.schema.metadata[b"txlog"].decode())
            st = TxlogState()
            st.version = v
            st.schema_json = meta["schema_json"]
            st.live = {r["path"]: {"path": r["path"], "rows": r["rows"],
                                   "bytes": r["bytes"],
                                   "stats": json.loads(r["stats"])}
                       for r in rows}
            st.dvs = {k: list(x) for k, x in meta.get("dvs", {}).items()}
            st.dv_dead = {k: int(x) for k, x
                          in meta.get("dv_dead", {}).items()}
            st.column_mapping = dict(meta.get("column_mapping", {}))
            st.dropped_physical = list(meta.get("dropped_physical", []))
            st.partition_by = list(meta.get("partition_by", []))
            st.constraints = dict(meta.get("constraints", {}))
            st.txns = dict(meta.get("txns", {}))
            st.protocol = meta.get("protocol")
            return st
        except (OSError, KeyError, ValueError):
            return None

    def replay(self, version: int | None = None,
               use_checkpoint: bool = True) -> TxlogState:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no txlog at {self.path}")
        upto = vs[-1] if version is None else version
        st = self._checkpoint(upto) if use_checkpoint else None
        if st is None:
            st = TxlogState()
        for v in vs:
            if v <= st.version or v > upto:
                continue
            c = self._commit(v)
            if c.get("schema_json"):
                st.schema_json = c["schema_json"]
            if "partition_by" in c:
                st.partition_by = list(c["partition_by"] or [])
            if "constraints" in c:
                st.constraints = dict(c["constraints"])
            if "column_mapping" in c:
                st.column_mapping = dict(c["column_mapping"])
            if "dropped_physical" in c:
                st.dropped_physical = list(c["dropped_physical"])
            if "protocol" in c:             # full replace, monotone
                st.protocol = dict(c["protocol"])
            for rel in c.get("remove", []):
                st.live.pop(rel, None)
                st.dvs.pop(rel, None)       # rewrite retires DVs
                st.dv_dead.pop(rel, None)
            for a in c.get("add", []):
                st.live[a["path"]] = a
            dv = c.get("dv")
            if dv:
                for rel, n in dv["per_target"].items():
                    if rel in st.live:
                        st.dvs.setdefault(rel, []).extend(dv["files"])
                        st.dv_dead[rel] = st.dv_dead.get(rel, 0) + int(n)
            if "dv_state" in c:             # restore replaces outright
                st.dvs = {k: list(x) for k, x
                          in c["dv_state"]["dvs"].items()}
                st.dv_dead = {k: int(x) for k, x
                              in c["dv_state"]["dv_dead"].items()}
            if c.get("txns_reset"):   # REPLACE resets ingest
                st.txns = {}          # idempotence state (spec §Replay)
            txn = c.get("txn")
            if txn:
                st.txns[txn["app"]] = max(st.txns.get(txn["app"], -1),
                                          int(txn["batch"]))
            st.version = v
        # spec §Protocol: validate the FINAL protocol (monotone, so it
        # dominates the prefix) and refuse what we cannot interpret
        if st.protocol is not None:
            if int(st.protocol.get("min_reader", 1)) > _READER_VERSION:
                raise ProtocolError(
                    f"{self.path}: needs reader version "
                    f"{st.protocol['min_reader']}, have {_READER_VERSION}")
            unknown = (set(st.protocol.get("reader_features", []))
                       - _READER_FEATURES)
            if unknown:
                raise ProtocolError(
                    f"{self.path}: unimplemented reader feature(s) "
                    f"{sorted(unknown)}")
        return st

    # ----------------------------------------------------------- data
    def count_rows(self, version: int | None = None) -> int:
        """The metadata-only COUNT(*): footer row counts from the log
        minus deletion-vector dead rows; zero files opened."""
        st = self.replay(version)
        return (sum(a["rows"] for a in st.live.values())
                - sum(st.dv_dead.values()))

    def snapshot_sql(self, con, version: int | None = None,
                     use_checkpoint: bool = True) -> str:
        """Register the snapshot in a DuckDB connection; returns a SQL
        SELECT producing the LOGICAL rows (schema order, DVs applied,
        column mapping resolved)."""
        st = self.replay(version, use_checkpoint=use_checkpoint)
        files = [os.path.join(self.path, r) for r in sorted(st.live)]
        if not files:
            cols = ", ".join(
                f'CAST(NULL AS {_duck_type(t)}) AS "{n}"'
                for n, t in st.fields)
            return f"SELECT {cols} WHERE false"
        def lit(s: str) -> str:
            return "'" + s.replace("'", "''") + "'"

        flist = "[" + ", ".join(lit(f) for f in files) + "]"
        con.execute(f"CREATE OR REPLACE TEMP VIEW __txr_raw AS "
                    f"SELECT * FROM read_parquet({flist}, "
                    f"union_by_name=true, filename=true, "
                    f"file_row_number=true)")
        dv_files = sorted({f for fs in st.dvs.values() for f in fs})
        if dv_files:
            dlist = "[" + ", ".join(
                lit(os.path.join(self.path, f)) for f in dv_files) + "]"
            # spec §Protocol external_files: an ABSOLUTE target IS the
            # scan filename; relative targets resolve under the root
            con.execute(
                f"CREATE OR REPLACE TEMP VIEW __txr_dead AS "
                f"SELECT CASE WHEN target LIKE '/%' THEN target "
                f"ELSE {lit(self.path)} || '/' || target END AS fname, "
                f"pos FROM read_parquet({dlist})")
            base = ("SELECT * FROM __txr_raw r ANTI JOIN __txr_dead d "
                    "ON r.filename = d.fname "
                    "AND r.file_row_number = d.pos")
        else:
            base = "SELECT * FROM __txr_raw"
        have = {r[0] for r in con.execute(
            "SELECT name FROM pragma_table_info('__txr_raw')"
        ).fetchall()}
        proj = []
        for lname, ltype in st.fields:
            p = st.phys(lname)
            if p in have:
                proj.append(f'"{p}" AS "{lname}"')
            else:       # file generation predates the column
                proj.append(f'CAST(NULL AS {_duck_type(ltype)}) '
                            f'AS "{lname}"')
        return f"SELECT {', '.join(proj)} FROM ({base})"

    def snapshot_rows(self, version: int | None = None,
                      use_checkpoint: bool = True) -> list[tuple]:
        import duckdb
        con = duckdb.connect()
        try:
            sql = self.snapshot_sql(con, version,
                                    use_checkpoint=use_checkpoint)
            return con.execute(sql).fetchall()
        finally:
            con.close()


if __name__ == "__main__":      # ad-hoc: python txlog_reader.py <table>
    import sys

    r = IndependentTxlogReader(sys.argv[1])
    st = r.replay()
    print(json.dumps({
        "version": st.version,
        "files": len(st.live),
        "rows_metadata_only": r.count_rows(),
        "columns": [n for n, _ in st.fields],
        "column_mapping": st.column_mapping,
        "dv_dead": sum(st.dv_dead.values()),
        "protocol": st.protocol,
    }, indent=2))
