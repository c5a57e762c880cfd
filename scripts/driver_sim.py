"""Simulate the spark-graft driver against __spark_entry__.py.

Drives the repo's public surface the way the real driver does:
  t1 smoke : entry(spark) at sf0.001 -> must return >0 rows, stable schema
  t2 oracle: each queries()[name] at sf0.01 vs oracle_sql()[name] in DuckDB
             (row-count + schema + order-insensitive value compare)

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.sources import TESTDATA_TABLES  # noqa: E402


def norm_cell(v):
    # Wrap as (0,"") for NULL / (1, value) otherwise so rows with NULLs
    # still sort (None has no ordering vs int/str in Python).
    if v is None:
        return (0, "")
    if isinstance(v, float):
        return (1, "NaN") if math.isnan(v) else (1, round(v, 9))
    if hasattr(v, "isoformat"):
        return (1, v.isoformat())
    if isinstance(v, list):
        return (1, tuple(norm_cell(x) for x in v))
    if isinstance(v, dict):
        return (1, tuple(sorted((k, norm_cell(x)) for k, x in v.items())))
    if isinstance(v, bool):
        return (1, int(v))
    if isinstance(v, bytes):
        return (1, v.hex())
    return (1, v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    spark = get_spark(app_name="driver-sim")

    # ---- t1 smoke ----
    t0 = time.time()
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"t1 smoke: entry() -> {len(rows)} rows, schema={df.columns} "
          f"({time.time()-t0:.1f}s)")
    assert len(rows) > 0, "t1 FAIL: entry() returned 0 rows"

    # ---- t2 oracle ----
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracle_sql keys missing from queries(): {extra}"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if name not in oracles:
                print(f"  ~ {name}: rows-only check, {len(srows)} rows "
                      f"({time.time()-t0:.1f}s)")
                n_rowsonly += 1
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            status = []
            if sorted(scols) != sorted(ocols):
                status.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
            if len(srows) != len(orows):
                status.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
            if not status:
                sn, on = norm_rows(scols, srows), norm_rows(ocols, orows)
                if sn != on:
                    diff = next((i, a, b) for i, (a, b) in enumerate(zip(sn, on)) if a != b)
                    status.append(f"values differ at row {diff[0]}:\n"
                                  f"      spark ={diff[1]}\n      oracle={diff[2]}")
            if status:
                n_fail += 1
                print(f"  ✗ {name}: " + "; ".join(status))
            else:
                n_pass += 1
                print(f"  ✓ {name}: {len(srows)} rows hash-match "
                      f"({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"  ✗ {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
    print(f"t2 oracle: {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
