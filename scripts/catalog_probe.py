"""Scale probe for the persistent catalog (sources/catalog.py): the
Glue-Data-Catalog stand-in must stay metadata-cheap as the table
count grows. Measures, at 50 / 200 / 500 registered tables:

  register_total  N durable registrations (N CAS commits, full-map
                  snapshots — cost grows with map size, the knee the
                  probe watches);
  cold_load       a FRESH catalog construction (head readdir + ONE
                  file read, whatever N is);
  resolve         one sql() name resolution on a warm catalog (the
                  head-version short-circuit: a readdir, no file
                  read);
  show_tables     SHOW TABLES materialization.

Writes CATALOG_SLOPE_r11.json. No Spark tables are created — entries
point at synthetic paths; the probe isolates CATALOG cost from table
I/O (sql() resolution is exercised via SHOW TABLES + table(), not a
scan)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.sources.txsql import (  # noqa: E402
    LakehouseCatalog,
)


def main() -> None:
    spark = get_spark(app_name="catalog-probe")
    out = {"points": []}
    for n in (50, 200, 500):
        wh = tempfile.mkdtemp(prefix=f"catprobe{n}-")
        try:
            cat = LakehouseCatalog(spark, warehouse=wh)
            t0 = time.perf_counter()
            for i in range(n):
                cat.register(f"tbl_{i:04d}", f"/data/synth/t{i}")
            reg = time.perf_counter() - t0
            t0 = time.perf_counter()
            cold = LakehouseCatalog(spark, warehouse=wh)
            cold_s = time.perf_counter() - t0
            assert len(cold._tables) == n
            t0 = time.perf_counter()
            for _ in range(20):
                cold.table(f"tbl_{n // 2:04d}")
                cold._refresh()          # the per-sql() sync path
            resolve = (time.perf_counter() - t0) / 20
            t0 = time.perf_counter()
            assert cold.sql("SHOW TABLES").count() == n
            show = time.perf_counter() - t0
            out["points"].append({
                "tables": n,
                "register_total_sec": round(reg, 3),
                "register_ms_each": round(1000 * reg / n, 2),
                "cold_load_sec": round(cold_s, 4),
                "resolve_ms": round(1000 * resolve, 3),
                "show_tables_sec": round(show, 3)})
            print(out["points"][-1])
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    p = out["points"]
    out["verdict"] = {
        # cold load is ONE file read: must stay ~flat (10x tables
        # allowed 5x wall before this trips)
        "cold_load_flat": p[-1]["cold_load_sec"]
        < 5 * max(p[0]["cold_load_sec"], 0.005),
        # warm resolve is a readdir: sub-millisecond-ish at any N
        "resolve_cheap": p[-1]["resolve_ms"] < 10.0,
    }
    with open(os.path.join(REPO, "CATALOG_SLOPE_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["verdict"]))


if __name__ == "__main__":
    main()
