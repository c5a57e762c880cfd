"""Round-12 scale probe for the NAMESPACED catalog: the qualified
key layer, persistent views, and per-database listing must stay
metadata-cheap as the catalog grows. At 50 / 200 / 500 tables spread
over 10 databases (plus N/10 persistent views):

  register_total    N durable registrations (CAS commits, full-map
                    snapshots) + N/10 view creations;
  cold_load         a FRESH catalog construction (one file read,
                    whatever N is);
  resolve_qualified one warm db.table resolution + per-sql() sync;
  show_in_db        SHOW TABLES IN db (filters N entries);
  view_bind         one view expansion through _bind_reads (temp
                    view create + analysis — the read-time price of
                    never-stale views).

Writes CATALOG_SLOPE_r13.json with env load stamps (r13: same probe re-run through the shared-lexer SQL surface). Entries point at
synthetic paths; view bodies are literal SELECTs so the probe
isolates CATALOG cost from table I/O."""

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
from aws_payment_data_lake_spark.telemetry import load_stamp  # noqa: E402
from aws_payment_data_lake_spark.sources.txsql import (  # noqa: E402
    LakehouseCatalog,
)

N_DBS = 10


def main() -> None:
    spark = get_spark(app_name="catalog-probe-r12")
    out = {"points": [], "env": {"load_start": load_stamp()}}
    for n in (50, 200, 500):
        wh = tempfile.mkdtemp(prefix=f"catprobe12_{n}-")
        try:
            cat = LakehouseCatalog(spark, warehouse=wh)
            for d in range(N_DBS):
                cat.create_database(f"db{d}")
            t0 = time.perf_counter()
            for i in range(n):
                cat.register(f"db{i % N_DBS}.tbl_{i:04d}",
                             f"/data/synth/t{i}")
            reg = time.perf_counter() - t0
            nview = max(1, n // 10)
            t0 = time.perf_counter()
            for i in range(nview):
                cat.register_view(f"db{i % N_DBS}.v_{i:04d}",
                                  f"SELECT {i} AS k")
            vreg = time.perf_counter() - t0
            t0 = time.perf_counter()
            cold = LakehouseCatalog(spark, warehouse=wh)
            cold_s = time.perf_counter() - t0
            assert len(cold._tables) == n
            assert len(cold._views) == nview
            t0 = time.perf_counter()
            for _ in range(20):
                cold.table(f"db{(n // 2) % N_DBS}.tbl_{n // 2:04d}")
                cold._refresh()          # the per-sql() sync path
            resolve = (time.perf_counter() - t0) / 20
            t0 = time.perf_counter()
            in_db = cold.sql("SHOW TABLES IN db3").count()
            show = time.perf_counter() - t0
            want = (sum(1 for i in range(n) if i % N_DBS == 3)
                    + sum(1 for i in range(nview) if i % N_DBS == 3))
            assert in_db == want, (in_db, want)
            t0 = time.perf_counter()
            got = cold.sql("SELECT * FROM db1.v_0001"
                           if nview > 1 else
                           "SELECT * FROM db0.v_0000").collect()
            vbind = time.perf_counter() - t0
            assert len(got) == 1
            out["points"].append({
                "tables": n, "views": nview, "databases": N_DBS,
                "register_ms_each": round(1000 * reg / n, 2),
                "view_register_ms_each": round(1000 * vreg / nview, 2),
                "cold_load_sec": round(cold_s, 4),
                "resolve_qualified_ms": round(1000 * resolve, 3),
                "show_in_db_sec": round(show, 3),
                "view_bind_sec": round(vbind, 3)})
            print(out["points"][-1])
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    p = out["points"]
    out["verdict"] = {
        "cold_load_flat": p[-1]["cold_load_sec"]
        < 5 * max(p[0]["cold_load_sec"], 0.005),
        "resolve_cheap": p[-1]["resolve_qualified_ms"] < 10.0,
        # the view price is analysis, not catalog size: binding at
        # 500 tables must cost no more than 3x the 50-table bind
        "view_bind_flat": p[-1]["view_bind_sec"]
        < 3 * max(p[0]["view_bind_sec"], 0.05),
    }
    out["env"]["load_end"] = load_stamp()
    with open(os.path.join(REPO, "CATALOG_SLOPE_r13.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["verdict"]))


if __name__ == "__main__":
    main()
