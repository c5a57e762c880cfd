"""sf10 slope spot-run (VERDICT r12 #5): extend the scale story one
more decade — the 5 heaviest non-lifecycle-slot queries plus the
medallion cast stage, timed at sf1.0 vs sf10 (100 key-offset replicas
of the driver's sf0.1; scripts/make_sf1.py --replicas 100 — the same
linear-density construction, so a super-linear slope is the QUERY's
doing, not a data artifact).

Method per (query, sf): two runs in one session — "cold" (shared-store
build, JIT, shuffle-file warmup) and "warm" (steady state) — plus the
Spark UI REST stage-diff for shuffle write/read bytes on the warm run
(scripts/shuffle_probe.py's attribution method, incl. the listener-bus
drain). The pass bar mirrors slope_bench.py's: warm wall-time ratio
<= ~12x on 10x data, shuffle bytes scaling ~linearly with input.

Run: python scripts/slope_sf10.py [--sf1 .localdata/sf1.0]
     [--sf10 .localdata/sf10] [--queries a,b,c]
Prints one JSON line -> redirect to SLOPE_sf10_r13.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = ("join_left_outer_order_lines,window_event_analytics,"
                   "scalar_function_gallery,medallion_cast_derive_date,"
                   "topk_orders_per_customer")


def _stages(ui: str, app: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=".localdata/sf1.0")
    ap.add_argument("--sf10", default=".localdata/sf10")
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    args = ap.parse_args()

    from bench import _extra_fns, materialize
    from aws_payment_data_lake_spark import queries as registry
    from aws_payment_data_lake_spark.session import get_spark

    spark = get_spark(app_name="slope_sf10",
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    fns = ({n: s.fn for n, s in registry.all_queries().items()}
           | _extra_fns())

    def drain() -> None:
        try:
            spark.sparkContext._jsc.sc().listenerBus(
            ).waitUntilEmpty(30000)
        except Exception:
            pass

    out: dict = {"sf1": {}, "sf10": {}, "slope": {}}
    for name in args.queries.split(","):
        if name not in fns:
            print(f"  skip {name}: unknown", file=sys.stderr)
            continue
        for sf_key, sf_dir in (("sf1", args.sf1), ("sf10", args.sf10)):
            rec: dict = {}
            try:
                t0 = time.monotonic()
                materialize(fns[name](spark, sf_dir))
                rec["cold_s"] = round(time.monotonic() - t0, 3)
                spark.catalog.clearCache()
                drain()
                before = _stages(ui, app)
                t0 = time.monotonic()
                materialize(fns[name](spark, sf_dir))
                rec["warm_s"] = round(time.monotonic() - t0, 3)
                spark.catalog.clearCache()
                drain()
                new = [s for sid, s in _stages(ui, app).items()
                       if sid not in before]
                rec["shuffle_write_bytes"] = sum(
                    s["shuffleWriteBytes"] for s in new)
                rec["shuffle_read_bytes"] = sum(
                    s["shuffleReadBytes"] for s in new)
                rec["input_records"] = sum(
                    s["inputRecords"] for s in new)
            except Exception as e:  # noqa: BLE001 - fault isolation
                spark.catalog.clearCache()
                rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            out[sf_key][name] = rec
            print(f"  {name}@{sf_key}: {rec}", file=sys.stderr)
        a, b = out["sf1"].get(name, {}), out["sf10"].get(name, {})
        if "warm_s" in a and "warm_s" in b:
            out["slope"][name] = {
                "warm_ratio": round(b["warm_s"] / max(a["warm_s"],
                                                      1e-9), 2),
                "cold_ratio": round(b["cold_s"] / max(a["cold_s"],
                                                      1e-9), 2),
                "shuffle_ratio": round(
                    b["shuffle_write_bytes"]
                    / max(a["shuffle_write_bytes"], 1), 2),
                "linear_ok": b["warm_s"] / max(a["warm_s"],
                                               1e-9) <= 12.0,
            }
    try:
        la = os.getloadavg()
        out["env"] = {"loadavg_1m": round(la[0], 2),
                      "loadavg_5m": round(la[1], 2)}
    except OSError:
        pass
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
