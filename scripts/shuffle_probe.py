"""Shuffle-volume probe: measure how many bytes each headline query
actually shuffles at sf0.1, from the Spark UI REST API — the evidence
behind "minimize shuffles", not an .explain argument.

Method: one local session with the UI on; for each query, snapshot the
completed-stage list, run the query through the bench's noop
materializer, then diff the stage list and sum shuffle read/write bytes
and input records of the new stages. Per-query numbers are
attributable because queries run serially in one app. (inputBytes is
NOT reported: the local-FS columnar parquet path under-counts it by
~1000x — measured 17 KB for a 10.8 MB scan — while record counts and
shuffle bytes are exact.)

The status store behind the REST API is fed by the ASYNC listener bus,
so the post-query snapshot drains the bus first (waitUntilEmpty) — a
late stage-completed event would otherwise land in the NEXT query's
diff. Raw byte counts are emitted (plus rounded MB for reading): the
flagship agg's whole point is a KB-scale shuffle, which MB rounding
would erase.

Run: python scripts/shuffle_probe.py [--queries a,b,c] [--sf-dir DIR]
Prints one JSON line: {"<query>": {"shuffle_write_bytes": x,
"shuffle_write_mb": x2, "shuffle_read_bytes": y, "input_records": z,
"n_stages": k}, ...}; failing queries record an "error" entry instead
of aborting the sweep.

Interpretation at 100 TB: shuffle_write ~ the data that crosses the
network per query; a query whose shuffle is a small fraction of its
input scales by scan bandwidth, one whose shuffle ~= input is
re-partition-bound and is where bucketing/broadcast work pays.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = ("q1_pricing_summary,q5_local_supplier_volume,"
           "topk_orders_per_customer,dedup_exact_groups,"
           "dedup_minhash_lsh,text_repetition_profile,"
           "lm_perplexity_quality,knn_ivf_probe,corpus_source_report,"
           "text_decontamination,"
           # round-7 additions
           "quality_model_filter,fuzzy_name_join,cluster_balance_sample,"
           "order_count_histogram,slow_supplier_blame,pysource_payments,"
           "jsonl_events_roundtrip")


def _stages(ui: str, app: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=DEFAULT)
    args = ap.parse_args()

    from bench import _extra_fns, materialize
    from aws_payment_data_lake_spark import queries as registry
    from aws_payment_data_lake_spark.session import get_spark

    spark = get_spark(app_name="shuffle_probe",
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    fns = ({n: s.fn for n, s in registry.all_queries().items()}
           | _extra_fns())

    def _drain_listener_bus() -> None:
        # AppStatusStore is fed asynchronously; flush it so every stage
        # of the query just run is visible before the snapshot (private
        # API, best-effort — a timeout just means the diff may lag one
        # stage, same as before the flush existed)
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(30000)
        except Exception:
            pass

    out = {}
    for name in args.queries.split(","):
        if name not in fns:
            print(f"  skip {name}: unknown", file=sys.stderr)
            continue
        _drain_listener_bus()
        before = _stages(ui, app)
        try:
            materialize(fns[name](spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 - per-query fault isolation
            spark.catalog.clearCache()
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"  {name}: ERR {out[name]['error']}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        _drain_listener_bus()
        after = _stages(ui, app)
        new = [s for sid, s in after.items() if sid not in before]
        mb = 1024.0 * 1024.0
        out[name] = {
            "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in new),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new) / mb, 3),
            "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in new),
            "input_records": sum(s["inputRecords"] for s in new),
            "n_stages": len(new),
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
