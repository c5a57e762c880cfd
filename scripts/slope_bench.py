"""Scale-slope probe: time the most expensive registered queries at
sf0.1 (driver data) vs a locally generated sf1.0 (scripts/make_sf1.py,
10x rows with linear near-dup density — see that file's docstring for
why a naive copy would fake a quadratic pair blowup).

Near-linear slope (time ratio <= ~12x on 10x data) is the pass bar from
the round-3 verdict; quadratic-by-design queries (brute-force
embedding compare) are named exceptions. One Spark session for all
measurements; each query runs twice per SF and BOTH runs are recorded
— "cold" (first run: shared-store build, JIT, shuffle-file warmup) and
"warm" (second run: steady state) — and the slope table reports both
ratios. Bench-only queries that sit outside the <=50-slot driver
registry (knn_ivf_probe, text_repetition_profile, ...) resolve through
bench.py's extra-query map, so their scale behavior is measured too
(round-4 verdict: the registry-only lookup silently dropped
knn_ivf_probe, the named scale path for embedding_neardup_pairs).

Run: python scripts/slope_bench.py [--queries a,b,c]
Prints one JSON line: {"sf0.1": {...}, "sf1.0": {...}, "slope": {...}}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "corpus_curation_decisions",
    "dedup_simhash",
    "dedup_exact_groups",
    "streaming_windows_live",
    "window_event_analytics",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "embedding_neardup_pairs",
    "knn_ivf_probe",
    "topk_orders_per_customer",
    "text_repetition_profile",
    "dedup_shingle_jaccard",
    "text_decontamination",
    "corpus_mixture_resample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--sf-a", default="/root/testdata/sf0.1")
    ap.add_argument("--sf-b", default=str(REPO / ".localdata" / "sf1.0"))
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", REPO / "__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    import bench
    qs = entry.queries() | bench._extra_fns()

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .appName("slope-bench").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # cold = first run at the SF (includes building the shared MinHash
    # store, the cost whose slope actually matters for the dedup family);
    # warm = second run (steady state, store and page cache hot).
    out: dict = {}
    for sf_dir in (args.sf_a, args.sf_b):
        label = Path(sf_dir).name
        out[label] = {}
        for name in names:
            try:
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                cold = round(time.time() - t0, 3)
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                out[label][name] = {"cold": cold,
                                    "warm": round(time.time() - t0, 3)}
            except Exception as exc:  # fault-isolated like bench.py
                out[label][name] = f"ERR {type(exc).__name__}: {exc}"[:200]
            print(f"  {label} {name}: {out[label][name]}", file=sys.stderr)

    a, b = (out[Path(p).name] for p in (args.sf_a, args.sf_b))
    out["slope"] = {
        n: {k: round(b[n][k] / a[n][k], 2) for k in ("cold", "warm")
            if a[n][k] > 0}
        for n in names
        if isinstance(a.get(n), dict) and isinstance(b.get(n), dict)
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
