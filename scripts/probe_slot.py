"""Time one bench slot in isolation (noop sink, N runs) — the guide §1
measurement harness for this round's probes.

Usage: SPARK_GRAFT_CPUS=8 python scripts/probe_slot.py <slot> [runs]
Prints per-run seconds and the per-phase drain after each run.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_payment_data_lake_spark import queries as registry  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402
from aws_payment_data_lake_spark.telemetry import (  # noqa: E402
    drain_phases,
    drain_stats,
    drain_store_builds,
)

import bench  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"probe-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {n: s.fn for n, s in registry.all_queries().items()} | bench._extra_fns()
    # warm-up, same as bench.py
    bench.materialize(fns["q1_pricing_summary"](spark, sf_dir))
    bench.materialize(fns["multimodal_frame_sample"](spark, sf_dir))
    for i in range(runs):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"probe:{name}:run{i}")
        bench.materialize(fns[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        ph = drain_phases()
        sb = drain_store_builds()
        drain_stats()
        print(f"run{i}: {dt:.3f}s phases={ph.get(name, ph)} builds={sb}",
              flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
