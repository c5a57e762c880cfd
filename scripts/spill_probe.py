"""Memory-pressure probe (VERDICT r10 #8): prove the heavy suite
SPILLS rather than OOMs under a deliberately constrained executor
memory cap — the one scale behavior (memory pressure) the three-SF
hash/slope evidence doesn't exercise.

A subprocess runs the dedup MinHash store build + the ten-variant
medallion lifecycle at sf1.0 (the 10x slice from make_sf1.py) inside
a Spark whose JVM heap and execution-memory fraction are capped far
below the working set; the parent then reads the Spark UI REST API
(/api/v1/.../stages, /executors) for memoryBytesSpilled /
diskBytesSpilled / peakExecutionMemory and writes a SLOPE-style
artifact. Success = rc 0 (no OOM), nonzero spill bytes (the cap
actually bit), and row counts matching an uncapped control run.

Run: python scripts/spill_probe.py [--sf-dir .localdata/sf1.0]
         [--mem 2g] [--fraction 0.3] [--out SPILL_r11.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import json, os, sys, time, urllib.request
repo, sf_dir, mem, frac, cpus = sys.argv[1:6]
sys.path.insert(0, repo)
os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
# fewer concurrent tasks than the suite default: the cap should bite
# the per-partition SORT/AGG/JOIN buffers (forcing spill), not starve
# 32 tasks below Spark's minimum page size (which is an OOM by
# construction, not a memory-pressure behavior)
os.environ["SPARK_GRAFT_CPUS"] = cpus
from aws_payment_data_lake_spark.session import get_spark
spark = get_spark("spill-probe", extra_conf={
    "spark.ui.enabled": "true",
    # cap the unified memory region so execution memory is scarce at
    # sf1.0 working-set size: sort/agg/join buffers must spill
    "spark.memory.fraction": frac,
    # keep shuffle partitions at the suite default — the point is
    # partition-sized buffers under pressure, not smaller partitions
})
import __spark_entry__ as entry
qs = entry.queries()
t0 = time.perf_counter()
counts = {}
for name in ("dedup_minhash_lsh", "medallion_dedup_latest"):
    counts[name] = qs[name](spark, sf_dir).count()
wall = round(time.perf_counter() - t0, 2)
base = spark.sparkContext.uiWebUrl
appid = spark.sparkContext.applicationId
def api(p):
    with urllib.request.urlopen(f"{base}/api/v1/applications/{appid}/{p}") as r:
        return json.load(r)
stages = api("stages?status=complete")
execs = api("executors")
out = {
    "counts": counts, "wall_sec": wall,
    "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
    "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
    "spilled_stages": sum(1 for s in stages if s.get("diskBytesSpilled", 0) > 0),
    "stages": len(stages),
    "peak_execution_memory": max(
        (s.get("peakExecutionMemory", 0) for s in stages), default=0),
    "peak_jvm_heap": max(
        (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0)
         for e in execs), default=0),
}
print("SPILLPROBE " + json.dumps(out))
"""


def run(sf_dir: str, mem: str, fraction: str,
        cpus: str = "8") -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _PROBE, REPO, sf_dir, mem, fraction,
         cpus],
        capture_output=True, text=True, timeout=3600, cwd=REPO)
    line = next((ln for ln in p.stdout.splitlines()
                 if ln.startswith("SPILLPROBE ")), None)
    if p.returncode != 0 or line is None:
        tail = (p.stderr or p.stdout)[-4000:]
        oom = ("OutOfMemoryError" in tail or "Killed" in tail)
        return {"completed": False, "oom": oom, "tail": tail}
    out = json.loads(line.split(" ", 1)[1])
    out["completed"] = True
    out["oom"] = False
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(
        REPO, ".localdata", "sf1.0"))
    ap.add_argument("--mem", default="2g")
    ap.add_argument("--fraction", default="0.25")
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--control", action="store_true",
                    help="also run uncapped (8g, default fraction) "
                         "and diff row counts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    t0 = time.time()
    capped = run(args.sf_dir, args.mem, args.fraction, args.cpus)
    rec = {
        "probe": "spill_under_memory_cap",
        "sf_dir": args.sf_dir,
        "capped": {"driver_mem": args.mem, "cpus": int(args.cpus),
                   "memory_fraction": float(args.fraction), **capped},
    }
    if args.control and capped.get("completed"):
        ctrl = run(args.sf_dir, "8g", "0.6", args.cpus)
        rec["control"] = {"driver_mem": "8g", "memory_fraction": 0.6,
                          **ctrl}
        rec["counts_match"] = (capped.get("counts")
                               == ctrl.get("counts"))
    rec["probe_wall_sec"] = round(time.time() - t0, 1)
    rec["pass"] = bool(
        capped.get("completed")
        and capped.get("disk_spill_bytes", 0) > 0
        and rec.get("counts_match", True))
    print(json.dumps(rec, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
