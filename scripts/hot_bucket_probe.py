"""Scale evidence for the LSH salted hot-bucket tier (VERDICT r4 #4).

The guard's claim is PER-TASK boundedness: a band bucket of n docs
inherently yields C(n,2) candidate pairs, and the salted self-join tier
splits that triangle into m = ceil(n / cap) tasks of ~cap*n work each,
instead of one collect_list row + one task doing all n^2/2.

This probe builds the boundary condition directly at the signature
level — the operator's real input — because no text corpus can place
20k docs in exactly ONE band: identical docs collide in all 32 bands
(32x the work, measuring the corpus not the guard), and boilerplate
corpora collide in a random subset. Synthetic sigs give one engineered
hot band plus a normal background, which is precisely the guard's
decision boundary:

  - `background` docs: 64 per-doc-unique signature components (every
    band bucket has size 1 — all cold tier).
  - `hot` docs: sig0 = sig1 = a shared constant (ONE band-0 bucket of
    |hot| docs), sig2..sig63 unique (no other collisions).

Measured per tier on the same input:
  guarded    lsh_candidate_pairs(cap=1024)  -> salted tier engages
  unguarded  lsh_candidate_pairs(cap=2^31)  -> bucket-and-expand tier
             collects all hot ids into ONE row and expands the whole
             triangle in ONE task (the round-3 failure mode)

Reported: wall time, candidate count (must be identical), and the max
concurrent-task spread of the expansion stage (statusTracker) — the
evidence that the guard turns a 1-task quadratic blowup into ~n/cap
parallel tasks. Run AFTER other benchmarks (needs idle cores):

    python scripts/hot_bucket_probe.py [--hot 20000] [--background 100000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from aws_payment_data_lake_spark.operators.dedup import (  # noqa: E402
    MERSENNE_P,
    N_HASHES,
    lsh_candidate_pairs,
)
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402


def synthetic_sigs(spark, n_hot: int, n_background: int):
    """One engineered hot band-0 bucket + cold background, as a real
    sigs table (doc_id, sig0..sig63, n_sh). Components are unique per
    (doc, i) via a hash of both — no accidental collisions."""
    base = spark.range(n_hot + n_background).select(
        F.col("id").alias("doc_id"))
    uniq = [
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)), F.lit(MERSENNE_P))
        .alias(f"sig{i}")
        for i in range(N_HASHES)
    ]
    sigs = base.select("doc_id", *uniq, F.lit(50).alias("n_sh"))
    hot = F.col("doc_id") < n_hot
    return sigs.select(
        "doc_id",
        F.when(hot, F.lit(12345)).otherwise(F.col("sig0")).alias("sig0"),
        F.when(hot, F.lit(67890)).otherwise(F.col("sig1")).alias("sig1"),
        *[F.col(f"sig{i}") for i in range(2, N_HASHES)],
        "n_sh",
    ).persist()


def measure(spark, sigs, cap: int, label: str) -> dict:
    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup() or [])
    t0 = time.perf_counter()
    n_pairs = lsh_candidate_pairs(sigs, bucket_cap=cap).count()
    wall = round(time.perf_counter() - t0, 3)
    # max tasks of any stage that ran during this measurement — the
    # expansion stage dominates, so its task count is the spread proof.
    max_tasks = 0
    for jid in set(tracker.getJobIdsForGroup() or []) - jobs_before:
        info = tracker.getJobInfo(jid)
        for sid in (info.stageIds if info else []):
            sinfo = tracker.getStageInfo(sid)
            if sinfo:
                max_tasks = max(max_tasks, sinfo.numTasks)
    return {"tier": label, "cap": cap, "wall_sec": wall,
            "n_candidates": n_pairs, "max_stage_tasks": max_tasks}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=20_000)
    ap.add_argument("--background", type=int, default=100_000)
    ap.add_argument("--skip-unguarded", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="hot-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sigs = synthetic_sigs(spark, args.hot, args.background)
    sigs.count()  # materialize outside the timed region

    out = {"hot": args.hot, "background": args.background, "tiers": []}
    out["tiers"].append(measure(spark, sigs, 1024, "guarded_salted"))
    if not args.skip_unguarded:
        out["tiers"].append(
            measure(spark, sigs, 2**31, "unguarded_single_task"))
    tiers = {t["tier"]: t for t in out["tiers"]}
    if len(tiers) == 2:
        g, u = tiers["guarded_salted"], tiers["unguarded_single_task"]
        out["counts_match"] = g["n_candidates"] == u["n_candidates"]
        out["speedup"] = round(u["wall_sec"] / g["wall_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
