"""Scale probe for the round-10 admin surface: SHALLOW CLONE and
COPY INTO must cost METADATA (file count), never data bytes.

Two sweeps, both on synthetic tables engineered to separate the axes:

  files-axis   tables of 16 / 128 / 1024 files at ~constant tiny
               bytes: clone wall time should grow ~linearly in file
               count (log write + footer-stat passthrough) and stay
               milliseconds-per-file;
  bytes-axis   tables of 16 files at 1x / 10x row counts: clone wall
               time should stay FLAT (zero data bytes move — the
               whole point), while a baseline CTAS copy of the same
               table grows with bytes, proving the probe can see the
               difference.

COPY INTO idempotent re-run is measured on the 1024-file landing zone:
the second run must be listing-bound (no read, no stage, no commit).

Writes CLONE_SLOPE_r10.json at the repo root.
"""

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
from aws_payment_data_lake_spark.sources.txlog import TxnTable  # noqa: E402


def build(spark, path: str, n_files: int, rows_per_file: int) -> TxnTable:
    t = TxnTable(spark, path)
    df = (spark.range(n_files * rows_per_file)
          .selectExpr("id", "id * 2 as v")
          .repartition(n_files))
    t.create(df, partition_files=None)
    return t


def main() -> None:
    spark = get_spark(app_name="clone-probe")
    root = tempfile.mkdtemp(prefix="cloneprobe-")
    out = {"files_axis": [], "bytes_axis": [], "copy_into": {}}
    try:
        # files axis: constant tiny bytes, growing file count
        for nf in (16, 128, 1024):
            src = build(spark, os.path.join(root, f"f{nf}"), nf, 8)
            live = len(src._replay().live)
            t0 = time.time()
            c = TxnTable(spark, os.path.join(root, f"f{nf}c"))
            c.clone_shallow(src)
            dt = time.time() - t0
            out["files_axis"].append(
                {"files": live, "clone_sec": round(dt, 3),
                 "ms_per_file": round(1000 * dt / live, 2)})
            print(f"files={live}: clone {dt:.3f}s "
                  f"({1000 * dt / live:.2f} ms/file)")

        # bytes axis: constant file count, 10x the rows; CTAS baseline
        for mult in (1, 10):
            src = build(spark, os.path.join(root, f"b{mult}"),
                        16, 20_000 * mult)
            t0 = time.time()
            TxnTable(spark, os.path.join(root, f"b{mult}c")
                     ).clone_shallow(src)
            clone_s = time.time() - t0
            t0 = time.time()
            TxnTable(spark, os.path.join(root, f"b{mult}ctas")
                     ).create(src.snapshot())
            ctas_s = time.time() - t0
            out["bytes_axis"].append(
                {"rows": 16 * 20_000 * mult,
                 "clone_sec": round(clone_s, 3),
                 "ctas_copy_sec": round(ctas_s, 3)})
            print(f"rows x{mult}: clone {clone_s:.3f}s vs "
                  f"CTAS copy {ctas_s:.3f}s")

        # COPY INTO: first run loads 1024 files, second must be
        # listing-bound
        land = os.path.join(root, "f1024")   # reuse the parquet files
        tgt = TxnTable(spark, os.path.join(root, "copytgt"))
        tgt.create(spark.createDataFrame([], "id long, v long"))
        t0 = time.time()
        r1 = tgt.copy_into(os.path.join(land, "data"))
        first = time.time() - t0
        t0 = time.time()
        r2 = tgt.copy_into(os.path.join(land, "data"))
        second = time.time() - t0
        out["copy_into"] = {
            "files": r1["files_loaded"], "first_sec": round(first, 3),
            "rerun_sec": round(second, 3),
            "rerun_loaded": r2["files_loaded"]}
        print(f"copy_into: {r1['files_loaded']} files in {first:.2f}s; "
              f"idempotent re-run {second:.3f}s (loaded "
              f"{r2['files_loaded']})")

        f = out["files_axis"]
        out["verdict"] = {
            "clone_is_metadata_bound": (
                f[-1]["clone_sec"] / max(f[0]["clone_sec"], 1e-9)
                < 3 * (f[-1]["files"] / f[0]["files"])),
            "clone_flat_on_10x_bytes": (
                out["bytes_axis"][1]["clone_sec"]
                < 3 * max(out["bytes_axis"][0]["clone_sec"], 0.05)),
            "rerun_is_listing_bound": out["copy_into"]["rerun_sec"]
            < 0.25 * out["copy_into"]["first_sec"]
            and out["copy_into"]["rerun_loaded"] == 0,
        }
        with open(os.path.join(REPO, "CLONE_SLOPE_r10.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out["verdict"]))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
