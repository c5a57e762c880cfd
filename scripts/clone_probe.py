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
        # + DEEP CLONE (r11): deep copies bytes, so unlike shallow it
        # SHOULD grow with the byte axis — but via raw file copy (no
        # decode/re-encode/shuffle), so it stays well under the CTAS
        for mult in (1, 10):
            src = build(spark, os.path.join(root, f"b{mult}"),
                        16, 100_000 * mult)
            t0 = time.time()
            TxnTable(spark, os.path.join(root, f"b{mult}c")
                     ).clone_shallow(src)
            clone_s = time.time() - t0
            t0 = time.time()
            deep = TxnTable(spark, os.path.join(root, f"b{mult}d")
                            ).clone_deep(src)
            deep_s = time.time() - t0

            def _du(table):
                tot = 0
                for dp, _, fs in os.walk(os.path.join(table.path,
                                                      "data")):
                    tot += sum(os.path.getsize(os.path.join(dp, n))
                               for n in fs)
                return tot
            t0 = time.time()
            TxnTable(spark, os.path.join(root, f"b{mult}ctas")
                     ).create(src.snapshot())
            ctas_s = time.time() - t0
            src_bytes = sum(a.bytes for a in src._replay().live.values())
            out["bytes_axis"].append(
                {"rows": 16 * 100_000 * mult, "bytes": src_bytes,
                 "clone_sec": round(clone_s, 3),
                 "shallow_bytes_moved": _du(
                     TxnTable(spark, os.path.join(root, f"b{mult}c"))),
                 "deep_clone_sec": round(deep_s, 3),
                 "deep_bytes_moved": _du(deep),
                 "ctas_copy_sec": round(ctas_s, 3)})
            print(f"rows x{mult}: shallow {clone_s:.3f}s, deep "
                  f"{deep_s:.3f}s, CTAS copy {ctas_s:.3f}s")
            if mult == 10:
                # independence: obliterate the source; the deep clone
                # must still read every row
                n = deep.count_rows()
                shutil.rmtree(src.path)
                got = deep.snapshot().count()
                out["deep_independent_after_source_delete"] = \
                    (got == n == 16 * 100_000 * 10)

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
        ba = out["bytes_axis"]
        out["verdict"] = {
            "clone_is_metadata_bound": (
                f[-1]["clone_sec"] / max(f[0]["clone_sec"], 1e-9)
                < 3 * (f[-1]["files"] / f[0]["files"])),
            "clone_flat_on_10x_bytes": (
                ba[1]["clone_sec"] < 3 * max(ba[0]["clone_sec"], 0.05)),
            # deep clone cost follows BYTES (r11), the opposite
            # contract of shallow. At probe scale the copy runs at
            # page-cache speed so WALL stays flat; the byte cost is
            # demonstrated on disk: the clone's data dir carries the
            # full source bytes (10x between mults) where shallow
            # moves ZERO
            "deep_clone_follows_bytes": (
                ba[1]["deep_bytes_moved"]
                >= 0.9 * ba[1]["bytes"]
                and ba[1]["deep_bytes_moved"]
                > 5 * ba[0]["deep_bytes_moved"]
                and ba[1]["shallow_bytes_moved"] == 0),
            "deep_clone_beats_ctas_copy": (
                ba[1]["deep_clone_sec"]
                <= 1.2 * ba[1]["ctas_copy_sec"]),
            "deep_independent": out.get(
                "deep_independent_after_source_delete", False),
            "rerun_is_listing_bound": out["copy_into"]["rerun_sec"]
            < 0.25 * out["copy_into"]["first_sec"]
            and out["copy_into"]["rerun_loaded"] == 0,
        }
        with open(os.path.join(REPO, "CLONE_SLOPE_r11.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out["verdict"]))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
