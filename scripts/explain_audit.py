"""Plan-quality audit: .explain("formatted") every registered query and
flag scale anti-patterns.

Checks per plan (heuristic, reviewed by hand via the dump file):
  * CartesianProduct nodes (quadratic; only acceptable when the build
    side is intentionally tiny and broadcast);
  * parquet scans whose ReadSchema lists every table column when the
    query uses only a few (column pruning failed);
  * filters on scan columns without any PushedFilters at the scan;
  * joins with a sub-broadcast-threshold side that did NOT broadcast.

Usage: python scripts/explain_audit.py [--only a,b] [--out PLANS.txt]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_payment_data_lake_spark import queries as registry  # noqa: E402
from aws_payment_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if re.search(r"SortMergeJoin", plan):
        flags.append("SortMergeJoin(check broadcastability)")
    n_scans = plan.count("Scan parquet")
    n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    if "Filter" in plan and n_scans and n_pushed == 0 and "PushedFilters" in plan:
        flags.append("no-pushed-filters")
    full_reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    widths = [len(s.split(",")) for s in full_reads if s]
    if widths:
        flags.append(f"scan-widths={widths}")
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only")
    ap.add_argument("--out", default="/tmp/plans.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    specs = registry.all_queries()
    fns = {n: s.fn for n, s in specs.items()} | bench._extra_fns()
    names = args.only.split(",") if args.only else sorted(fns)

    with open(args.out, "w") as f:
        for name in names:
            if name == "streaming_tumbling_live":
                continue  # streaming plans can't explain pre-start
            df = fns[name](spark, SF_DIR)
            plan = formatted_plan(df)
            f.write(f"{'=' * 70}\n{name}\n{'=' * 70}\n{plan}\n")
            flags = audit(name, plan)
            print(f"{name}: {', '.join(flags) if flags else 'clean'}")
    print(f"\nfull plans -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
