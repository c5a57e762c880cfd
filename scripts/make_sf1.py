"""Build a local sf1.0 slice (10x sf0.1) for scale-slope measurement.

The driver's generator is not available, so sf1.0 is a 10-replica
key-offset blow-up of the driver's sf0.1 tables, engineered so that the
QUERY COST MODEL scales linearly like a real 10x corpus would:

- Fact/dim keys are offset by ``replica * stride`` (stride = a power of
  ten above the table's max key), so per-replica join fan-out and group
  cardinality ratios are exactly those of sf0.1. region/nation keep
  their 5/25 rows (TPC-H dims are sf-invariant) — customer/supplier
  nationkeys are left untouched so the dim fan-in grows 10x, as it
  would at a real sf1.0.
- documents.text gets every token prefixed with ``r{i}.`` in replicas
  i>0: within-replica shingle/minhash/simhash structure is IDENTICAL to
  sf0.1, while cross-replica 3-gram shingles can never match — so true
  near-dup pairs scale 10x (linear), not 100x (the quadratic artifact a
  naive copy would create, which would invalidate the slope).
- embeddings get a per-replica deterministic sign flip per dimension
  (v' = v * s_r, s_r in {+-1}^d): norms and within-replica cosines are
  bit-preserved, cross-replica cosines decorrelate — same linear-pairs
  argument.
- events keep their timestamps (10x density on the same window — the
  streaming-drain state size scales with keys-per-window, which is the
  dimension under test).

Run: python scripts/make_sf1.py [outdir]   (default .localdata/sf1.0)
     python scripts/make_sf1.py .localdata/sf1.0-hot --hot 20000
     python scripts/make_sf1.py .localdata/sf10 --replicas 100
         (sf10: 100 key-offset replicas — same linearity argument;
          key strides comfortably exceed 100x the sf0.1 key ranges)

``--hot N`` appends N boilerplate-heavy documents (shared 40-token
block + unique 20-token tails, doc_ids far above every replica). Their
pairwise Jaccard ~0.49 sits BELOW the 0.6 near-dup threshold, so the
verified-pair output stays linear, but ~sqrt-of-band fraction of them
share per-band buckets (both band minima landing in the common block),
creating the multi-thousand-doc hot buckets the salted LSH tier guards
against — the end-to-end twin of scripts/hot_bucket_probe.py's
signature-level boundary measurement. Default 0: the slope corpus is
unchanged unless asked.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10                       # --replicas overrides (100 = sf10)

# key column -> stride; every other int column passes through.
OFFSETS = {
    "c_custkey": 100_000, "o_custkey": 100_000,
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "l_partkey": 100_000, "p_partkey": 100_000,
    "l_suppkey": 10_000, "s_suppkey": 10_000,
    "doc_id": 100_000, "vec_id": 100_000,
    "event_id": 1_000_000, "user_id": 1_000_000,
}
SF_INVARIANT = {"region", "nation"}


def _sign_pattern(replica: int, dim: int) -> np.ndarray:
    if replica == 0:
        return np.ones(dim, dtype=np.float32)
    h = hashlib.sha256(f"sf1-replica-{replica}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)


def _replicate(name: str, tbl: pa.Table, replica: int) -> pa.Table:
    cols = {}
    for field in tbl.schema:
        col = tbl[field.name]
        if field.name in OFFSETS and replica > 0:
            col = pc.add(col, OFFSETS[field.name] * replica)
            col = col.cast(field.type)
        elif name == "documents" and field.name == "text" and replica > 0:
            # prefix every token: "a b c" -> "r3.a r3.b r3.c"
            tag = f"r{replica}."
            col = pc.binary_join_element_wise(
                tag, pc.replace_substring(col, " ", " " + tag), "")
        elif name == "embeddings" and field.name == "embedding":
            dim = len(col[0].as_py())
            sign = _sign_pattern(replica, dim)
            flat = np.asarray(col.combine_chunks().flatten(), dtype=np.float32)
            flat = (flat.reshape(-1, dim) * sign).reshape(-1)
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, type=pa.float32()), dim).cast(field.type)
        cols[field.name] = col
    return pa.table(cols, schema=tbl.schema)


def _hot_documents(n: int, schema: pa.Schema) -> pa.Table:
    """N boilerplate docs: one shared 40-token block, then 20 unique
    tokens each. Pairwise J ~ 38/(38+2*20) ~ 0.49 < 0.6 — hot band
    buckets WITHOUT quadratic verified output (see module docstring)."""
    common = " ".join(f"boiler{j}" for j in range(40))
    ids = pa.array(range(10_000_000, 10_000_000 + n), type=pa.int64())
    texts = pa.array(
        [common + " " + " ".join(f"uniq{i}x{j}" for j in range(20))
         for i in range(n)])
    cols = {}
    for field in schema:
        if field.name == "doc_id":
            cols[field.name] = ids.cast(field.type)
        elif field.name == "text":
            cols[field.name] = texts
        elif field.name == "n_chars":
            cols[field.name] = pc.utf8_length(texts).cast(field.type)
        elif field.type == pa.string():
            cols[field.name] = pa.array(["hot"] * n)
        else:
            cols[field.name] = pa.nulls(n, type=field.type)
    return pa.table(cols, schema=schema)


def main(outdir: str, hot: int = 0, replicas: int = REPLICAS) -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    for src in sorted(SRC.glob("*.parquet")):
        name = src.stem
        tbl = pa.parquet.read_table(src)
        if name in SF_INVARIANT:
            pq.write_table(tbl, out / src.name)
            print(f"{name}: {tbl.num_rows} rows (sf-invariant)")
            continue
        parts = [_replicate(name, tbl, r) for r in range(replicas)]
        if name == "documents" and hot > 0:
            parts.append(_hot_documents(hot, tbl.schema))
        big = pa.concat_tables(parts)
        pq.write_table(big, out / src.name,
                       row_group_size=max(65536, big.num_rows // 32))
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default=str(
        Path(__file__).resolve().parents[1] / ".localdata" / "sf1.0"))
    ap.add_argument("--hot", type=int, default=0)
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    a = ap.parse_args()
    main(a.outdir, hot=a.hot, replicas=a.replicas)
