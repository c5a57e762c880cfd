"""SemDeDup semantic dedup: parity with a straight-line NumPy greedy
reference, structural invariants, and index-reuse behavior."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR

from aws_payment_data_lake_spark.operators import similarity as S
from aws_payment_data_lake_spark.sources import load

THRESH = 0.4


def _reference(cells: dict[int, list[tuple[int, np.ndarray]]]):
    """Per-cell greedy leader selection in ascending vec_id order."""
    out = {}
    for cent_id, members in cells.items():
        members.sort(key=lambda t: t[0])
        kept: list[tuple[int, np.ndarray]] = []
        for vid, v in members:
            vn = v / np.linalg.norm(v)
            best, best_id = -2.0, None
            for kid, kv in kept:
                c = round(float(vn @ (kv / np.linalg.norm(kv))), 6)
                if c > best:
                    best, best_id = c, kid
            if best >= THRESH:
                out[vid] = (cent_id, False, best_id, best)
            else:
                kept.append((vid, v))
                out[vid] = (cent_id, True, None, None)
    return out


def _cells_of(assigned):
    cells: dict[int, list[tuple[int, np.ndarray]]] = {}
    for r in assigned.collect():
        cells.setdefault(r["cent_id"], []).append(
            (r["neighbor_id"], np.asarray(r["ne"], dtype=np.float64)))
    return cells


def test_matches_numpy_reference(spark):
    (emb,) = load(spark, SF_DIR, "embeddings")
    cents, assigned = S.build_ivf_index(emb)
    got = {
        r["vec_id"]: (r["cent_id"], r["kept"], r["dup_of"],
                      r["cos_to_rep"])
        for r in S.semantic_dedup(emb, THRESH,
                                  cents=cents, assigned=assigned).collect()
    }
    want = _reference(_cells_of(assigned))
    assert set(got) == set(want)
    mismatches = {v: (got[v], want[v]) for v in got if got[v] != want[v]}
    assert not mismatches, list(mismatches.items())[:5]
    assert any(not kept for (_, kept, _, _) in got.values())


def test_invariants(spark):
    """Every duplicate points at a KEPT row in the SAME cell with
    cosine >= threshold; every vector appears exactly once."""
    (emb,) = load(spark, SF_DIR, "embeddings")
    rows = S.semantic_dedup(emb, THRESH).collect()
    n_emb = emb.count()
    assert len(rows) == n_emb
    assert len({r["vec_id"] for r in rows}) == n_emb
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        if r["kept"]:
            assert r["dup_of"] is None and r["cos_to_rep"] is None
        else:
            rep = by_id[r["dup_of"]]
            assert rep["kept"] and rep["cent_id"] == r["cent_id"]
            assert r["cos_to_rep"] >= THRESH
            # greedy order: the representative has a smaller id
            assert r["dup_of"] < r["vec_id"]


def test_planted_duplicates(spark):
    """Three exact copies of one vector collapse to a single kept row
    regardless of which cell they land in (copies share a cell)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    other = rng.normal(size=(5, 8))
    data = [(0, base.tolist()), (10, base.tolist()), (20, base.tolist())]
    data += [(i + 1, other[i].tolist()) for i in range(5)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in data],
        "vec_id long, embedding array<double>")
    rows = S.semantic_dedup(df, 0.99, n_centroids=2).collect()
    copies = {r["vec_id"]: r for r in rows if r["vec_id"] in (0, 10, 20)}
    assert copies[0]["kept"]
    assert not copies[10]["kept"] and copies[10]["dup_of"] == 0
    assert not copies[20]["kept"] and copies[20]["dup_of"] == 0
