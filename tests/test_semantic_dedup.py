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


def test_cross_decontam_planted(spark):
    """cross_decontam: a near-copy of a benchmark vector is flagged
    with that benchmark's id; orthogonal corpus rows pass; ties at the
    rounded max go to the smallest benchmark id; an empty benchmark
    flags nothing."""
    e = np.eye(8)
    bench = [(5, e[0]), (9, e[0]), (7, e[1])]       # ids 5,9 identical
    corpus = [
        (100, e[0] + 0.01 * e[3]),                  # near-copy of e0
        (101, e[2]),                                # orthogonal: clean
        (102, e[1]),                                # exact copy of id 7
    ]
    to_df = lambda rows: spark.createDataFrame(     # noqa: E731
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in
           S.cross_decontam(to_df(corpus), to_df(bench), 0.9).collect()}
    assert got[100]["flagged"] and got[100]["bench_id"] == 5  # tie -> 5
    assert got[100]["max_cos"] > 0.99
    assert not got[101]["flagged"] and got[101]["bench_id"] == -1
    assert got[101]["max_cos"] == -1.0
    assert got[102]["flagged"] and got[102]["bench_id"] == 7
    assert got[102]["max_cos"] == 1.0
    empty = to_df([])
    all_clean = S.cross_decontam(to_df(corpus), empty, 0.0).collect()
    assert len(all_clean) == 3 and not any(r["flagged"] for r in all_clean)


def test_cross_decontam_matches_numpy(spark):
    """Real-table parity: flags and argmax ids reproduce a dense NumPy
    reference over the sf slice."""
    (emb,) = load(spark, SF_DIR, "embeddings")
    corpus = emb.where("vec_id % 37 <> 0")
    bench = emb.where("vec_id % 37 = 0")
    got = {r["vec_id"]: r for r in
           S.cross_decontam(corpus, bench, 0.4).collect()}

    crows = corpus.orderBy("vec_id").collect()
    brows = bench.orderBy("vec_id").collect()
    B = np.stack([np.asarray(r["embedding"]) for r in brows])
    B = B / np.linalg.norm(B, axis=1, keepdims=True)
    bids = np.array([r["vec_id"] for r in brows])
    for r in crows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        s = np.round((v / np.linalg.norm(v)) @ B.T, 6)
        k = int(np.argmax(s))
        g = got[r["vec_id"]]
        if s[k] >= 0.4:
            assert g["flagged"] and g["bench_id"] == bids[k]
            assert abs(g["max_cos"] - s[k]) < 1e-9
        else:
            assert not g["flagged"] and g["bench_id"] == -1
