"""Unit tests for the large-star/small-star connected-components operator.

The driver oracle (recursive CTE over the sf0.01 near-dup graph) checks
the shallow real-data case; these tests pin the adversarial shapes that
motivated the two-phase algorithm — deep chains, where plain 1-hop label
propagation needs diameter rounds but large-star/small-star needs
O(log d).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from aws_payment_data_lake_spark.operators.dedup import connected_components


def _cc(spark, edges, **kw):
    # driver_threshold=0 pins the DISTRIBUTED star rounds — these tests
    # exist to exercise that algorithm; the driver union-find fast path
    # is covered separately below.
    kw.setdefault("driver_threshold", 0)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df, **kw).collect()
    return {r.doc_id: (r.canonical_doc_id, r.group_size) for r in rows}


def test_chain_collapses_to_min(spark):
    """A 64-node path: diameter 63. 1-hop propagation would need ~63
    rounds; large-star/small-star converges inside max_iter=50 easily
    (O(log 63) ~ 6 alternations) and labels every node with the min."""
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: (0, n) for i in range(n)}


def test_two_components_and_orientation(spark):
    """Two clusters, edges given in arbitrary direction (b < a on some):
    labels are per-component minima, sizes per-component counts."""
    got = _cc(spark, [(5, 3), (3, 9), (20, 21), (22, 21), (9, 5)])
    assert got == {3: (3, 3), 5: (3, 3), 9: (3, 3),
                   20: (20, 3), 21: (20, 3), 22: (20, 3)}


def test_star_and_duplicate_edges(spark):
    """Pre-collapsed star + duplicate/self edges are a fixpoint: one
    round detects convergence, output unchanged."""
    got = _cc(spark, [(1, 7), (1, 8), (1, 9), (1, 7), (7, 7)])
    assert got == {1: (1, 4), 7: (1, 4), 8: (1, 4), 9: (1, 4)}


def test_driver_fast_path_equals_distributed(spark):
    """The small-graph union-find fast path (default driver_threshold)
    returns exactly what the distributed star rounds return — same
    labels, same group sizes — on chains, multi-component graphs, and
    duplicate/self edges."""
    cases = [
        [(i, i + 1) for i in range(20)],
        [(5, 3), (3, 9), (20, 21), (22, 21), (9, 5)],
        [(1, 7), (1, 8), (1, 9), (1, 7), (7, 7)],
    ]
    for edges in cases:
        fast = _cc(spark, edges, driver_threshold=100_000)
        dist = _cc(spark, edges, driver_threshold=0)
        assert fast == dist


def test_driver_threshold_boundary(spark):
    """An edge set exactly AT the threshold uses the fast path; one above
    falls through to the rounds — both correct (10-edge chain, threshold
    10 vs 9)."""
    edges = [(i, i + 1) for i in range(10)]
    assert (_cc(spark, edges, driver_threshold=10)
            == _cc(spark, edges, driver_threshold=9)
            == {i: (0, 11) for i in range(11)})


def test_reliable_checkpoint_dir_path(spark, tmp_path):
    """checkpoint_dir switches rounds from localCheckpoint to reliable
    checkpoint (the cluster-durability path); results are identical and
    checkpoint data actually lands in the directory."""
    df = spark.createDataFrame([(i, i + 1) for i in range(7)],
                               "doc_a long, doc_b long")
    rows = connected_components(df, checkpoint_dir=str(tmp_path),
                                driver_threshold=0).collect()
    got = {r.doc_id: (r.canonical_doc_id, r.group_size) for r in rows}
    assert got == {i: (0, 8) for i in range(8)}
    assert any(tmp_path.iterdir())  # RDD checkpoint dirs were written


def test_matches_label_propagation_semantics(spark):
    """Random-ish graph vs a driver-side union-find oracle."""
    edges = [(a, b) for a, b in
             [(2, 11), (11, 29), (29, 31), (4, 6), (6, 2),
              (40, 41), (50, 51), (51, 52), (52, 40), (99, 98)]]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    expect = {n: (root, len(members))
              for root, members in comps.items() for n in members}
    assert _cc(spark, edges) == expect


def test_cluster_aware_split_is_leakage_free(spark):
    """round 12: near-dup pairs NEVER straddle the split boundary;
    singleton docs degrade to the plain hash split; deterministic."""
    import pyspark.sql.functions as F
    from aws_payment_data_lake_spark.operators.dedup import (
        cluster_aware_split,
        connected_components,
    )
    docs = spark.range(1000).selectExpr("id AS doc_id",
                                        "CONCAT('d', id) AS text")
    # chain clusters: (0,1,2), (10,11,12), ... every 10th triple
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 1000, 10)]
        + [(i + 1, i + 2) for i in range(0, 1000, 10)],
        "doc_a long, doc_b long")
    comp = connected_components(pairs)
    out = cluster_aware_split(docs, comp).persist()
    # leakage property: both endpoints of every pair share the split
    lab = out.select("doc_id", "split")
    a = lab.withColumnRenamed("doc_id", "doc_a") \
           .withColumnRenamed("split", "sa")
    b = lab.withColumnRenamed("doc_id", "doc_b") \
           .withColumnRenamed("split", "sb")
    straddle = (pairs.join(a, "doc_a").join(b, "doc_b")
                .where("sa <> sb").count())
    assert straddle == 0
    # whole clusters share one label
    assert (out.groupBy("split_canonical")
            .agg(F.countDistinct("split").alias("n"))
            .where("n > 1").count()) == 0
    # proportions roughly honor the weights (hash noise tolerated)
    frac = {r.split: r.c / 1000 for r in
            out.groupBy("split").count()
            .selectExpr("split", "count AS c").collect()}
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["valid"] < 0.16
    assert 0.05 < frac["test"] < 0.16
    # deterministic: a rerun assigns identically
    again = cluster_aware_split(docs, comp)
    assert (out.select("doc_id", "split")
            .exceptAll(again.select("doc_id", "split")).count()) == 0
    # bad weights refuse loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum"):
        cluster_aware_split(docs, comp, weights=(0.5, 0.1, 0.1))
    out.unpersist()
