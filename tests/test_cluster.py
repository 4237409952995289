"""connected_components (operators/cluster.py) on crafted graphs:
transitive chains collapse to one cluster, disjoint components stay
separate, and the canonical id is the component minimum."""

from __future__ import annotations

from movievectorsearch_spark.operators.cluster import connected_components


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    out = connected_components(pairs)
    return {r.id: r.cluster_id for r in out.collect()}


def test_chain_collapses(spark):
    # 1-2, 2-3, 3-4, 4-5: diameter 4, needs multiple propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components(spark):
    got = _cc(spark, [(10, 20), (30, 40), (40, 50)])
    assert got == {10: 10, 20: 10, 30: 30, 40: 30, 50: 30}


def test_min_id_wins_regardless_of_edge_order(spark):
    # min node appears only on the b side of its edge
    got = _cc(spark, [(7, 3), (7, 9)])
    assert got == {3: 3, 7: 3, 9: 3}


def test_clique_single_round(spark):
    got = _cc(spark, [(1, 2), (1, 3), (2, 3)])
    assert set(got.values()) == {1}
