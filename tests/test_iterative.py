"""Driver-loop iterative algorithms (operators/iterative.py): hand-
computed PageRank sweeps on crafted graphs, exact-fixpoint early exit,
and power-iteration convergence toward the dominant axis."""

from __future__ import annotations

from movievectorsearch_spark.operators.iterative import (
    _linf_normalize,
    pagerank_bipartite,
    power_iteration,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "c long, s long")


def test_pagerank_one_iteration_hand_computed(spark):
    # c1→s1, c2→s1, c2→s2: degc={c1:1,c2:2}, degs={s1:2,s2:1}
    ranks_s, ranks_c, delta = pagerank_bipartite(
        _edges(spark, [(1, 1), (2, 1), (2, 2)]), max_full_iter=1
    )
    s = {r.s: r.rank_ppm for r in ranks_s.collect()}
    # s1: 150000 + 17*(1_000_000//1 + 1_000_000//2)//20 = 1_425_000
    # s2: 150000 + 17*(1_000_000//2)//20 = 575_000
    assert s == {1: 1_425_000, 2: 575_000}
    c = {r.c: r.rank_ppm for r in ranks_c.collect()}
    # c1: 150000 + 17*(1_425_000//2)//20 = 755_625
    # c2: 150000 + 17*(1_425_000//2 + 575_000//1)//20 = 1_244_375
    assert c == {1: 755_625, 2: 1_244_375}
    assert delta == (1_000_000 - 755_625) + (1_244_375 - 1_000_000)


def test_pagerank_symmetric_graph_hits_fixpoint(spark):
    # 1-regular bipartite graph: every rank stays exactly 1e6 →
    # delta 0 after the first full iteration (early exit)
    ranks_s, ranks_c, delta = pagerank_bipartite(
        _edges(spark, [(1, 1), (2, 2), (3, 3)]), max_full_iter=5
    )
    assert delta == 0
    assert {r.rank_ppm for r in ranks_s.collect()} == {1_000_000}
    assert {r.rank_ppm for r in ranks_c.collect()} == {1_000_000}


def test_pagerank_more_iterations_shrink_delta(spark):
    edges = [(1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (1, 3)]
    _, _, d1 = pagerank_bipartite(_edges(spark, edges), max_full_iter=1)
    _, _, d3 = pagerank_bipartite(_edges(spark, edges), max_full_iter=3)
    assert d3 <= d1


def test_linf_normalize_sign_symmetric():
    assert _linf_normalize([500, -1000, 250], 1000) == [500, -1000, 250]
    assert _linf_normalize([-7, 3], 1000) == [-1000, 428]  # 3*1000//7
    assert _linf_normalize([0, 0], 1000) == [0, 0]  # guard m=0


def test_power_iteration_finds_dominant_axis(spark):
    # 20 rows along axis 0, 2 rows along axis 1 → XᵀX = diag(20, 2)·s²;
    # the direction must converge onto axis 0
    rows = [([1.0, 0.0],) for _ in range(20)] + [([0.0, 1.0],) for _ in range(2)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = power_iteration(df, "embedding", [1000, 1000], n_iter=2, scale=1000)
    got = {r.dim: (r.v_raw, r.v_norm) for r in out.collect()}
    assert set(got) == {0, 1}
    # iter1: v0=[1000,1000] → raw [2e10, 2e9] → norm [1000, 100]
    # iter2: v=[1000,100]: axis0 rows s=1e6, dim0 += 1000·1e6 ×20 = 2e10;
    # axis1 rows s=1e5, dim1 += 1000·1e5 ×2 = 2e8 → norm [1000, 10]
    assert got[0] == (20_000_000_000, 1000)
    assert got[1] == (200_000_000, 10)


def test_power_iteration_deterministic(spark):
    rows = [([float(i % 3), float((i * 7) % 5)],) for i in range(30)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    a = power_iteration(df, "embedding", [1000, -500], n_iter=2).collect()
    b = power_iteration(df, "embedding", [1000, -500], n_iter=2).collect()
    assert a == b
