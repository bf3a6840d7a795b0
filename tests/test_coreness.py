"""Core decomposition (h-index iteration) and SALSA — convergence to
the exact peel-oracle coreness, the k-core membership relation, and
SALSA's numpy power-iteration parity + TKC damping property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms import core_decomposition, k_core, salsa
from graphblast_spark.algorithms.stats import global_transitivity
from graphblast_spark.matrix import Graph


def _graph(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    return Graph.build(e, vertices=spark.range(n).selectExpr("id"))


def _coreness_peel_oracle(edges, n):
    """Textbook Matula-Beck peel on the undirected view."""
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(adj[v]) for v in range(n)}
    core = dict(deg)
    alive = set(range(n))
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        peel = [v for v in alive if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for w in adj[v]:
                if w in alive:
                    deg[w] -= 1
                    if deg[w] <= k:
                        peel.append(w)
    return core


CASES = [
    # triangle + pendant + isolated
    ([(0, 1), (1, 2), (0, 2), (2, 3)], 5),
    # 4-clique with a chain tail
    ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)], 7),
    # two triangles sharing a vertex + bridge to a 4-cycle
    (
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4),
         (4, 5), (5, 6), (6, 7), (7, 8), (8, 5)],
        9,
    ),
]


@pytest.mark.parametrize("edges,n", CASES)
def test_coreness_matches_peel_oracle(spark, edges, n):
    g = _graph(spark, edges, n)
    got = {
        r.id: r.coreness for r in core_decomposition(g).collect()
    }
    assert got == _coreness_peel_oracle(edges, n)
    g.unpersist()


def test_coreness_kcore_membership_relation(spark):
    edges, n = CASES[1]
    g = _graph(spark, edges, n)
    core = {r.id: r.coreness for r in core_decomposition(g).collect()}
    for k in (1, 2, 3):
        members = {
            r.id: r.in_core for r in k_core(g, k=k).collect()
        }
        assert members == {v: int(core[v] >= k) for v in range(n)}, k
    g.unpersist()


def test_coreness_fixed_rounds_deterministic_and_bounded(spark):
    edges, n = CASES[2]
    g = _graph(spark, edges, n)
    r1 = sorted(map(tuple, core_decomposition(g, fixed_rounds=2).collect()))
    r2 = sorted(map(tuple, core_decomposition(g, fixed_rounds=2).collect()))
    assert r1 == r2
    # partial state is an upper bound on true coreness (monotone descent)
    oracle = _coreness_peel_oracle(edges, n)
    assert all(c >= oracle[v] for v, c in r1)
    g.unpersist()


def _salsa_numpy(edges, n, iters):
    outd = {}
    ind = {}
    for a, b in edges:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    hub = {v: 1.0 / n for v in range(n)}
    auth = {v: 0.0 for v in range(n)}
    for _ in range(iters):
        auth = {v: 0.0 for v in range(n)}
        for a, b in edges:
            auth[b] += hub[a] * (1.0 / outd[a])
        s = sum(auth.values()) or 1.0
        auth = {v: x / s for v, x in auth.items()}
        hub = {v: 0.0 for v in range(n)}
        for a, b in edges:
            hub[a] += auth[b] * (1.0 / ind[b])
        s = sum(hub.values()) or 1.0
        hub = {v: x / s for v, x in hub.items()}
    return hub, auth


def test_salsa_matches_numpy_power_iteration(spark):
    # directed: 0,1 -> {2,3}; 4 -> 2; 3 -> 0 (cycle); 5 isolated
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2), (3, 0)]
    g = _graph(spark, edges, 6)
    got = {r.id: (r.hub, r.authority) for r in salsa(g, fixed_iters=4).collect()}
    hub, auth = _salsa_numpy(edges, 6, 4)
    for v in range(6):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-9), ("auth", v)
    # L1-normalized halves
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0)
    g.unpersist()


def test_salsa_damps_tkc_vs_hits(spark):
    """The TKC property SALSA exists for (Lempel-Moran §3): a tightly
    knit 3x3 complete bipartite spam cluster vs one authority endorsed
    by three INDEPENDENT single-link hubs. HITS concentrates authority
    in the clique; SALSA's degree normalization scores the independent
    authority at least as high as each clique authority."""
    from graphblast_spark.algorithms import hits

    clique = [(h, a) for h in (0, 1, 2) for a in (3, 4, 5)]
    indep = [(6, 9), (7, 9), (8, 9)]
    g = _graph(spark, clique + indep, 10)
    s = {r.id: r.authority for r in salsa(g, fixed_iters=8).collect()}
    h = {r.id: r.authority for r in hits(g, fixed_iters=8).collect()}
    assert h[9] < h[3], "HITS should favor the clique (TKC effect)"
    assert s[9] >= s[3] - 1e-12, "SALSA should not"
    g.unpersist()


def test_global_transitivity_triangle_pendant(spark):
    # triangle 0-1-2 + pendant edge 2-3: T=1, wedges = 1+1+3+0 = 5
    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], 4)
    row = global_transitivity(g).first()
    assert row.n_triangles == 1
    assert row.n_wedges == 5
    assert row.transitivity == pytest.approx(0.6)
    g.unpersist()


def test_global_transitivity_wedge_free(spark):
    # two disjoint edges: all degrees 1 — zero wedges, defined as 0.0
    g = _graph(spark, [(0, 1), (2, 3)], 4)
    row = global_transitivity(g).first()
    assert (row.n_triangles, row.n_wedges, row.transitivity) == (0, 0, 0.0)
    g.unpersist()


def test_salsa_seeded_matches_numpy_and_differs_from_global(spark):
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (4, 2), (3, 0), (4, 5), (5, 4)]
    n = 6
    g = _graph(spark, edges, n)
    seed_ids = [4, 5]
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    got = {
        r.id: (r.hub, r.authority)
        for r in salsa(g, fixed_iters=3, seeds=seeds).collect()
    }
    # numpy replay with seed init
    outd, ind = {}, {}
    for a, b in edges:
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    hub = {v: (1.0 / len(seed_ids) if v in seed_ids else 0.0) for v in range(n)}
    for _ in range(3):
        auth = {v: 0.0 for v in range(n)}
        for a, b in edges:
            auth[b] += hub[a] * (1.0 / outd[a])
        s = sum(auth.values()) or 1.0
        auth = {v: x / s for v, x in auth.items()}
        hub = {v: 0.0 for v in range(n)}
        for a, b in edges:
            hub[a] += auth[b] * (1.0 / ind[b])
        s = sum(hub.values()) or 1.0
        hub = {v: x / s for v, x in hub.items()}
    for v in range(n):
        assert got[v][0] == pytest.approx(hub[v], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-9), ("auth", v)
    # personalization changes the ranking vs global
    glob = {r.id: r.authority for r in salsa(g, fixed_iters=3).collect()}
    assert any(abs(glob[v] - got[v][1]) > 1e-6 for v in range(n))
    # empty seed set is a hard error
    with pytest.raises(ValueError):
        salsa(g, fixed_iters=1, seeds=seeds.limit(0)).collect()
    g.unpersist()
