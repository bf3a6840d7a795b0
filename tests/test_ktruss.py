"""k-truss: closed-form fixtures, a pure-python peeling oracle replay,
and the truss⊆core nesting property."""

import itertools

import pyspark.sql.functions as F
import pytest

from graphblast_spark.algorithms.ktruss import edge_triangle_support, k_truss
from graphblast_spark.matrix import Graph

SF_DIR = "/root/testdata/sf0.001"


def _graph(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return Graph.build(e, vertices=v)


def _python_truss(edges, k):
    """Driver-side peeling oracle on canonical (a, b) tuples."""
    es = {tuple(sorted(e)) for e in edges}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {(a, b) for a, b in es if len(adj[a] & adj[b]) >= k - 2}
        if keep == es:
            return es
        es = keep


def test_clique_truss(spark):
    # K5: every edge has 3 common neighbors → 5-truss = all 10 edges,
    # 6-truss empty.
    edges = list(itertools.combinations(range(5), 2))
    g = _graph(spark, edges, 5)
    t5 = k_truss(g, k=5)
    assert t5.count() == 10
    assert t5.agg(F.min("support")).first()[0] == 3
    assert k_truss(g, k=6).count() == 0


def test_triangle_plus_pendant(spark):
    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], 4)
    t3 = {(r.a, r.b) for r in k_truss(g, k=3).collect()}
    assert t3 == {(0, 1), (0, 2), (1, 2)}  # pendant edge peeled


def test_peeling_cascades(spark):
    # two triangles sharing an edge + a tail triangle hanging by a
    # bridge: 4-truss requires support>=2 WITHIN the truss — only the
    # K4 survives, and the cascade must peel the second-order fallout.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
             (3, 4), (4, 5), (3, 5)]                           # triangle on the side
    g = _graph(spark, edges, 6)
    t4 = {(r.a, r.b) for r in k_truss(g, k=4).collect()}
    assert t4 == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_support_single_pass(spark):
    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], 4)
    sup = {(r.a, r.b): r.support for r in edge_triangle_support(g).collect()}
    assert sup == {(0, 1): 1, (0, 2): 1, (1, 2): 1, (2, 3): 0}


@pytest.mark.parametrize("k", [3, 4])
def test_matches_python_oracle_on_fixture(spark, k):
    from graphblast_spark.sources.tpch_graphs import copurchase_graph

    g = copurchase_graph(spark, SF_DIR)
    got = {(r.a, r.b) for r in k_truss(g, k=k).collect()}
    edges = [(r.src, r.dst) for r in g.edges.select("src", "dst").collect()]
    want = _python_truss(edges, k)
    assert got == want


def test_truss_nests_in_core_and_in_lower_truss(spark):
    from graphblast_spark.algorithms.kcore import k_core
    from graphblast_spark.sources.tpch_graphs import copurchase_graph

    g = copurchase_graph(spark, SF_DIR)
    t4 = {(r.a, r.b) for r in k_truss(g, k=4).collect()}
    t3 = {(r.a, r.b) for r in k_truss(g, k=3).collect()}
    assert t4 <= t3
    # every vertex of the k-truss is in the (k-1)-core
    verts4 = {v for e in t4 for v in e}
    core3 = {r.id for r in k_core(g, k=3).filter(F.col("in_core") == 1).collect()}
    assert verts4 <= core3


def _python_trussness(edges):
    """Per-edge trussness by increasing-k peel (textbook)."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    out = {}
    k = 2
    while es:
        k += 1
        survivors = _python_truss(es, k)
        for e in es - survivors:
            out[e] = k - 1
        es = survivors
    return out


TRUSS_CASES = [
    # triangle + pendant edge
    [(0, 1), (1, 2), (0, 2), (2, 3)],
    # K5 (trussness 5 everywhere) with a chain tail
    list(itertools.combinations(range(5), 2)) + [(4, 5), (5, 6)],
    # two triangles sharing an edge (all trussness 3) + a 4-clique
    [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3),
     (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)],
]


@pytest.mark.parametrize("edges", TRUSS_CASES)
def test_trussness_matches_peel_oracle(spark, edges):
    from graphblast_spark.algorithms import truss_decomposition

    n = max(max(e) for e in edges) + 1
    g = _graph(spark, edges, n)
    got = {(r.a, r.b): r.trussness for r in truss_decomposition(g).collect()}
    assert got == _python_trussness(edges)
    g.unpersist()


def test_trussness_ktruss_membership_relation(spark):
    from graphblast_spark.algorithms import truss_decomposition

    edges = TRUSS_CASES[2]
    n = max(max(e) for e in edges) + 1
    g = _graph(spark, edges, n)
    tr = {(r.a, r.b): r.trussness for r in truss_decomposition(g).collect()}
    for k in (3, 4):
        members = {(r.a, r.b) for r in k_truss(g, k=k).collect()}
        assert members == {e for e, t in tr.items() if t >= k}, k
    g.unpersist()


def test_trussness_fixed_rounds_upper_bound(spark):
    from graphblast_spark.algorithms import truss_decomposition

    edges = TRUSS_CASES[1]
    n = max(max(e) for e in edges) + 1
    g = _graph(spark, edges, n)
    partial = {
        (r.a, r.b): r.trussness
        for r in truss_decomposition(g, fixed_rounds=1).collect()
    }
    exact = _python_trussness(edges)
    assert all(partial[e] >= exact[e] for e in exact)
    g.unpersist()
