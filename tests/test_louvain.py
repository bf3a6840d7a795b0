import pytest
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.algorithms import louvain
from graphblast_spark.algorithms.lp import modularity


def _clique_edges(members):
    ms = list(members)
    return [
        (ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))
    ]


def _graph(spark, edges, n, weights=None):
    w = weights or {}
    e = spark.createDataFrame(
        [(a, b, float(w.get((a, b), 1.0))) for a, b in edges],
        "src long, dst long, val double",
    )
    return Graph.build(e, vertices=spark.range(n).selectExpr("id"))


def test_louvain_two_cliques_exact_partition(spark):
    edges = _clique_edges(range(4)) + _clique_edges(range(4, 8)) + [(3, 4)]
    g = _graph(spark, edges, 8)
    got = {r.id: r.community for r in louvain(g, levels=3).collect()}
    assert len(got) == 8
    left = {got[v] for v in range(4)}
    right = {got[v] for v in range(4, 8)}
    assert len(left) == 1 and len(right) == 1 and left != right
    lab = louvain(g, levels=3).withColumnRenamed("community", "label")
    assert modularity(g, lab) > 0.3
    g.unpersist()


def test_louvain_ring_of_cliques_multilevel(spark):
    # 4 cliques of 5 joined in a ring — the canonical Louvain fixture:
    # level-1 local moves gather the cliques, contraction keeps them.
    cliques = [list(range(5 * i, 5 * i + 5)) for i in range(4)]
    edges = []
    for c in cliques:
        edges += _clique_edges(c)
    for i in range(4):
        edges.append((cliques[i][0], cliques[(i + 1) % 4][1]))
    g = _graph(spark, edges, 20)
    got = {r.id: r.community for r in louvain(g, levels=3, move_rounds=6).collect()}
    labels_per_clique = [{got[v] for v in c} for c in cliques]
    assert all(len(s) == 1 for s in labels_per_clique)
    assert len({next(iter(s)) for s in labels_per_clique}) == 4
    g.unpersist()


def test_louvain_deterministic_and_weight_sensitive(spark):
    # heavy bridge dominating the triangles must merge them; two runs
    # of the same input are identical (no randomness anywhere)
    edges = _clique_edges(range(3)) + _clique_edges(range(3, 6)) + [(2, 3)]
    g_light = _graph(spark, edges, 6)
    g_heavy = _graph(spark, edges, 6, weights={(2, 3): 50.0})
    a = sorted(louvain(g_light, levels=2).collect())
    b = sorted(louvain(g_light, levels=2).collect())
    assert a == b
    light = {r.id: r.community for r in a}
    assert light[0] != light[5]  # light bridge: triangles stay apart
    heavy = {r.id: r.community for r in louvain(g_heavy, levels=3, move_rounds=6).collect()}
    assert heavy[2] == heavy[3]  # heavy bridge: its endpoints co-move
    g_light.unpersist()
    g_heavy.unpersist()


def test_louvain_validates_knobs(spark):
    g = _graph(spark, [(0, 1)], 2)
    with pytest.raises(ValueError):
        louvain(g, levels=0)
    with pytest.raises(ValueError):
        louvain(g, move_rounds=0)
    g.unpersist()


def test_louvain_improves_modularity_over_singletons(spark):
    edges = _clique_edges(range(4)) + _clique_edges(range(4, 8)) + [(0, 4)]
    g = _graph(spark, edges, 8)
    singleton = g.vertices.select("id", F.col("id").alias("label"))
    q0 = modularity(g, singleton)
    q1 = modularity(
        g, louvain(g, levels=2).withColumnRenamed("community", "label")
    )
    assert q1 > q0
    g.unpersist()


def test_louvain_keeps_isolated_vertices_as_singletons(spark):
    # vertex 6 is in the universe but has no edges: it must appear in
    # the output as its own community, like every other labeling algo
    edges = _clique_edges(range(3)) + _clique_edges(range(3, 6))
    g = _graph(spark, edges, 7)
    got = {r.id: r.community for r in louvain(g, levels=2).collect()}
    assert len(got) == 7
    assert got[6] == 6
    assert sum(1 for v in got.values() if v == 6) == 1
    g.unpersist()
