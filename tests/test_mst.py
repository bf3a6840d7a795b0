"""Borůvka minimum spanning forest vs a python Kruskal replay.

The (w, a, b) struct tie-break makes every edge weight distinct as a
tuple, so the MSF is unique and Borůvka and Kruskal must produce the
IDENTICAL edge set — the strongest possible cross-algorithm pin.
"""

import pytest
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.algorithms import minimum_spanning_forest


def _kruskal(n, edges):
    """Kruskal under the (w, a, b) total order — canonical min weight
    per undirected pair first, like _canonical_weighted."""
    best = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.append((a, b, w))
    return sorted(forest)


def _run(spark, n, edges):
    e = spark.createDataFrame(edges, "src long, dst long, val double")
    g = Graph.build(e, vertices=spark.range(n).selectExpr("id"),
                    drop_self_loops=False, dedup=False)
    got = sorted(
        (r.a, r.b, r.w) for r in minimum_spanning_forest(g).collect()
    )
    g.unpersist()
    return got


def test_mst_matches_kruskal_weighted(spark):
    edges = [
        (0, 1, 4.0), (0, 2, 1.0), (1, 2, 3.0), (1, 3, 2.0),
        (2, 3, 5.0), (3, 4, 1.5), (4, 5, 6.0), (2, 5, 2.5),
        (5, 6, 0.5), (6, 0, 9.0), (1, 6, 7.0),
    ]
    assert _run(spark, 7, edges) == _kruskal(7, edges)


def test_mst_all_ties_and_parallel_edges(spark):
    # equal weights everywhere + duplicated/reversed parallel edges:
    # the tuple tie-break still yields Kruskal's unique forest
    base = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)]
    edges = [(a, b, 1.0) for a, b in base] + [(b, a, 1.0) for a, b in base]
    edges += [(0, 1, 1.0)]  # parallel duplicate
    got = _run(spark, 4, edges)
    assert got == _kruskal(4, edges)
    assert len(got) == 3  # spanning tree of 4 connected vertices


def test_mst_disconnected_forest(spark):
    edges = [(0, 1, 2.0), (1, 2, 1.0), (3, 4, 5.0)]  # two components
    got = _run(spark, 5, edges)
    assert got == _kruskal(5, edges)
    assert len(got) == 3  # (3 vertices - 1) + (2 vertices - 1)


def test_mst_empty_and_selfloop_only(spark):
    e = spark.createDataFrame([(0, 0, 1.0)], "src long, dst long, val double")
    g = Graph.build(e, vertices=spark.range(2).selectExpr("id"),
                    drop_self_loops=False, dedup=False)
    out = minimum_spanning_forest(g)
    assert out.columns == ["a", "b", "w"]
    assert out.count() == 0
    g.unpersist()


def test_mst_chain_cycle_property(spark):
    # the g_mst contract shape in miniature: chain at w=1 + heavy
    # extras -> the MSF is exactly the chain (cycle property)
    n = 9
    chain = [(i, i + 1, 1.0) for i in range(n - 1)]
    extras = [(0, 5, 5.0), (2, 7, 5.0), (3, 8, 5.0), (1, 6, 5.0)]
    got = _run(spark, n, chain + extras)
    assert got == [(i, i + 1, 1.0) for i in range(n - 1)]


def test_mst_resume_preserves_forest(spark, tmp_path):
    """A resumed run must keep the edges selected before the crash —
    the forest is checkpointed state, not rebuilt from scratch."""
    from graphblast_spark.runtime.superstep import SuperstepRunner

    edges = [
        (0, 1, 4.0), (0, 2, 1.0), (1, 2, 3.0), (1, 3, 2.0),
        (2, 3, 5.0), (3, 4, 1.5), (4, 5, 6.0), (2, 5, 2.5),
        (5, 6, 0.5), (6, 0, 9.0), (1, 6, 7.0), (6, 7, 8.0),
    ]
    e = spark.createDataFrame(edges, "src long, dst long, val double")
    g = Graph.build(e, vertices=spark.range(8).selectExpr("id"),
                    drop_self_loops=False, dedup=False)
    full = sorted((r.a, r.b, r.w) for r in minimum_spanning_forest(g).collect())

    run_dir = str(tmp_path / "mst")
    r1 = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        minimum_spanning_forest(g, runner=r1, max_rounds=1)  # die after rd 0

    r2 = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=1)
    resumed = sorted(
        (r.a, r.b, r.w)
        for r in minimum_spanning_forest(g, runner=r2).collect()
    )
    assert resumed == full == _kruskal(8, edges)
    g.unpersist()
