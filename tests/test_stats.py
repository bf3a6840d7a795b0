"""Graph-shape statistics: hand-computed values on crafted fixtures
(triangle + pendant, directed cycle with one reverse edge, star), and
consistency identities (Σ per-vertex triangles = 3·global count;
histogram covers degree-0 vertices)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms import (
    degree_assortativity,
    degree_histogram,
    local_clustering_coefficient,
    reciprocity,
    triangle_count,
)
from graphblast_spark.matrix import Graph


def _graph(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    return Graph.build(e, vertices=spark.range(n).selectExpr("id"))


@pytest.fixture()
def tri_pendant(spark):
    # triangle 0-1-2 (both directions) + pendant 2->3; vertex 4 isolated
    und = [(0, 1), (1, 2), (0, 2)]
    edges = und + [(b, a) for a, b in und] + [(2, 3)]
    g = _graph(spark, edges, 5)
    yield g
    g.unpersist()


def test_degree_histogram_out_includes_isolated(spark, tri_pendant):
    hist = {r.degree: r.n_vertices for r in degree_histogram(tri_pendant, "out").collect()}
    # out-degrees: 0:2, 1:2, 2:3, 3:0, 4:0
    assert hist == {2: 2, 3: 1, 0: 2}


def test_degree_histogram_und(spark, tri_pendant):
    hist = {r.degree: r.n_vertices for r in degree_histogram(tri_pendant, "und").collect()}
    # undirected degrees: 0:2, 1:2, 2:3, 3:1, 4:0
    assert hist == {2: 2, 3: 1, 1: 1, 0: 1}


def test_degree_histogram_bad_direction(spark, tri_pendant):
    with pytest.raises(ValueError, match="direction"):
        degree_histogram(tri_pendant, "sideways")


def test_reciprocity_values(spark):
    # 4-cycle plus one reverse edge: 5 directed edges, 2 reciprocal
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 0)], 4)
    r = reciprocity(g).first()
    assert (r.n_edges, r.n_reciprocal) == (5, 2)
    assert r.reciprocity == pytest.approx(0.4, abs=1e-6)
    g.unpersist()


def test_reciprocity_symmetric_graph_is_one(spark, tri_pendant):
    # symmetrize: every edge mirrored
    g2 = Graph.build(
        tri_pendant.edges.select("src", "dst", "val"),
        vertices=tri_pendant.vertices,
        symmetrize=True,
    )
    assert reciprocity(g2).first().reciprocity == pytest.approx(1.0, abs=1e-6)
    g2.unpersist()


def test_assortativity_star_is_negative(spark):
    # star: hub 0 to 5 leaves — perfectly disassortative (r = -1)
    g = _graph(spark, [(0, i) for i in range(1, 6)], 6)
    r = degree_assortativity(g).first().assortativity
    assert r == pytest.approx(-1.0, abs=1e-6)
    g.unpersist()


def test_lcc_triangle_pendant(spark, tri_pendant):
    rows = {r.id: r for r in local_clustering_coefficient(tri_pendant).collect()}
    assert rows[0].triangles == 1 and rows[0].lcc == pytest.approx(1.0)
    assert rows[1].triangles == 1 and rows[1].lcc == pytest.approx(1.0)
    # vertex 2: degree 3, one triangle -> 2*1/(3*2) = 1/3
    assert rows[2].triangles == 1 and rows[2].lcc == pytest.approx(0.333333, abs=1e-6)
    assert rows[3].triangles == 0 and rows[3].lcc == 0.0
    assert rows[4].triangles == 0 and rows[4].lcc == 0.0


def test_lcc_sums_to_three_times_global_count(spark):
    from graphblast_spark.sources.mtx import fixture_graph

    g = fixture_graph(spark, "chesapeake", directed=2)
    total = triangle_count(g, orient="degree")
    per_v = local_clustering_coefficient(g).agg(F.sum("triangles")).first()[0]
    assert per_v == 3 * total
    g.unpersist()
