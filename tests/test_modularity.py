"""community_modularity / modularity: hand-computed values on known
partitions, the Σ-contribution identities (Q = 0 for the all-in-one
partition; Q of singletons = −Σ k_out·k_in/m²), and label coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms import community_modularity, modularity
from graphblast_spark.matrix import Graph


@pytest.fixture()
def two_cliques(spark):
    # two directed 3-cycles bridged by one edge: communities {0,1,2}, {3,4,5}
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    g = Graph.build(e, vertices=spark.range(6).selectExpr("id"))
    yield g
    g.unpersist()


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label long")


def test_modularity_two_communities_hand_value(spark, two_cliques):
    labels = _labels(spark, [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)])
    per = {r.label: r for r in community_modularity(two_cliques, labels).collect()}
    # m=7; community 0: within 3, out 4 (incl. bridge 2->3), in 3
    assert per[0].within_weight == 3.0
    assert per[0].out_strength == 4.0
    assert per[0].in_strength == 3.0
    assert per[0].contribution == pytest.approx(3 / 7 - (4 * 3) / 49, abs=1e-6)
    # community 1: within 3, out 3, in 4
    assert per[1].contribution == pytest.approx(3 / 7 - (3 * 4) / 49, abs=1e-6)
    q = modularity(two_cliques, labels)
    assert q == pytest.approx(6 / 7 - 24 / 49, abs=1e-5)


def test_modularity_single_partition_is_zero(spark, two_cliques):
    labels = _labels(spark, [(i, 42) for i in range(6)])
    assert modularity(two_cliques, labels) == pytest.approx(0.0, abs=1e-6)


def test_modularity_singletons_negative_expected_term(spark, two_cliques):
    labels = _labels(spark, [(i, i) for i in range(6)])
    # no within edges (no self-loops): Q = -Σ k_out·k_in / m²
    degs = {
        r.id: (r.ko or 0, r.ki or 0)
        for r in two_cliques.edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("ko"))
        .join(
            two_cliques.edges.groupBy(F.col("dst").alias("id")).agg(
                F.count("*").alias("ki")
            ),
            "id",
            "outer",
        )
        .collect()
    }
    expected = -sum(ko * ki for ko, ki in degs.values()) / 49
    assert modularity(two_cliques, labels) == pytest.approx(expected, abs=1e-5)


def test_modularity_covers_edgeless_labels(spark, two_cliques):
    # a label whose only member has no edges still gets a row (contribution 0)
    labels = _labels(
        spark, [(i, 0) for i in range(6)] + [(99, 7)]
    )  # vertex 99 not in the graph
    per = {r.label: r for r in community_modularity(two_cliques, labels).collect()}
    assert per[7].contribution == 0.0 and per[7].within_weight == 0.0


def test_write_mtx_round_trip(spark, tmp_path):
    from graphblast_spark.sources.mtx import mtx_graph, read_mtx, write_mtx
    from graphblast_spark.sources.mtx import fixture_graph

    g = fixture_graph(spark, "chesapeake")
    p = str(tmp_path / "out.mtx")
    write_mtx(g, p)
    n, sym, edges = read_mtx(p)
    assert n == g.n and not sym and len(edges) == g.nvals
    back = mtx_graph(spark, p)
    orig = {(r.src, r.dst, r.val) for r in g.edges.collect()}
    got = {(r.src, r.dst, r.val) for r in back.edges.collect()}
    assert got == orig
    # pattern variant: values dropped, banner says pattern, val -> 1.0
    p2 = str(tmp_path / "out_pat.mtx")
    write_mtx(g, p2, pattern=True)
    n2, _, edges2 = read_mtx(p2)
    assert n2 == g.n and all(v == 1.0 for _, _, v in edges2)
    g.unpersist()
    back.unpersist()
