"""SCC + bowtie: crafted digraphs with known answers, plus structural
properties against connected_components on the ordseq fixture."""

import pyspark.sql.functions as F

from graphblast_spark.algorithms.cc import connected_components
from graphblast_spark.algorithms.scc import (
    bowtie_decomposition,
    strongly_connected_components,
)
from graphblast_spark.matrix import Graph

SF_DIR = "/root/testdata/sf0.001"


def _graph(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return Graph.build(e, vertices=v)


def test_scc_crafted(spark):
    # cycle {1,2,3} fed by 0, leaking to sink 6; cycle {4,5} fed by 7
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 6), (7, 4)], 8)
    scc = {r.id: r.scc_id for r in strongly_connected_components(g).collect()}
    assert scc[1] == scc[2] == scc[3] == 1
    assert scc[4] == scc[5] == 4
    assert scc[0] == 0 and scc[6] == 6 and scc[7] == 7


def test_scc_dag_all_singletons(spark):
    g = _graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], 4)
    scc = {r.id: r.scc_id for r in strongly_connected_components(g).collect()}
    assert scc == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_single_cycle(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 0)], 3)
    scc = {r.id: r.scc_id for r in strongly_connected_components(g).collect()}
    assert set(scc.values()) == {0}


def test_bowtie_crafted(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 6), (7, 4)], 8)
    bt = {r.id: r.component for r in bowtie_decomposition(g).collect()}
    assert bt[1] == bt[2] == bt[3] == "CORE"
    assert bt[0] == "IN" and bt[6] == "OUT"
    assert bt[4] == bt[7] == "OTHER"  # {4,5} is a smaller SCC → not core


def test_scc_refines_weak_cc(spark):
    """Every SCC is contained in one weakly connected component, and
    vertices sharing an SCC share the CC label."""
    from graphblast_spark.sources.tpch_graphs import ordseq_graph

    g = ordseq_graph(spark, SF_DIR)
    scc = strongly_connected_components(g)
    cc = connected_components(g)
    joined = scc.join(cc, "id")
    # each scc_id maps to exactly one component
    bad = (
        joined.groupBy("scc_id")
        .agg(F.count_distinct("component").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    assert bad == 0
    # scc count >= cc count (refinement)
    n_scc = scc.select("scc_id").distinct().count()
    n_cc = cc.select("component").distinct().count()
    assert n_scc >= n_cc


def test_scc_label_is_member_min(spark):
    from graphblast_spark.sources.tpch_graphs import ordseq_graph

    g = ordseq_graph(spark, SF_DIR)
    scc = strongly_connected_components(g)
    bad = (
        scc.groupBy("scc_id")
        .agg(F.min("id").alias("m"))
        .filter(F.col("m") != F.col("scc_id"))
        .count()
    )
    assert bad == 0


def test_spam_mass_separates_farm_from_trusted(spark):
    """Trusted pair {0,1} linked to each other; a spam farm {2,3,4,5}
    unreachable from the trusted core gets trust 0 → spam mass 1."""
    from graphblast_spark.algorithms.pagerank import spam_mass, trustrank

    g = _graph(
        spark,
        [(0, 1), (1, 0), (2, 5), (3, 5), (4, 5), (5, 2), (5, 3), (5, 4)],
        6,
    )
    out = {r.id: r for r in spam_mass(g, [0], fixed_iters=15).collect()}
    assert out[1].trust > 0.1          # endorsed by the seed
    assert out[1].spam_mass < 0.1      # nearly all of page 1's rank is trusted
    for v in (2, 3, 4, 5):
        assert out[v].trust == 0.0
        assert abs(out[v].spam_mass - 1.0) < 1e-9

    # trustrank is ppr: mass conservation on the trusted side
    tr = trustrank(g, [0], fixed_iters=15)
    import pyspark.sql.functions as F
    total = tr.agg(F.sum("val")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6


def test_condensation_is_acyclic(spark):
    """The condensation contracts every cycle: running SCC on the
    condensation graph must yield all-singleton components."""
    from graphblast_spark.algorithms.scc import condensation
    from graphblast_spark.sources.tpch_graphs import ordseq_graph

    g = ordseq_graph(spark, SF_DIR)
    cond = condensation(g).withColumnRenamed("src_scc", "src").withColumnRenamed(
        "dst_scc", "dst"
    ).withColumn("val", F.lit(1.0))
    g2 = Graph.build(cond.select("src", "dst", "val"))
    scc2 = strongly_connected_components(g2)
    n = scc2.count()
    assert scc2.select("scc_id").distinct().count() == n


def test_condensation_crafted(spark):
    from graphblast_spark.algorithms.scc import condensation

    # cycle {1,2,3} with two in-edges from 0 and one out to 6
    g = _graph(spark, [(0, 1), (0, 2), (1, 2), (2, 3), (3, 1), (3, 6)], 7)
    rows = {(r.src_scc, r.dst_scc): r.n_edges for r in condensation(g).collect()}
    assert rows == {(0, 1): 2, (1, 6): 1}


def test_weighted_pagerank_reduces_to_unweighted_on_unit_weights(spark):
    from graphblast_spark.algorithms.pagerank import pagerank

    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 2)], 3)
    pu = {r.id: r.val for r in pagerank(g, fixed_iters=8).collect()}
    pw = {r.id: r.val for r in pagerank(g, fixed_iters=8, weighted=True).collect()}
    for v in pu:
        assert abs(pu[v] - pw[v]) < 1e-12


def test_weighted_pagerank_follows_heavy_edge(spark):
    """0 splits rank 9:1 between 1 and 2 → 1 must outrank 2."""
    from graphblast_spark.algorithms.pagerank import pagerank
    from graphblast_spark.matrix import Graph

    e = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, val double",
    )
    v = spark.createDataFrame([(i,) for i in range(3)], "id long")
    g = Graph.build(e, vertices=v)
    pw = {r.id: r.val for r in pagerank(g, fixed_iters=20, weighted=True).collect()}
    assert pw[1] > pw[2] * 3


def test_max_coloring_pointer_jump_flat_and_logarithmic(spark):
    """Pin the round-4 pointer-jump recipe (scc.py _max_coloring):
    O(log d) supersteps on a worst-case path, with per-superstep wall
    time FLAT — the round-3 pathology (wall doubling every round in a
    lineage-truncated-between-joins variant) must not come back."""
    import time as _t

    from graphblast_spark.algorithms.scc import _max_coloring

    N = 2048
    edges = spark.range(N - 1).select(
        (F.col("id") + 1).alias("src"), F.col("id").alias("dst")
    ).repartition(8, "src").persist()
    edges.count()
    verts = spark.range(N).select("id")

    t0 = _t.time()
    color = _max_coloring(edges, verts, "src", "dst", max_inner=40)
    wall = _t.time() - t0
    got = {r["id"]: r["val"] for r in color.collect()}
    assert all(got[i] == N - 1 for i in range(N))  # max id reaches all
    # O(log N) supersteps at sub-second each: the whole fixpoint on a
    # 2048-diameter path must land far below the 40-superstep budget's
    # O(diameter) cost. Generous bound (noisy box): 120 s would mean
    # either O(d) rounds or the doubling pathology returned.
    assert wall < 120, f"pointer-jump coloring took {wall:.1f}s on a 2k path"
    edges.unpersist()
