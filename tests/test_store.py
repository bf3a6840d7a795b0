"""Bucketed graph store: round-trip fidelity + the shuffle-free reload
plan (the whole point — reference sparse_matrix.hpp:328-345 reloads the
built CSR without re-parsing; here reload must not re-shuffle |E|)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.descriptor import Descriptor, MxvMode
from graphblast_spark.matrix import Graph
from graphblast_spark.operators import vxm
from graphblast_spark.plans import count_exchanges
from graphblast_spark.sources.mtx import fixture_graph
from graphblast_spark.sources.store import drop_graph, load_graph, save_graph


@pytest.fixture()
def stored(spark, tmp_path):
    g = fixture_graph(spark, "chesapeake")
    save_graph(g, "tg_store", path=str(tmp_path / "tg_store"))
    yield g
    drop_graph(spark, "tg_store")
    g.unpersist()


def test_round_trip_preserves_graph(spark, stored):
    g2 = load_graph(spark, "tg_store")
    assert (g2.n, g2.nvals) == (stored.n, stored.nvals)
    assert g2.edges.count() == stored.nvals
    orig = {(r.src, r.dst, r.val) for r in stored.edges.collect()}
    back = {(r.src, r.dst, r.val) for r in g2.edges.collect()}
    assert back == orig
    assert g2.vertices.count() == stored.n


def test_reloaded_edges_join_without_edge_side_exchange(spark, stored):
    """A src-keyed aggregation over the bucketed table must read the
    bucket spec instead of inserting an Exchange: 0 shuffles for the
    groupBy (vs 1 from a plain parquet round-trip)."""
    g2 = load_graph(spark, "tg_store")
    deg = g2.edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
    deg.collect()
    assert count_exchanges(deg) == 0, count_exchanges(deg)

    # and the vecmat pull join: only the vector side may exchange
    u = g2.vertices.select("id", F.lit(1.0).alias("val"))
    out = vxm(u, g2, "PlusMultiplies", u_nvals=g2.n,
              desc=Descriptor(mxv_mode=MxvMode.PULLONLY), salt=None)
    out.collect()
    # vector-side exchange + group-key exchange; edge side contributes 0
    assert count_exchanges(out) <= 2, count_exchanges(out)


def test_reload_algorithms_agree_with_built_graph(spark, stored):
    g2 = load_graph(spark, "tg_store")
    from graphblast_spark.algorithms import pagerank

    a = {r.id: round(r.val, 8) for r in pagerank(stored, fixed_iters=3).collect()}
    b = {r.id: round(r.val, 8) for r in pagerank(g2, fixed_iters=3).collect()}
    assert a == b
