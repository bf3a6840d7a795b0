"""Property-based operator tests (hypothesis) — random tiny graphs and
vectors vs numpy oracles, the per-operator layer of SURVEY §5.1 made
adversarial. One strategy generates an edge list + vector; each example
asserts vxm/mxv/eWise semantics against a direct numpy evaluation."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphblast_spark.descriptor import Descriptor, MxvMode
from graphblast_spark.matrix import Graph
from graphblast_spark.operators import ewise_add, ewise_mult, mxv, vxm

N = 8  # vertex universe per example — small keeps each Spark job ~100ms


@st.composite
def graph_and_vec(draw):
    n_edges = draw(st.integers(1, 20))
    edges = draw(
        st.lists(
            st.tuples(st.integers(0, N - 1), st.integers(0, N - 1),
                      st.integers(1, 9)),
            min_size=n_edges, max_size=n_edges,
        )
    )
    vec = draw(st.lists(st.integers(0, 9), min_size=N, max_size=N))
    return edges, vec


def _mk(spark, edges):
    df = spark.createDataFrame(
        [(s, d, float(v)) for s, d, v in edges], "src long, dst long, val double"
    )
    vertices = spark.range(N).select("id")
    return Graph.build(df, vertices=vertices)


_settings = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(gv=graph_and_vec())
@_settings
def test_vxm_plus_times_matches_numpy(spark, gv):
    edges, vec = gv
    g = _mk(spark, edges)
    # deduped last-cleaned edges (build drops dups/self-loops)
    kept = {}
    for s, d, v in edges:
        if s != d:
            kept.setdefault((s, d), float(v))
    u = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(vec)], "id long, val double"
    )
    got = {r["id"]: r["val"] for r in vxm(u, g, "PlusMultiplies", u_nvals=N).collect()}
    expect = {}
    for (s, d), v in kept.items():
        expect[d] = expect.get(d, 0.0) + vec[s] * v
    assert set(got) == {d for d in expect}
    for d in expect:
        assert got[d] == pytest.approx(expect[d])
    g.unpersist()


@given(gv=graph_and_vec())
@_settings
def test_mxv_equals_vxm_on_transpose(spark, gv):
    """mxv(A, u) ≡ vxm(u, Aᵀ) — the reference's INP1-toggle identity
    (backend/cuda/operations.hpp:107)."""
    edges, vec = gv
    g = _mk(spark, edges)
    u = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(vec)], "id long, val double"
    )
    a = {r["id"]: r["val"] for r in mxv(u, g, "MinimumPlus", u_nvals=N).collect()}
    gt = Graph(edges=g.edges.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst"), "val"),
               vertices=g.vertices, n=g.n, nvals=g.nvals)
    b = {r["id"]: r["val"] for r in vxm(u, gt, "MinimumPlus", u_nvals=N).collect()}
    assert a == b
    g.unpersist()


@given(gv=graph_and_vec())
@_settings
def test_push_pull_agree(spark, gv):
    """Direction choice is a physical decision only — push (broadcast)
    and pull (shuffle) must be value-identical."""
    edges, vec = gv
    g = _mk(spark, edges)
    u = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(vec)], "id long, val double"
    )
    push = {r["id"]: r["val"] for r in vxm(
        u, g, "PlusMultiplies", desc=Descriptor(mxv_mode=MxvMode.PUSHONLY)).collect()}
    pull = {r["id"]: r["val"] for r in vxm(
        u, g, "PlusMultiplies", desc=Descriptor(mxv_mode=MxvMode.PULLONLY)).collect()}
    assert push.keys() == pull.keys()
    for k in push:
        assert push[k] == pytest.approx(pull[k])
    g.unpersist()


@given(
    u=st.lists(st.tuples(st.integers(0, N - 1), st.integers(-9, 9)), max_size=10),
    v=st.lists(st.tuples(st.integers(0, N - 1), st.integers(-9, 9)), max_size=10),
)
@_settings
def test_ewise_structures(spark, u, v):
    """eWiseMult = intersection of structures, eWiseAdd = union with
    identity fill (operations.hpp:129-158, 269-299)."""
    ud = dict(u)
    vd = dict(v)
    udf = spark.createDataFrame(
        [(i, float(x)) for i, x in ud.items()], "id long, val double")
    vdf = spark.createDataFrame(
        [(i, float(x)) for i, x in vd.items()], "id long, val double")
    m = {r["id"]: r["val"] for r in ewise_mult(udf, vdf, "PlusMultiplies").collect()}
    a = {r["id"]: r["val"] for r in ewise_add(udf, vdf, "PlusMultiplies").collect()}
    assert set(m) == set(ud) & set(vd)
    assert set(a) == set(ud) | set(vd)
    for k in m:
        assert m[k] == pytest.approx(ud[k] * vd[k])
    for k in a:
        assert a[k] == pytest.approx(ud.get(k, 0) + vd.get(k, 0))
