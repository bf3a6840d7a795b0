"""Unit tests for the inventory-gap operators (SURVEY §2.1-2.4):
fused applyVxm, matrix×vector broadcast eWiseMult, extract/setElement/
countUnique helpers — numpy-oracle style like test_operators.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphblast_spark.operators import (
    apply_vxm,
    count_unique,
    ewise_mult_matrix_vector,
    extract_element,
    extract_subvector,
    set_element,
    vxm,
)
from graphblast_spark.sources.fixtures import FIXTURES
from graphblast_spark.sources.mtx import fixture_graph


@pytest.fixture(scope="module")
def ches(spark):
    g = fixture_graph(spark, "chesapeake")
    yield g
    g.unpersist()


def _edges_np(g):
    return [(r["src"], r["dst"], r["val"]) for r in g.edges.collect()]


def test_apply_vxm_equals_manual_compose(spark, ches):
    u = ches.vertices.select("id", (F.col("id") + 1.0).alias("val"))
    fused = apply_vxm(u, ches, lambda c: c * 2.0, "PlusMultiplies", u_nvals=ches.n)
    manual = vxm(u.select("id", (F.col("val") * 2.0).alias("val")),
                 ches, "PlusMultiplies", u_nvals=ches.n)
    got = {r["id"]: r["val"] for r in fused.collect()}
    exp = {r["id"]: r["val"] for r in manual.collect()}
    assert got.keys() == exp.keys()
    for k in got:
        assert got[k] == pytest.approx(exp[k], rel=1e-12)


@pytest.mark.parametrize("axis", ["col", "row"])
def test_ewise_mult_matrix_vector(spark, ches, axis):
    u = ches.vertices.select("id", ((F.col("id") % 5) + 1.0).alias("val"))
    out = ewise_mult_matrix_vector(ches, u, "PlusMultiplies", axis=axis)
    uvals = {r["id"]: r["val"] for r in u.collect()}
    for r in out.limit(50).collect():
        key = r["dst"] if axis == "col" else r["src"]
        assert r["val"] == pytest.approx(1.0 * uvals[key], rel=1e-12)
    assert out.count() == ches.nvals


def test_extract_set_element_count_unique(spark, ches):
    u = ches.vertices.select("id", (F.col("id") % 3).cast("double").alias("val"))
    sub = extract_subvector(u, spark.range(5).select("id"))
    assert sub.count() == 5
    u2 = set_element(u, 7, 99.0)
    assert extract_element(u2, 7) == 99.0
    assert extract_element(u, 7) == pytest.approx(7 % 3)
    assert extract_element(u, 10**9) is None
    assert count_unique(u) == 3
    assert count_unique(u2) == 4


def test_salted_vecmat_equals_unsalted(spark, ches):
    """Two-phase salted reduce (skew handling) must be value-identical
    for min/max and allclose for sums."""
    u = ches.vertices.select("id", ((F.col("id") % 7) + 1).cast("double").alias("val"))
    plain = {r["id"]: r["val"] for r in vxm(u, ches, "PlusMultiplies", u_nvals=ches.n).collect()}
    salted = {r["id"]: r["val"] for r in vxm(u, ches, "PlusMultiplies", u_nvals=ches.n, salt=4).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)
    pm = {r["id"]: r["val"] for r in vxm(u, ches, "MinimumPlus", u_nvals=ches.n, salt=8).collect()}
    pn = {r["id"]: r["val"] for r in vxm(u, ches, "MinimumPlus", u_nvals=ches.n).collect()}
    assert pm == pn
