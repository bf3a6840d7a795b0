"""Maximal matching — validity, maximality, determinism, resume."""

import pytest
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.algorithms import maximal_matching
from graphblast_spark.sources.fixtures import FIXTURES
from graphblast_spark.sources.mtx import fixture_graph


def _und_edges(name):
    fx = FIXTURES[name]
    return set(
        (min(s, d), max(s, d)) for s, d, _ in fx["edges"] if s != d
    )


def _check(matching, und):
    verts = [v for ab in matching for v in ab]
    assert len(verts) == len(set(verts)), "two matched edges share a vertex"
    assert set(matching) <= und, "matched a non-edge"
    mset = set(verts)
    for a, b in und:
        assert a in mset or b in mset, f"unmatched edge ({a},{b}) — not maximal"


@pytest.mark.parametrize("name", ["test_pr", "chesapeake", "test_cc"])
def test_matching_valid_maximal_deterministic(spark, name):
    g = fixture_graph(spark, name)
    und = _und_edges(name)
    m1 = sorted((r.a, r.b) for r in maximal_matching(g).collect())
    _check(m1, und)
    m2 = sorted((r.a, r.b) for r in maximal_matching(g).collect())
    assert m1 == m2
    g.unpersist()


def test_matching_fixed_rounds_is_prefix_valid(spark):
    # fixed_rounds=1 is a valid (maybe non-maximal) matching and a
    # subset of what the converged run matches in round 1
    g = fixture_graph(spark, "chesapeake")
    und = _und_edges("chesapeake")
    m1 = sorted((r.a, r.b) for r in maximal_matching(g, fixed_rounds=1).collect())
    verts = [v for ab in m1 for v in ab]
    assert len(verts) == len(set(verts))
    assert set(m1) <= und
    full = sorted((r.a, r.b) for r in maximal_matching(g).collect())
    assert set(m1) <= set(full)
    g.unpersist()


def test_matching_resume_preserves_matches(spark, tmp_path):
    from graphblast_spark.runtime.superstep import SuperstepRunner

    g = fixture_graph(spark, "chesapeake")
    und = _und_edges("chesapeake")
    full = sorted((r.a, r.b) for r in maximal_matching(g).collect())

    run_dir = str(tmp_path / "mm")
    r1 = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        maximal_matching(g, runner=r1, max_rounds=1)

    r2 = SuperstepRunner(spark, run_dir=run_dir, checkpoint_every=1)
    resumed = sorted(
        (r.a, r.b) for r in maximal_matching(g, runner=r2).collect()
    )
    assert resumed == full
    _check(resumed, und)
    g.unpersist()


def test_matching_empty_graph(spark):
    e = spark.createDataFrame([(0, 0, 1.0)], "src long, dst long, val double")
    g = Graph.build(e, vertices=spark.range(2).selectExpr("id"),
                    drop_self_loops=False, dedup=False)
    out = maximal_matching(g)
    assert out.columns == ["a", "b"]
    assert out.count() == 0
    g.unpersist()
