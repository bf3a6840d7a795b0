"""Incremental connected components: exact parity with a cold run
after edge appends, superstep savings from the star-edge warm start
(including the adversarial mid-chain seam the naive warm start
degrades on), label remapping across a dense-id shift, and the
stale-label sanitizer."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms import (
    connected_components,
    incremental_connected_components,
    remap_labels,
)
from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner


def _chain_edges(lo, hi):
    return [(i, i + 1, 1.0) for i in range(lo, hi)]


def _graph(spark, edges, n):
    e = spark.createDataFrame(edges, "src long, dst long, val double")
    return Graph.build(e, vertices=spark.range(n).selectExpr("id"))


def _supersteps(run_dir):
    with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
        return sum(1 for _ in fh)


def test_cold_cc_flattened_star_merge_converges_logarithmically(spark, tmp_path):
    """Regression: two chains each flatten to a depth-1 star within a
    few supersteps; the lower label then invades the 400-star through
    the seam edge. Without the FastSV scatter-hook (f[f(u)] = min(...),
    cc.hpp:83-84) the invader crawls ONE hop per superstep — 200-ish
    supersteps here, silently blowing max_niter=200 with vertex 400
    still unconverged. With it the whole star converts in O(log n)."""
    n = 500
    edges = _chain_edges(0, 249) + _chain_edges(250, 499) + [(100, 350, 1.0)]
    g = _graph(spark, edges, n)
    run_dir = str(tmp_path / "cold_star")
    out = connected_components(g, runner=SuperstepRunner(spark, run_dir=run_dir))
    comps = {r.component for r in out.collect()}
    assert comps == {0}
    assert _supersteps(run_dir) <= 15, _supersteps(run_dir)
    g.unpersist()


def test_incremental_cc_midchain_seam_parity_and_speed(spark, tmp_path):
    """Two 400-vertex chains merged by an edge landing mid-chain — the
    seam is ~200 hops from either old representative, the worst case
    for pure label re-diffusion. The star edges must carry the new
    minimum to the whole old component in O(1) hops: parity with cold
    AND strictly fewer supersteps."""
    n = 800
    base = _chain_edges(0, 399) + _chain_edges(400, 799)
    g1 = _graph(spark, base, n)
    prev = connected_components(g1).localCheckpoint(eager=True)
    assert prev.select("component").distinct().count() == 2

    g2 = _graph(spark, base + [(200, 600, 1.0)], n)
    cold_dir, warm_dir = str(tmp_path / "cold"), str(tmp_path / "warm")
    cold = connected_components(g2, runner=SuperstepRunner(spark, run_dir=cold_dir))
    warm = incremental_connected_components(
        g2, prev, runner=SuperstepRunner(spark, run_dir=warm_dir)
    )
    c = {r.id: r.component for r in cold.collect()}
    w = {r.id: r.component for r in warm.collect()}
    assert w == c
    assert set(c.values()) == {0}
    assert _supersteps(warm_dir) + 3 <= _supersteps(cold_dir), (
        _supersteps(warm_dir),
        _supersteps(cold_dir),
    )
    g1.unpersist()
    g2.unpersist()


def test_incremental_cc_vertex_growth(spark):
    """New vertices (no previous label) seed at their own id; appended
    edges attaching them still produce the cold answer."""
    g1 = _graph(spark, _chain_edges(0, 9), 10)
    prev = connected_components(g1).localCheckpoint(eager=True)
    # grow: 5 new vertices 10..14, chain attached at 9, plus an isolate 14
    g2 = _graph(spark, _chain_edges(0, 9) + _chain_edges(9, 13), 15)
    warm = {r.id: r.component for r in incremental_connected_components(g2, prev).collect()}
    cold = {r.id: r.component for r in connected_components(g2).collect()}
    assert warm == cold
    assert warm[13] == 0 and warm[14] == 14
    g1.unpersist()
    g2.unpersist()


def test_incremental_cc_stale_label_sanitized(spark):
    """A previous label pointing at a vertex that left the graph must
    not drop the row (extract_gather inner-joins) — it falls back to
    the vertex's own id and the run still converges to the cold answer."""
    g = _graph(spark, _chain_edges(0, 4), 5)
    stale = spark.createDataFrame(
        [(i, 999) for i in range(5)], "id long, component long"
    )
    got = {r.id: r.component for r in incremental_connected_components(g, stale).collect()}
    cold = {r.id: r.component for r in connected_components(g).collect()}
    assert got == cold
    g.unpersist()


def test_incremental_cc_id_shift_rep_no_longer_min(spark):
    """After a dense-id remap the old representative can sit ABOVE its
    members in the new numbering. The warm init must still land on the
    cold fixpoint — init = least(own id, carried label) pins the
    fixpoint to the component's min id in the CURRENT numbering, not
    the carried rep."""
    g = _graph(spark, _chain_edges(0, 4), 5)
    # carried labels say the old rep was vertex 4 (as if it had the
    # smallest id before the shift)
    prev = spark.createDataFrame(
        [(i, 4) for i in range(5)], "id long, component long"
    )
    got = {r.id: r.component for r in incremental_connected_components(g, prev).collect()}
    assert got == {i: 0 for i in range(5)}
    g.unpersist()


def test_remap_labels_both_columns(spark):
    """Both the vertex id AND the label value are vertex ids; both must
    travel through the url key when dense ids shift."""
    old_map = spark.createDataFrame(
        [("u/a", 0), ("u/b", 1), ("u/c", 2)], "url string, id long"
    )
    # a new url u/aa sorts between a and b: ids shift to a=0, aa=1, b=2, c=3
    new_map = spark.createDataFrame(
        [("u/a", 0), ("u/aa", 1), ("u/b", 2), ("u/c", 3)], "url string, id long"
    )
    prev = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id long, val long"
    )  # old: b labeled by a's component 0, c labeled by b (old id 1)
    got = {r.id: r.val for r in remap_labels(prev, old_map, new_map).collect()}
    assert got == {0: 0, 2: 0, 3: 2}
