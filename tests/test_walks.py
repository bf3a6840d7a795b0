"""Deterministic random walks + layered neighborhood sampling.

The reference ships no walk sampler (nearest primitive is the BFS
frontier vxm, graphblas/algorithm/bfs.hpp:14-89); these are the
training-data-pipeline additions for link-graph representation
learning. Verification style: replay the pure-hash step rule in
numpy and demand byte-identical walks, then structural checks
(every hop is an edge, layers respect fanouts).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms.walks import (
    _A_ID,
    _A_STEP,
    _A_WALK,
    _MOD,
    adjacency_arrays,
    neighborhood_sample,
    random_walks,
)
from graphblast_spark.sources.fixtures import FIXTURES
from graphblast_spark.sources.mtx import fixture_graph


def _sym_edges(name):
    fx = FIXTURES[name]
    edges = [(s, d) for s, d, _ in fx["edges"]]
    if fx["symmetric"]:
        edges = edges + [(d, s) for s, d in edges]
    return fx["n"], sorted(set((s, d) for s, d in edges if s != d))


def _walk_oracle(n, edges, roots, length):
    """numpy replay of the documented step rule."""
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s] = sorted(nbrs[s])
    out = []
    for r in roots:
        v = r
        out.append((r, 0, r))
        for t in range(length):
            ns = nbrs.get(v)
            if not ns:
                break
            h = (r * _A_WALK + t * _A_STEP + v * _A_ID) % _MOD
            v = ns[h % len(ns)]
            out.append((r, t + 1, v))
    return sorted(out)


@pytest.mark.parametrize("name", ["test_pr", "chesapeake", "test_cc"])
def test_random_walks_match_numpy_replay(spark, name):
    n, edges = _sym_edges(name)
    g = fixture_graph(spark, name)
    roots = list(range(min(n, 16)))
    got = sorted(
        (r["walk_id"], r["step"], r["id"])
        for r in random_walks(g, n_roots=len(roots), walk_length=5).collect()
    )
    assert got == _walk_oracle(n, edges, roots, 5)


def test_random_walks_every_hop_is_an_edge(spark):
    name = "chesapeake"
    n, edges = _sym_edges(name)
    eset = set(edges)
    g = fixture_graph(spark, name)
    walks = random_walks(g, n_roots=8, walk_length=6, walks_per_root=2).collect()
    by_walk = {}
    for r in walks:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["id"]
    assert len(by_walk) == 16  # 8 roots x 2 walks
    for wid, steps in by_walk.items():
        assert steps[0] == wid // 2  # walk_id = root*k + j
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
        # contiguous steps (walk only stops at a dead end, then stays stopped)
        assert sorted(steps) == list(range(max(steps) + 1))


def test_random_walks_max_degree_truncation(spark):
    g = fixture_graph(spark, "chesapeake")
    adj = adjacency_arrays(g, max_degree=3)
    rows = adj.collect()
    assert all(len(r["nbrs"]) <= 3 for r in rows)
    assert all(r["deg"] == len(r["nbrs"]) for r in rows)
    full = {r["src"]: r["nbrs"] for r in adjacency_arrays(g).collect()}
    for r in rows:
        assert r["nbrs"] == full[r["src"]][:3]  # keeps the smallest-dst prefix


def test_neighborhood_sample_layers_and_fanouts(spark):
    name = "chesapeake"
    n, edges = _sym_edges(name)
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    g = fixture_graph(spark, name)
    fanouts = (3, 2)
    rows = neighborhood_sample(g, n_roots=6, fanouts=fanouts).collect()
    by = {}
    for r in rows:
        by.setdefault((r["root"], r["layer"]), set()).add(r["id"])
    for root in range(6):
        assert by[(root, 0)] == {root}
        prev = {root}
        for t, k in enumerate(fanouts):
            layer = by.get((root, t + 1), set())
            # every sampled vertex is a true neighbor of some prev-layer vertex
            for v in layer:
                assert any(v in nbrs.get(u, set()) for u in prev)
            # fanout bound: at most k children per parent
            assert len(layer) <= k * len(prev)
            prev = layer


def test_neighborhood_sample_deterministic_across_runs(spark):
    g = fixture_graph(spark, "test_pr")
    a = sorted(map(tuple, neighborhood_sample(g, n_roots=4).collect()))
    b = sorted(map(tuple, neighborhood_sample(g, n_roots=4).collect()))
    assert a == b


def test_random_walks_explicit_roots_df(spark):
    g = fixture_graph(spark, "test_pr")
    roots = g.vertices.filter(F.col("id") < 3)
    walks = random_walks(g, roots=roots, walk_length=4).collect()
    assert {r["walk_id"] for r in walks} <= {0, 1, 2}
    assert {r["id"] for r in walks if r["step"] == 0} <= {0, 1, 2}


def test_sampled_adjacency_salted_equals_unsalted(spark):
    """The two-stage salted rank must produce byte-identical sampled
    adjacency to the single-window rank — salting is a physical de-skew
    only, never a semantic change."""
    from graphblast_spark.algorithms.walks import sampled_adjacency

    g = fixture_graph(spark, "chesapeake")
    unsalted = sorted(map(tuple, sampled_adjacency(g, kmax=3, n_salts=1).collect()))
    for s in (2, 8, 64):
        salted = sorted(map(tuple, sampled_adjacency(g, kmax=3, n_salts=s).collect()))
        assert salted == unsalted, f"n_salts={s} diverged"
    g.unpersist()


def test_neighborhood_sample_salted_equals_unsalted(spark):
    g = fixture_graph(spark, "chesapeake")
    a = sorted(map(tuple, neighborhood_sample(g, n_roots=6, n_salts=1).collect()))
    b = sorted(map(tuple, neighborhood_sample(g, n_roots=6, n_salts=8).collect()))
    assert a == b
    g.unpersist()


def test_adjacency_arrays_salted_cap_equals_plain_truncation(spark):
    g = fixture_graph(spark, "chesapeake")
    plain = {r["src"]: r["nbrs"] for r in adjacency_arrays(g, max_degree=3, n_salts=1).collect()}
    salted = {r["src"]: r["nbrs"] for r in adjacency_arrays(g, max_degree=3, n_salts=8).collect()}
    assert plain == salted
    g.unpersist()


def test_adjacency_arrays_auto_cap_from_degree_stats(spark):
    """auto = unbounded while the hub fits the budget; a tiny injected
    budget must force the cap (the vxm auto-salt posture)."""
    import graphblast_spark.algorithms.walks as W

    g = fixture_graph(spark, "chesapeake")
    hub = g.hub_degree("src")
    assert hub > 3
    full = {r["src"]: r["nbrs"] for r in adjacency_arrays(g, max_degree=None).collect()}
    auto = {r["src"]: r["nbrs"] for r in adjacency_arrays(g).collect()}
    assert auto == full  # budget not exceeded → uncapped
    old = W.AUTO_DEGREE_BUDGET
    W.AUTO_DEGREE_BUDGET = 3
    try:
        capped = {r["src"]: r["nbrs"] for r in adjacency_arrays(g).collect()}
    finally:
        W.AUTO_DEGREE_BUDGET = old
    assert all(len(v) <= 3 for v in capped.values())
    assert all(capped[s] == full[s][:3] for s in capped)
    g.unpersist()


def test_sampled_adjacency_plan_has_no_full_edge_single_window(spark):
    """When salting is forced, stage 1 must window over (src, salt) —
    the hub's edge list may never land in one sort task."""
    from graphblast_spark.algorithms.walks import sampled_adjacency

    g = fixture_graph(spark, "chesapeake")
    plan = sampled_adjacency(g, kmax=3, n_salts=8)._jdf.queryExecution().optimizedPlan().toString()
    n_windows = plan.count("Window [")
    assert n_windows == 2, plan  # salted pre-rank + bounded re-rank
    assert "pmod" in plan.lower()
    g.unpersist()


def _n2v_oracle(n, edges, roots, length, p, q):
    from graphblast_spark.algorithms.walks import _N2V_OFFSET, _n2v_weights

    wr, wc, wo = _n2v_weights(p, q)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    nbrs = {s: sorted(ds) for s, ds in adj.items()}

    def h(w, t, v):
        return (w * _A_WALK + t * _A_STEP + v * _A_ID) % _MOD

    out = []
    for r in roots:
        v = r
        out.append((r, 0, r))
        if v not in nbrs:
            continue
        ns = nbrs[v]
        prev, v = v, ns[h(r, 0, v) % len(ns)]
        out.append((r, 1, v))
        for t in range(1, length):
            if v not in nbrs:
                break
            cands = nbrs[v]
            ws = [
                wr if x == prev else (wc if x in adj.get(prev, set()) else wo)
                for x in cands
            ]
            tot = sum(ws)
            rr = (h(r, t, v) * _MOD + h(r, t + _N2V_OFFSET, v)) % tot
            s_, pick = 0, -1
            for i, w_ in enumerate(ws):
                s_ += w_
                if pick < 0 and s_ > rr:
                    pick = i
            prev, v = v, cands[pick]
            out.append((r, t + 1, v))
    return sorted(out)


@pytest.mark.parametrize("name,p,q", [
    ("test_pr", 2.0, 0.5),
    ("chesapeake", 0.25, 4.0),
    ("test_cc", 1.0, 1.0),
])
def test_node2vec_walks_match_python_replay(spark, name, p, q):
    from graphblast_spark.algorithms.walks import node2vec_walks

    n, edges = _sym_edges(name)
    g = fixture_graph(spark, name)
    roots = list(range(min(n, 16)))
    got = sorted(
        (r["walk_id"], r["step"], r["id"])
        for r in node2vec_walks(
            g, n_roots=len(roots), walk_length=5, p=p, q=q
        ).collect()
    )
    assert got == _n2v_oracle(n, edges, roots, 5, p, q)


def test_node2vec_first_step_is_uniform_rule(spark):
    """Step 0→1 has no prev vertex, so it must coincide with
    random_walks' uniform pick — the documented degenerate case."""
    from graphblast_spark.algorithms.walks import node2vec_walks

    g = fixture_graph(spark, "chesapeake")
    uni = {
        (r["walk_id"], r["step"]): r["id"]
        for r in random_walks(g, n_roots=8, walk_length=1).collect()
    }
    n2v = {
        (r["walk_id"], r["step"]): r["id"]
        for r in node2vec_walks(
            g, n_roots=8, walk_length=3, p=4.0, q=0.25
        ).collect()
        if r["step"] <= 1
    }
    assert n2v == uni


def test_node2vec_every_hop_is_an_edge_and_validates_pq(spark):
    from graphblast_spark.algorithms.walks import node2vec_walks

    n, edges = _sym_edges("test_pr")
    eset = set(edges)
    g = fixture_graph(spark, "test_pr")
    rows = node2vec_walks(g, n_roots=8, walk_length=4, p=0.5, q=2.0).collect()
    byw = {}
    for r in rows:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["id"]
    for w, steps in byw.items():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
    with pytest.raises(ValueError):
        node2vec_walks(g, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(g, q=-1.0)
