"""Numpy oracles transliterated from the reference CPU test implementations.

Each mirrors the *semantics* of graphblas/algorithm/test_*.hpp (the
reference's own verification baseline, SURVEY §5) — not their code.
"""

from __future__ import annotations

import numpy as np


def _sym_edges(n: int, edges, symmetric: bool):
    es = {(s, d) for s, d, _ in edges if s != d}
    if symmetric:
        es |= {(d, s) for s, d in es}
    return sorted(es)


def pagerank_oracle(n, edges, alpha=0.85, eps=1e-8, max_niter=100, fixed_iters=None):
    """SimpleReferencePr semantics (test_pr.hpp:14-79): teleport (1-α)/n,
    contributions α·p[s]/outdeg[s], NO dangling redistribution, stop on
    Σ(Δp)² < eps post-update."""
    dedup = sorted({(s, d) for s, d, _ in edges if s != d})
    outdeg = np.zeros(n)
    for s, d in dedup:
        outdeg[s] += 1
    p = np.full(n, 1.0 / n)
    iters = fixed_iters if fixed_iters is not None else max_niter
    for _ in range(iters):
        new = np.full(n, (1 - alpha) / n)
        for s, d in dedup:
            new[d] += alpha * p[s] / outdeg[s]
        err = float(((new - p) ** 2).sum())
        p = new
        if fixed_iters is None and err < eps:
            break
    return p


def cc_oracle(n, edges, symmetric=True):
    """Component labels = min vertex id per component (undirected),
    via BFS flood — partition-equivalent to test_cc.hpp:14-56."""
    adj = [[] for _ in range(n)]
    for s, d in _sym_edges(n, edges, True):
        adj[s].append(d)
    label = np.arange(n)
    seen = np.zeros(n, bool)
    for start in range(n):
        if seen[start]:
            continue
        comp = [start]
        seen[start] = True
        stack = [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if not seen[v]:
                    seen[v] = True
                    comp.append(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label


def tc_oracle(n, edges):
    """Exact triangle count via sorted-adjacency intersection on the
    symmetrized graph (test_tc.hpp:14-84 semantics)."""
    und = {(min(s, d), max(s, d)) for s, d, _ in edges if s != d}
    adj = [set() for _ in range(n)]
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    # each triangle {x<y<z} is counted once: at edge (x,y) with c=z>y
    return sum(1 for a, b in und for c in (adj[a] & adj[b]) if c > b)


def bfs_oracle(n, edges, source=0):
    """Depths from source (test_bfs.hpp:11-61); unreachable = -1."""
    adj = [[] for _ in range(n)]
    for s, d, _ in edges:
        if s != d:
            adj[s].append(d)
    depth = np.full(n, -1)
    depth[source] = 0
    frontier = [source]
    lvl = 0
    while frontier:
        lvl += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if depth[v] == -1:
                    depth[v] = lvl
                    nxt.append(v)
        frontier = nxt
    return depth


def sssp_oracle(n, edges, source=0):
    """Dijkstra (test_sssp.hpp:15-79); unreachable = +inf."""
    import heapq

    adj = [[] for _ in range(n)]
    for s, d, v in edges:
        if s != d:
            adj[s].append((d, v))
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def majority_lp_oracle(n, edges, iters):
    """Synchronous majority LP, tiebreak smallest label, isolated
    vertices keep label; undirected."""
    adj = [[] for _ in range(n)]
    for s, d in _sym_edges(n, edges, True):
        adj[s].append(d)
    lab = np.arange(n)
    for _ in range(iters):
        new = lab.copy()
        for u in range(n):
            if not adj[u]:
                continue
            counts = {}
            for v in adj[u]:
                counts[lab[v]] = counts.get(lab[v], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[u] = best
        lab = new
    return lab


_LCG_A = 1103515245
_LCG_B = 12345
_M31 = (1 << 31) - 1


def _lcg_w(v, round_=0):
    return (v * _LCG_A + _LCG_B * (round_ + 1)) % _M31 + 1


def mis_oracle(n, edges):
    """Deterministic Luby MIS with the engine's LCG weights — the
    misInner loop (mis.hpp:23-141) in numpy."""
    adj = [set() for _ in range(n)]
    for s, d in _sym_edges(n, edges, True):
        adj[s].add(d)
        adj[d].add(s)
    cand = set(range(n))
    in_mis = np.zeros(n, dtype=np.int64)
    w = {v: _lcg_w(v) for v in range(n)}
    while cand:
        winners = {v for v in cand
                   if all(w[v] > w[u] for u in adj[v] if u in cand)}
        if not winners:
            break
        for v in winners:
            in_mis[v] = 1
        removed = set(winners)
        for v in winners:
            removed |= adj[v] & cand
        cand -= removed
    return in_mis


def gc_oracle(n, edges, max_rounds=10**9):
    """Greedy-IS coloring (gc.hpp:16-150) with LCG weights; colors are
    1-based round numbers, 0 = uncolored (fixed-round mode)."""
    adj = [set() for _ in range(n)]
    for s, d in _sym_edges(n, edges, True):
        adj[s].add(d)
        adj[d].add(s)
    cand = set(range(n))
    color = np.zeros(n, dtype=np.int64)
    w = {v: _lcg_w(v) for v in range(n)}
    k = 0
    while cand and k < max_rounds:
        k += 1
        winners = {v for v in cand
                   if all(w[v] > w[u] for u in adj[v] if u in cand)}
        if not winners:
            break
        for v in winners:
            color[v] = k
        cand -= winners
    return color


def lgc_oracle(n, edges, source, alpha=0.15, eps=1e-6, max_niter=200):
    """ACL push per lgc.hpp:106-134 comments (batched frontier form),
    float64."""
    dedup = sorted({(s, d) for s, d, _ in edges if s != d})
    outdeg = np.zeros(n)
    for s, d in dedup:
        outdeg[s] += 1
    p = np.zeros(n)
    r = np.zeros(n)
    r[source] = 1.0
    for _ in range(max_niter):
        f = r > outdeg * eps
        # sparse-r semantics: only rows ever touched exist; untouched
        # rows are 0 and 0 > 0*eps is False, so f matches engine's
        if not f.any():
            break
        p[f] += alpha * r[f]
        r2 = np.zeros(n)
        pushable = f & (outdeg > 0)
        r2[pushable] = (1 - alpha) / 2 * r[pushable] / outdeg[pushable]
        r[f] = (1 - alpha) / 2 * r[f]
        spread = np.zeros(n)
        for s, d in dedup:
            spread[d] += r2[s]
        r = r + spread
    return p


def diameter_oracle(n, edges, sources):
    """Max BFS depth from the given sources (diameter.hpp:14-53)."""
    adj = [[] for _ in range(n)]
    for s, d in _sym_edges(n, edges, True):
        adj[s].append(d)
    best = 0
    for src in sources:
        depth = {src: 0}
        frontier = [src]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in depth:
                        depth[u] = d
                        nxt.append(u)
            frontier = nxt
        if depth:
            best = max(best, max(depth.values()))
    return best


def bc_oracle(n, edges, sources=None, max_depth=None, directed=False):
    """Brandes betweenness (directed as given, or symmetrized) from the
    given root set (None = all vertices), depth-bounded when max_depth
    is set — mirrors algorithms/bc.py semantics."""
    dedup = _sym_edges(n, edges, not directed)
    adj = [[] for _ in range(n)]
    for s, d in dedup:
        adj[s].append(d)
    if sources is None:
        sources = range(n)
    bc = np.zeros(n)
    for src in sources:
        depth = {src: 0}
        sigma = {src: 1.0}
        levels = [[src]]
        while max_depth is None or len(levels) - 1 < max_depth:
            nxt = {}
            for v in levels[-1]:
                for u in adj[v]:
                    if u in depth and depth[u] <= len(levels) - 1:
                        continue
                    nxt[u] = nxt.get(u, 0.0) + sigma[v]
            if not nxt:
                break
            for u, s_ in nxt.items():
                depth[u] = len(levels)
                sigma[u] = s_
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in depth}
        for d in range(len(levels) - 2, -1, -1):
            for v in levels[d]:
                acc = 0.0
                for u in adj[v]:
                    if depth.get(u) == d + 1:
                        acc += sigma[v] / sigma[u] * (1.0 + delta[u])
                delta[v] = acc
        for v, dl in delta.items():
            if v != src:
                bc[v] += dl
    return bc


def ppr_oracle(n, edges, seeds, alpha=0.85, iters=10):
    """Personalized PageRank: teleport (1-α)/|S| on the seed set only,
    init 1/|S| on seeds; no dangling redistribution (matches
    algorithms/pagerank.py personalized_pagerank)."""
    dedup = sorted({(s, d) for s, d, _ in edges if s != d})
    outdeg = np.zeros(n)
    for s, d in dedup:
        outdeg[s] += 1
    p = np.zeros(n)
    base = np.zeros(n)
    for s in seeds:
        p[s] = 1.0 / len(seeds)
        base[s] = (1 - alpha) / len(seeds)
    for _ in range(iters):
        new = base.copy()
        for s, d in dedup:
            new[d] += alpha * p[s] / outdeg[s]
        p = new
    return p
