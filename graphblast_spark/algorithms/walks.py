"""Deterministic random walks + layered neighborhood sampling.

Beyond-reference additions (gunrock/graphblast ships no walk sampler;
the nearest primitive is the frontier-expansion vxm its BFS is built
from, graphblas/algorithm/bfs.hpp:14-89). Walk-based sampling is the
workhorse for link-graph representation learning (DeepWalk/node2vec
corpus generation) and GraphSAGE-style minibatch assembly — the
training-data-pipeline side of a web-scale graph engine.

Determinism contract: every random choice is a pure integer-hash
function of (walk_id, step, vertex) / (src, dst), so the exact same
walks fall out on any cluster size, any partitioning, and in the
DuckDB oracle (the driver replays these walks in recursive SQL).
Production callers wanting stronger mixing can swap ``_hstep`` for
``F.xxhash64`` — every other line is unchanged; the portable
linear-congruential form exists so the result is ANSI-SQL-replayable.

Plan shape / scale notes:
- Adjacency is aggregated ONCE into sorted neighbor arrays
  (src, nbrs, deg) and persisted: each walk step is then a single
  equi-join frontier⋈adj on the current vertex plus an O(1)
  ``element_at`` pick — no per-step window, no wedge fan-out.
- The frontier shuffles on the current-vertex key each step (same
  volume as one BFS level over the walk set, |walks| rows, NOT |E|).
- Hub neighbor arrays are one row per vertex (same layout the
  triangle counter uses, tc.py): by default a cap auto-derives from
  the cached degree stats (``max_degree="auto"`` →
  :data:`AUTO_DEGREE_BUDGET` when a hub exceeds it, built via salted
  two-stage ranking) — walks through a capped hub sample its first
  ``max_degree`` sorted neighbors, documented truncation.
- Walk length L = L superstep joins; lineage is truncated every
  ``ckpt_every`` steps with an eager localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import truncate_plan

# SQL-portable step hash: pmod(walk*1000003 + step*10007 + id*31, 999983).
# Multipliers keep every product < 2^63 for ids up to 10^12 (Spark 4
# ANSI mode THROWS on int64 overflow rather than wrapping).
_A_WALK, _A_STEP, _A_ID, _MOD = 1_000_003, 10_007, 31, 999_983


def _hstep(walk_id, step, vid):
    # step is cast to long: int32 literals would overflow at the
    # node2vec second-draw offset (1e6 * 10007 > 2^31) under ANSI mode
    return F.pmod(
        walk_id * F.lit(_A_WALK) + F.lit(step).cast("long") * F.lit(_A_STEP)
        + vid * F.lit(_A_ID),
        F.lit(_MOD),
    )


# Auto-cap budget for per-vertex adjacency arrays: a 2^20-neighbor hub
# array is ~8 MB — safely inside an executor aggregation buffer; a
# 10^8-degree web hub would be a multi-GB single row without the cap.
AUTO_DEGREE_BUDGET = 1 << 20
# Target rows per sort task when salting a skewed key: bounds the
# per-task sort input so no straggler task owns a hub's full edge list.
_ROWS_PER_TASK = 1 << 22
_MAX_SALTS = 256


def _n_salts(hub_degree: int) -> int:
    return max(1, min(_MAX_SALTS, -(-hub_degree // _ROWS_PER_TASK)))


def adjacency_arrays(
    g: Graph, max_degree: int | str | None = "auto", n_salts: int | None = None
) -> DataFrame:
    """(src, nbrs array<long> sorted asc, deg int) — neighbor order is
    the deterministic dst order the oracle's ``row_number() OVER
    (ORDER BY dst)`` replays; a cap keeps the deg-smallest neighbors
    (documented truncation).

    Skew posture (the vxm auto-salt pattern, vecmat.py): ``"auto"``
    (default) consults the cached ``Graph.hub_degree("src")`` — one
    scan, computed once per graph — and caps hub arrays at
    :data:`AUTO_DEGREE_BUDGET` only when some vertex exceeds it, so an
    uncapped 10^8-degree web hub can never materialize as a multi-GB
    row. When a cap is in force the array is built in two salted
    stages (per-(src, salt) ranked truncation, then a bounded merge)
    so no single sort task or aggregation buffer sees a hub's full
    edge list either. ``None`` opts into unbounded arrays explicitly;
    an int caps unconditionally."""
    if max_degree == "auto":
        hub = g.hub_degree("src")
        max_degree = AUTO_DEGREE_BUDGET if hub > AUTO_DEGREE_BUDGET else None

    if max_degree is None:
        adj = g.edges.groupBy("src").agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
        return adj.withColumn("deg", F.size("nbrs"))

    from pyspark.sql.window import Window

    if n_salts is None:
        n_salts = _n_salts(g.hub_degree("src"))
    e = g.edges.select("src", "dst")
    if n_salts > 1:
        # stage 1: rank within (src, salt) — the hub's edge list splits
        # across n_salts spill-safe sort tasks; per-salt top-cap keeps
        # every candidate for the global dst-ascending top-cap
        w1 = Window.partitionBy("src", F.pmod(F.col("dst"), F.lit(n_salts))).orderBy("dst")
        e = e.withColumn("rk", F.row_number().over(w1)).filter(
            F.col("rk") <= max_degree
        ).drop("rk")
    # stage 2: global per-src rank over ≤ n_salts·cap survivors, then a
    # collect bounded at cap rows per vertex
    w2 = Window.partitionBy("src").orderBy("dst")
    ranked = e.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= max_degree)
    adj = ranked.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    return adj.withColumn("deg", F.size("nbrs"))


def random_walks(
    g: Graph,
    roots: DataFrame | None = None,
    n_roots: int = 64,
    walk_length: int = 8,
    walks_per_root: int = 1,
    max_degree: int | str | None = "auto",
    ckpt_every: int = 4,
) -> DataFrame:
    """(walk_id long, step long, id long): position of each walk after
    each step; step 0 is the root itself. A walk stops early at a
    dead-end vertex (no out-edges → no further rows, sparse result).

    Step rule: from vertex v at step t, walk w moves to
    ``nbrs(v)[ hash(w, t, v) mod deg(v) ]`` — pure function of the
    triple, so identical on every cluster size and in the SQL oracle.

    ``walks_per_root`` starts k walks per root with
    walk_id = root_id * k + j (j in [0, k)); the default k=1 keeps
    walk_id == root_id.
    """
    if roots is None:
        roots = g.vertices.orderBy("id").limit(n_roots)
    k = walks_per_root
    start = roots.select(F.col("id"))
    if k == 1:
        frontier = start.select(F.col("id").alias("walk_id"), F.col("id"))
    else:
        frontier = start.join(
            start.sparkSession.range(k).select(F.col("id").alias("j")), how="cross"
        ).select((F.col("id") * k + F.col("j")).alias("walk_id"), F.col("id"))

    adj = adjacency_arrays(g, max_degree=max_degree).persist()
    out = frontier.withColumn("step", F.lit(0).cast("long"))
    rows = [out]
    for t in range(walk_length):
        idx = F.pmod(_hstep(F.col("walk_id"), t, F.col("id")), F.col("deg"))
        frontier = (
            frontier.join(adj, on=frontier["id"] == adj["src"], how="inner")
            .select(
                "walk_id",
                F.element_at("nbrs", (idx + 1).cast("int")).alias("id"),
            )
        )
        if (t + 1) % ckpt_every == 0:
            frontier = frontier.transform(truncate_plan)
        rows.append(frontier.withColumn("step", F.lit(t + 1).cast("long")))
    result = rows[0]
    for r in rows[1:]:
        result = result.unionByName(r)
    adj.unpersist()
    return result.select("walk_id", "step", "id")


# node2vec bias quantization base: 2^3*3^2*5*7*11*13 — the return
# (1/p) and in-out (1/q) weights become EXACT integers for every p, q
# whose reciprocal has only these factors (1/4, 1/3, 1/2, 1, 2, 3, 4,
# ...), keeping the whole step rule in exact int64 arithmetic so it
# replays bit-for-bit at any cluster size and in the SQL oracle.
_N2V_SCALE = 360_360
# second hash draw offset: widens the selection hash to ~1e12 so
# r = H mod Σweights is unbiased even when Σweights ≫ one draw's range
_N2V_OFFSET = 1_000_000


def _n2v_weights(p: float, q: float) -> tuple[int, int, int]:
    if not (p > 0 and q > 0):
        raise ValueError(f"node2vec p and q must be > 0; got p={p!r} q={q!r}")
    wr, wo = round(_N2V_SCALE / p), round(_N2V_SCALE / q)
    if wr <= 0 or wo <= 0:
        raise ValueError(f"node2vec p/q too large: quantized weight is 0 (p={p!r} q={q!r})")
    return wr, _N2V_SCALE, wo


def node2vec_walks(
    g: Graph,
    roots: DataFrame | None = None,
    n_roots: int = 64,
    walk_length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_root: int = 1,
    max_degree: int | str | None = "auto",
    ckpt_every: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016):
    (walk_id long, step long, id long). From vertex v reached via prev
    u, candidate x ∈ N(v) carries weight 1/p if x = u (return), 1 if
    x ∈ N(u) (triangle-closing), 1/q otherwise (outward) — p > 1
    discourages backtracking, q < 1 encourages depth-first exploration.

    Determinism contract (the random_walks posture, module docstring):
    weights are quantized to integers round(360360/p) / 360360 /
    round(360360/q) and the pick is the first candidate (dst-ascending)
    whose integer prefix-sum exceeds H mod Σweights, H a two-draw
    ~1e12-range step hash — EXACT int64 arithmetic end to end, so the
    same walks fall out on any partitioning and in the unrolled SQL
    oracle (window prefix-sum + edge-existence join). Step 0→1 has no
    prev and uses random_walks' uniform rule. Walks stop at dead ends.

    Plan shape: one extra hash join per step vs random_walks — the
    frontier joins adjacency on BOTH the current vertex (candidates)
    and the previous vertex (the N(u) membership array); the weight/
    prefix/pick logic is a single higher-order ``aggregate`` over the
    candidate array, fully JVM-side. Hub truncation semantics are
    inherited from :func:`adjacency_arrays` (``max_degree="auto"``).
    """
    wr, wc, wo = _n2v_weights(p, q)
    if roots is None:
        roots = g.vertices.orderBy("id").limit(n_roots)
    k = walks_per_root
    start = roots.select(F.col("id"))
    if k == 1:
        frontier0 = start.select(F.col("id").alias("walk_id"), F.col("id"))
    else:
        frontier0 = start.join(
            start.sparkSession.range(k).select(F.col("id").alias("j")), how="cross"
        ).select((F.col("id") * k + F.col("j")).alias("walk_id"), F.col("id"))

    adj = adjacency_arrays(g, max_degree=max_degree).persist()
    padj = adj.select(
        F.col("src").alias("psrc"), F.col("nbrs").alias("pnbrs")
    )
    rows = [frontier0.withColumn("step", F.lit(0).cast("long")).select("walk_id", "step", "id")]
    if walk_length < 1:
        adj.unpersist()
        return rows[0]

    # step 0 -> 1: uniform (no prev), identical to random_walks' rule
    idx0 = F.pmod(_hstep(F.col("walk_id"), 0, F.col("id")), F.col("deg"))
    frontier = (
        frontier0.join(adj, on=frontier0["id"] == adj["src"], how="inner")
        .select(
            "walk_id",
            frontier0["id"].alias("prev"),
            F.element_at("nbrs", (idx0 + 1).cast("int")).alias("id"),
        )
    )
    rows.append(
        frontier.withColumn("step", F.lit(1).cast("long")).select("walk_id", "step", "id")
    )

    def _wt(x):
        return (
            F.when(x == F.col("prev"), F.lit(wr))
            .when(F.array_contains(F.col("pnbrs"), x), F.lit(wc))
            .otherwise(F.lit(wo))
            .cast("long")
        )

    for t in range(1, walk_length):
        cand = (
            frontier.join(adj, on=frontier["id"] == adj["src"], how="inner")
            .join(padj.hint("shuffle_hash"), on=frontier["prev"] == padj["psrc"], how="inner")
            .select("walk_id", "prev", frontier["id"].alias("id"), "nbrs", "pnbrs")
        )
        h1 = _hstep(F.col("walk_id"), t, F.col("id"))
        h2 = _hstep(F.col("walk_id"), t + _N2V_OFFSET, F.col("id"))
        # tot and r materialize as plain columns BEFORE the pick fold:
        # embedding one aggregate() inside another lambda would collide
        # their bound lambda variables during analysis
        staged = cand.withColumn(
            "tot",
            F.aggregate("nbrs", F.lit(0).cast("long"), lambda s, x: s + _wt(x)),
        ).withColumn("r", F.pmod(h1 * F.lit(_MOD) + h2, F.col("tot")))
        # first-crossing scan: pick = first i (0-based, dst-ascending)
        # with prefix-sum(i) > r — a fold over the candidate array
        pick = F.aggregate(
            "nbrs",
            F.struct(
                F.lit(0).cast("long").alias("s"),
                F.lit(-1).cast("int").alias("pick"),
                F.lit(0).cast("int").alias("i"),
            ),
            lambda a, x: F.struct(
                (a["s"] + _wt(x)).alias("s"),
                F.when(a["pick"] >= 0, a["pick"])
                .when(a["s"] + _wt(x) > F.col("r"), a["i"])
                .otherwise(F.lit(-1))
                .alias("pick"),
                (a["i"] + 1).alias("i"),
            ),
            lambda a: a["pick"],
        )
        frontier = staged.withColumn("pick", pick).select(
            "walk_id",
            F.col("id").alias("prev"),
            F.element_at("nbrs", (F.col("pick") + 1).cast("int")).alias("id"),
        )
        if (t + 1) % ckpt_every == 0:
            frontier = frontier.transform(truncate_plan)
        rows.append(
            frontier.withColumn("step", F.lit(t + 1).cast("long")).select(
                "walk_id", "step", "id"
            )
        )
    result = rows[0]
    for rdf in rows[1:]:
        result = result.unionByName(rdf)
    adj.unpersist()
    return result.select("walk_id", "step", "id")


def sampled_adjacency(
    g: Graph, kmax: int, n_salts: int | None = None
) -> DataFrame:
    """(src, dst, rk): each vertex's ``kmax`` hash-ranked neighbors,
    rk = row_number over (hash(src,dst), dst) per src — the sampled
    adjacency :func:`neighborhood_sample` layers filter by rank.

    Skew posture: a single window partitioned by ``src`` would sort a
    web hub's entire 10^7–10^8-edge list in ONE task — the straggler
    the north rule says to de-skew. Instead the rank runs in two
    stages: (1) rank within (src, salt) — the hub splits across
    ``n_salts`` spill-safe sort tasks, and per-salt top-``kmax``
    already contains every global top-``kmax`` candidate; (2) re-rank
    the ≤ n_salts·kmax survivors per src — a tiny sort. ``n_salts``
    defaults to auto-derivation from the cached ``Graph.hub_degree``
    (1 salt per ~4M hub edges, the vxm auto-salt pattern), so the
    salting stage only exists when the degree stats say it must."""
    from pyspark.sql.window import Window

    if n_salts is None:
        n_salts = _n_salts(g.hub_degree("src"))
    h = F.pmod(F.col("src") * F.lit(_A_WALK) + F.col("dst") * F.lit(_A_STEP), F.lit(_MOD))
    e = g.edges.select("src", "dst")
    if n_salts > 1:
        w1 = Window.partitionBy("src", F.pmod(F.col("dst"), F.lit(n_salts))).orderBy(
            h, F.col("dst")
        )
        e = (
            e.withColumn("rk", F.row_number().over(w1))
            .filter(F.col("rk") <= kmax)
            .drop("rk")
        )
    w2 = Window.partitionBy("src").orderBy(h, F.col("dst"))
    return e.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= kmax)


def neighborhood_sample(
    g: Graph,
    roots: DataFrame | None = None,
    n_roots: int = 64,
    fanouts: tuple[int, ...] = (3, 2),
    n_salts: int | None = None,
) -> DataFrame:
    """GraphSAGE-style layered fan-out sample: (root long, layer long,
    id long), layer 0 = the root itself, layer t+1 = for every layer-t
    vertex its ``fanouts[t]`` hash-ranked neighbors, deduped per
    (root, layer). Rank is a pure (src, dst) hash with dst tiebreak, so
    the sampled adjacency is computed ONCE (:func:`sampled_adjacency`,
    hub-salted — no full-edge single-task sort) and every layer reuses
    it filtered to its fanout.

    At 10^12 edges the ranked adjacency is the only heavy structure:
    one |E| shuffle (two when the degree stats demand a salting
    stage), reused by all layers; the per-layer joins carry only the
    expanding frontier (Π fanouts rows per root)."""
    if roots is None:
        roots = g.vertices.orderBy("id").limit(n_roots)
    kmax = max(fanouts)
    adj = sampled_adjacency(g, kmax, n_salts=n_salts).persist()

    frontier = roots.select(F.col("id").alias("root"), F.col("id"))
    out = [frontier.withColumn("layer", F.lit(0).cast("long"))]
    for t, k in enumerate(fanouts):
        a = adj.filter(F.col("rk") <= k) if k < kmax else adj
        frontier = (
            frontier.join(a, on=frontier["id"] == a["src"], how="inner")
            .select("root", F.col("dst").alias("id"))
            .distinct()
        )
        out.append(frontier.withColumn("layer", F.lit(t + 1).cast("long")))
    result = out[0]
    for r in out[1:]:
        result = result.unionByName(r)
    adj.unpersist()
    return result.select("root", "layer", "id")
