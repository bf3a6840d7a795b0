"""Strongly connected components + bowtie decomposition (directed).

The reference engine covers undirected/any-direction components (cc.hpp
FastSV); a *web* link graph is directed, and its classic global
analysis (Broder et al. 2000, "Graph structure in the Web") needs SCCs:
the giant core, IN, OUT and the tendrils. This module adds that tier
with the coloring / FW-BW family of parallel SCC algorithms (Orzan
2004; Slota, Rajamanickam, Madduri IPDPS 2014) — the published
approach for power-law graphs on bulk-synchronous engines, where
Tarjan's sequential stack is unusable.

Per outer round, on the still-unassigned subgraph:

1. **Trim** to fixpoint: vertices with no in-edge or no out-edge inside
   the remaining subgraph are singleton SCCs (removes the huge
   tendril/leaf mass of a web crawl in a few rounds).
2. **Forward max-coloring** to fixpoint: ``color(v) = max id that
   reaches v`` via monotone max-propagation along edges. Monotone ⇒
   the decimal(38,0) sum of colors is an exact convergence witness
   (same single-agg trick as cc.py — no diff join).
3. **Backward sweep inside each color**: every vertex ``r`` with
   ``color(r) == r`` is a root (the max id of its own SCC); the
   vertices that reach ``r`` *within color r* are exactly SCC(r)
   (color(v) == r ⇒ r reaches v; v →* r ⇒ mutual). All colors sweep
   simultaneously — color classes are disjoint.
4. Assign those SCCs, drop them from the graph, repeat. The max id of
   the remaining subgraph is always a root, so every round removes at
   least one SCC; on bowtie-shaped graphs the giant core + trim
   absorb most of the graph in the first couple of rounds.

Labels are normalized to the **min vertex id of the SCC** at the end
(matching cc.py's component convention and the DuckDB oracle).

Scale shape: edges are persisted once per orientation, pinned on the
join key so only the (vertex-sized) color/frontier tables shuffle per
superstep; every convergence check is one aggregate; trim uses
semi/anti joins, never distinct-on-edges. State across supersteps is
O(|V|) rows.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner, stable_partitions


def _sum_witness(df: DataFrame, col: str) -> int:
    return int(df.agg(F.sum(F.col(col).cast("decimal(38,0)"))).first()[0] or 0)


def strongly_connected_components(
    g: Graph,
    runner: SuperstepRunner | None = None,
    max_rounds: int = 64,
    max_inner: int = 200,
) -> DataFrame:
    """Returns (id long, scc_id long), scc_id = min vertex id of the
    strongly connected component."""
    spark = g.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Two pinned orientations: coloring probes by src (propagate color
    # src→dst), the backward sweep probes by dst (walk edges in
    # reverse). Persist once; per-round activity is a semi-join filter.
    e_fwd = g.edges.select("src", "dst").repartition(n_part, "src").persist()
    e_bwd = g.edges.select("src", "dst").repartition(n_part, "dst").persist()
    e_fwd.count(), e_bwd.count()

    if runner is None:
        runner = SuperstepRunner(spark)

    def init():
        return {
            "remaining": g.vertices.select("id"),
            "assigned": g.vertices.select("id", F.col("id").alias("scc_id")).limit(0),
        }

    state, start_round, _ = runner.resume_or_init(init)
    remaining, assigned = state["remaining"], state["assigned"]

    with stable_partitions(spark):
        for rnd in range(start_round, max_rounds):
            t0 = time.time()
            n_rem = remaining.count()
            if n_rem == 0:
                runner.commit(rnd, {}, metrics={"phase": "done"})
                break

            # -- 1. trim to fixpoint --------------------------------------
            while True:
                act = (
                    e_fwd.join(remaining.hint("shuffle_hash"),
                               e_fwd["src"] == remaining["id"], "left_semi")
                    .join(remaining.hint("shuffle_hash"),
                          F.col("dst") == remaining["id"], "left_semi")
                )
                keep = (
                    remaining.join(act, remaining["id"] == act["src"], "left_semi")
                    .join(act, remaining["id"] == act["dst"], "left_semi")
                    .localCheckpoint(eager=True)
                )
                n_keep = keep.count()
                if n_keep == n_rem:
                    break
                trimmed = remaining.join(keep, "id", "left_anti")
                assigned = assigned.unionByName(
                    trimmed.select("id", F.col("id").alias("scc_id"))
                ).localCheckpoint(eager=True)
                remaining, n_rem = keep, n_keep
            if n_rem == 0:
                state = runner.commit(
                    rnd, {"remaining": remaining, "assigned": assigned},
                    metrics={"phase": "trim-emptied", "ms": (time.time() - t0) * 1000},
                )
                remaining, assigned = state["remaining"], state["assigned"]
                continue

            act = act.localCheckpoint(eager=True)  # edges inside `keep`

            # -- 2. forward max-coloring to fixpoint ----------------------
            color = remaining.select("id", F.col("id").alias("val"))
            prev = _sum_witness(color, "val")
            for _ in range(max_inner):
                c = color.hint("shuffle_hash")
                nbr_max = (
                    act.join(c, act["src"] == c["id"], "inner")
                    .groupBy(act["dst"].alias("id"))
                    .agg(F.max(c["val"]).alias("nmax"))
                )
                color = (
                    color.join(nbr_max, "id", "left")
                    .select(
                        "id",
                        F.greatest(
                            F.col("val"), F.coalesce("nmax", F.col("val"))
                        ).alias("val"),
                    )
                    .localCheckpoint(eager=True)
                )
                cur = _sum_witness(color, "val")
                if cur == prev:
                    break
                prev = cur

            # -- 3. backward sweep inside colors --------------------------
            members = color.filter(F.col("id") == F.col("val")).select(
                "id", F.col("val").alias("root")
            )
            frontier = members
            while True:
                cf = frontier.hint("shuffle_hash")
                preds = (
                    e_bwd.join(cf, e_bwd["dst"] == cf["id"], "inner")
                    .select(e_bwd["src"].alias("id"), cf["root"].alias("root"))
                    .join(
                        color.hint("shuffle_hash").select(
                            F.col("id").alias("cid"), F.col("val").alias("cval")
                        ),
                        (F.col("id") == F.col("cid"))
                        & (F.col("root") == F.col("cval")),
                        "inner",
                    )
                    .select("id", "root")
                    .distinct()
                )
                new = preds.join(members, "id", "left_anti").localCheckpoint(eager=True)
                if new.isEmpty():
                    break
                members = members.unionByName(new).localCheckpoint(eager=True)
                frontier = new

            assigned = assigned.unionByName(
                members.select("id", F.col("root").alias("scc_id"))
            ).localCheckpoint(eager=True)
            remaining = remaining.join(members, "id", "left_anti").localCheckpoint(
                eager=True
            )
            state = runner.commit(
                rnd,
                {"remaining": remaining, "assigned": assigned},
                metrics={
                    "ms": (time.time() - t0) * 1000,
                    "n_remaining": remaining.count(),
                },
            )
            remaining, assigned = state["remaining"], state["assigned"]
        else:
            raise RuntimeError(
                f"SCC did not converge in {max_rounds} outer rounds "
                f"({remaining.count()} vertices unassigned)"
            )

    e_fwd.unpersist(), e_bwd.unpersist()
    # Normalize root labels (max member id) to the min member id.
    rel = assigned.groupBy("scc_id").agg(F.min("id").alias("m"))
    return (
        assigned.join(rel, "scc_id")
        .select("id", F.col("m").alias("scc_id"))
    )


def _reach_from(edges: DataFrame, seeds: DataFrame, reverse: bool = False) -> DataFrame:
    """Vertices reachable from ``seeds`` (exclusive of the seeds
    themselves unless re-reached) along ``edges`` — plain frontier BFS,
    O(|V|) state, one anti-join + one hash join per level."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    visited = seeds.select("id").localCheckpoint(eager=True)
    frontier = visited
    while True:
        nxt = (
            edges.join(frontier.hint("shuffle_hash"),
                       edges[src] == frontier["id"], "inner")
            .select(edges[dst].alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return visited
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt


def bowtie_decomposition(
    g: Graph, scc: DataFrame | None = None, runner: SuperstepRunner | None = None
) -> DataFrame:
    """Broder-style bowtie map of a directed graph: (id, component)
    with component ∈ {CORE, IN, OUT, OTHER} — CORE = the largest SCC
    (ties broken by smallest scc_id), IN = reaches the core, OUT =
    reachable from the core, OTHER = tendrils/tubes/disconnected."""
    if scc is None:
        scc = strongly_connected_components(g, runner=runner)
    scc = scc.persist()
    core_row = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.desc("sz"), F.asc("scc_id"))
        .first()
    )
    core_id = core_row["scc_id"]
    core = scc.filter(F.col("scc_id") == core_id).select("id")
    edges = g.edges.select("src", "dst")
    out_side = _reach_from(edges, core)           # core ∪ forward-reachable
    in_side = _reach_from(edges, core, reverse=True)
    result = (
        scc.join(out_side.select("id", F.lit(True).alias("fwd")), "id", "left")
        .join(in_side.select("id", F.lit(True).alias("bwd")), "id", "left")
        .select(
            "id",
            F.when(F.col("scc_id") == core_id, "CORE")
            .when(F.col("bwd").isNotNull(), "IN")
            .when(F.col("fwd").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("component"),
        )
    )
    scc.unpersist()
    return result


def condensation(g: Graph, scc: DataFrame | None = None) -> DataFrame:
    """The condensation DAG: contract every SCC to one vertex and
    aggregate parallel edges — (src_scc, dst_scc, n_edges), self-loops
    (intra-SCC edges) dropped. The standard follow-up to SCC: web-graph
    structure analysis runs on the condensation (it is acyclic and
    orders of magnitude smaller than the page graph).

    Plan: two vertex-keyed hash joins to relabel endpoints + one
    map-side-combining groupBy on the (scc, scc) pair — no windows, no
    distinct-on-edges."""
    if scc is None:
        scc = strongly_connected_components(g)
    src_m = scc.select(F.col("id").alias("src"), F.col("scc_id").alias("src_scc"))
    dst_m = scc.select(F.col("id").alias("dst"), F.col("scc_id").alias("dst_scc"))
    return (
        g.edges.select("src", "dst")
        .join(src_m, "src")
        .join(dst_m, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
