"""k-core membership — iterative degree peeling.

Beyond the reference's algorithm set (it ships none), but a staple of
web-graph analytics (core extraction separates the densely-linked web
core from pendant/spam periphery) and expressible in exactly the
engine's superstep vocabulary: each round is one degree reduction
(groupBy) plus one filter — the same join shapes as CC, so the scale
properties carry over unchanged.

Semantics: the k-core is the maximal subgraph in which every vertex
has (undirected) degree ≥ k within the subgraph. Peeling — repeatedly
deleting vertices of degree < k — reaches it deterministically
regardless of order; the round count is bounded by the peel depth
(tiny on power-law graphs, where most periphery leaves in the first
rounds).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.descriptor import DEFAULT_DESC, Descriptor
from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner, stable_partitions, truncate_plan


def k_core(
    g: Graph,
    k: int = 2,
    desc: Descriptor = DEFAULT_DESC,
    runner: SuperstepRunner | None = None,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Returns (id long, in_core int): 1 iff the vertex survives in the
    k-core. Treats edges as undirected (both orientations count toward
    degree; parallel duplicates were removed at build). With
    ``fixed_rounds`` the deterministic partially-peeled state is
    returned (for unrolled-SQL oracle comparison); convergence is the
    default."""
    spark = g.edges.sparkSession
    if runner is None:
        runner = SuperstepRunner(spark)

    e = g.edges.select("src", "dst")
    adj = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )

    def init():
        return {"remaining": g.vertices.select("id")}

    state, start_iter, scalars = runner.resume_or_init(init)
    remaining = state["remaining"]
    # previous round's survivor count, carried across iterations (and
    # through checkpoint resume) so each peel round costs exactly ONE
    # action — the survivors count — instead of recounting `remaining`
    n_prev = int(scalars["n"]) if "n" in scalars else None

    max_rounds = fixed_rounds if fixed_rounds is not None else desc.max_niter
    with stable_partitions(spark):
        for it in range(start_iter, max_rounds):
            t0 = time.time()
            # degree within the remaining-induced subgraph
            live = (
                adj.join(remaining.withColumnRenamed("id", "src"), on="src", how="left_semi")
                .join(remaining.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
            )
            deg = live.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
            survivors = (
                remaining.join(deg, on="id", how="left")
                .filter(F.coalesce(F.col("d"), F.lit(0)) >= k)
                .select("id")
                .transform(truncate_plan)
            )
            if n_prev is None:
                n_prev = remaining.count()  # first round only
            n_now = survivors.count()
            remaining = survivors
            state = runner.truncate({"remaining": remaining})
            remaining = state["remaining"]
            runner.commit(
                it, state, scalars={"n": n_now},
                metrics={"ms": (time.time() - t0) * 1000.0, "remaining": n_now},
            )
            if n_now == n_prev or n_now == 0:
                break
            n_prev = n_now

    out = g.vertices.join(
        remaining.withColumn("in_core", F.lit(1)), on="id", how="left"
    ).select("id", F.coalesce("in_core", F.lit(0)).alias("in_core"))
    adj.unpersist()
    return out
