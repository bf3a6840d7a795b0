"""SSSP — frontier-based Bellman-Ford over the MinimumPlus semiring.

Reference: graphblas/algorithm/sssp.hpp:15-103 — MinPlus vxm from the
active frontier, improvement mask (PlusLess), deactivating unimproved
vertices; CPU oracle is Dijkstra (test_sssp.hpp:15-79) — both reach
the same fixpoint on non-negative weights.

Spark per round: relax only out of vertices whose distance improved
last round (the sparse frontier), min-combine against current
distances, count improvements as the convergence scalar.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.descriptor import DEFAULT_DESC, Descriptor, MxvMode
from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner, truncate_plan


def sssp(
    g: Graph,
    source: int = 0,
    desc: Descriptor = DEFAULT_DESC,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (id long, dist double) for reachable vertices."""
    spark = g.edges.sparkSession
    if runner is None:
        runner = SuperstepRunner(spark)

    def init():
        s = spark.range(1).select(
            F.lit(source).cast("long").alias("id"), F.lit(0.0).alias("dist")
        )
        return {"dist": s, "frontier": s}

    state, start_iter, scalars = runner.resume_or_init(init)
    dist, frontier = state["dist"], state["frontier"]
    improved_n = int(scalars.get("improved_n", 1))

    for it in range(start_iter, desc.max_niter):
        if improved_n == 0:
            break
        t0 = time.time()
        push = (
            desc.mxv_mode == MxvMode.PUSHONLY
            or (desc.mxv_mode == MxvMode.PUSHPULL and improved_n / max(g.n, 1) <= desc.switchpoint)
        )
        f = F.broadcast(frontier) if push else frontier
        # MinPlus relax: candidate(dst) = min over frontier (dist + w)
        cand = (
            g.edges.join(f, on=g.edges["src"] == f["id"], how="inner")
            .groupBy(g.edges["dst"].alias("id"))
            .agg(F.min(f["dist"] + g.edges["val"]).alias("cand"))
        )
        # improvement mask (sssp.hpp:72-73 PlusLess): keep strictly-better
        joined = cand.join(dist, on="id", how="left")
        new_frontier = joined.filter(
            F.col("dist").isNull() | (F.col("cand") < F.col("dist"))
        ).select("id", F.col("cand").alias("dist")).transform(truncate_plan)
        improved_n = new_frontier.count()
        # merge: min(dist, cand) over the union of structures
        dist = (
            dist.unionByName(new_frontier)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .transform(truncate_plan)  # truncate lineage per superstep
        )
        state = runner.commit(
            it,
            {"dist": dist, "frontier": new_frontier},
            scalars={"improved_n": improved_n},
            metrics={
                "ms": (time.time() - t0) * 1000.0,
                "direction": "push" if push else "pull",
                "improved": improved_n,
            },
        )
        dist, frontier = state["dist"], state["frontier"]
    return dist
