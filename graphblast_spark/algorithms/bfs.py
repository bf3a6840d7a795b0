"""BFS — direction-optimized frontier expansion.

Reference: graphblas/algorithm/bfs.hpp:14-89 — LogicalOrAnd vxm with a
complemented visited-mask, marking depth via masked assign; CPU oracle
test_bfs.hpp:11-61 (source default 0, unreachable = -1 analog: the
oracle leaves them at n, we return no row — callers fill).

Spark per level: next = (frontier ⋈ edges on src → dst, distinct)
anti-join visited. The anti-join IS the complement mask
(GrB_SCMP, types.hpp:44-78 → left_anti, SURVEY §2.7) and the
distinct-instead-of-agg IS the early-exit/sort-elision path
(kernels/spmv.hpp:33-51). The frontier is broadcast while small
(push), falling back to shuffle join when it grows past the
switchpoint (pull) — the reference's --mxvmode 0 direction optimization.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.descriptor import DEFAULT_DESC, Descriptor, MxvMode
from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner, truncate_plan


def bfs(
    g: Graph,
    source: int = 0,
    desc: Descriptor = DEFAULT_DESC,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (id long, depth long) for vertices reachable from
    ``source`` (source itself at depth 0). Unreached vertices have no
    row (sparse result, reference leaves them unvisited)."""
    spark = g.edges.sparkSession
    if runner is None:
        runner = SuperstepRunner(spark)

    def init():
        src_df = spark.range(1).select(
            F.lit(source).cast("long").alias("id"), F.lit(0).cast("long").alias("depth")
        )
        return {"depths": src_df, "frontier": src_df.select("id")}

    state, start_iter, scalars = runner.resume_or_init(init)
    depths, frontier = state["depths"], state["frontier"]
    frontier_n = int(scalars.get("frontier_n", 1))

    for it in range(start_iter, desc.max_niter):
        if frontier_n == 0:
            break
        t0 = time.time()
        push = (
            desc.mxv_mode == MxvMode.PUSHONLY
            or (desc.mxv_mode == MxvMode.PUSHPULL and frontier_n / max(g.n, 1) <= desc.switchpoint)
        )
        f = F.broadcast(frontier) if push else frontier
        nxt = (
            g.edges.join(f, on=g.edges["src"] == f["id"], how="inner")
            .select(g.edges["dst"].alias("id"))
            .distinct()
            .join(depths, on="id", how="left_anti")  # complemented visited mask
            .withColumn("depth", F.lit(it + 1).cast("long"))
            .transform(truncate_plan)
        )
        frontier_n = nxt.count()
        depths = depths.unionByName(nxt)
        if (it + 1) % 8 == 0:
            depths = depths.transform(truncate_plan)  # bound the union tree
        state = runner.commit(
            it,
            {"depths": depths, "frontier": nxt.select("id")},
            scalars={"frontier_n": frontier_n},
            metrics={
                "ms": (time.time() - t0) * 1000.0,
                "direction": "push" if push else "pull",
                "frontier": frontier_n,
            },
        )
        depths, frontier = state["depths"], state["frontier"]
    return depths
