"""PageRank — power iteration over the edge table.

Golden semantics = the reference's CPU oracle ``SimpleReferencePr``
(reference graphblas/algorithm/test_pr.hpp:14-79), which is what the
reference verifies against (example/gpr.cu:110-121):

- init p = 1/n (dense over ALL vertices, including isolated ones);
- each iteration: p'(v) = (1-α)/n + α · Σ_{(s→v)∈E} p(s)/outdeg(s);
- **no dangling redistribution** (dangling mass simply leaks — the
  oracle's contribution loop skips empty rows, test_pr.hpp:44-56);
- stop when Σ(Δp)² < eps (post-update, NO sqrt — test_pr.hpp:66; note
  the GPU loop differs, pr.hpp:80) or after max_niter iterations.

Defaults α=0.85, eps=1e-8 (reference example/gpr.cu:67-68). Computed
in float64 so aggregation-order noise ≪ the 1e-6 comparison tolerance
(SURVEY §7.3.1).

Physical plan per superstep (scale notes):
- the weighted edge table (val = α/outdeg(src)) is built ONCE, hash-
  partitioned on src, persisted (the gpr.cu:81-90 prep);
- contributions = edges ⋈ ranks on src: ranks come out of the previous
  iteration's groupBy(id) hash-partitioned on id == src key, and edges
  are persisted pre-partitioned on src, so AQE elides both exchanges;
- density is restored by unioning a zero per vertex *before* the
  aggregate (one shuffle) instead of a second outer join (two);
- lineage is truncated every iteration (eager localCheckpoint) and the
  convergence check is the single scalar action per superstep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.descriptor import DEFAULT_DESC, Descriptor
from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner


def pagerank(
    g: Graph,
    alpha: float = 0.85,
    eps: float = 1e-8,
    desc: Descriptor = DEFAULT_DESC.with_(max_niter=100),
    runner: SuperstepRunner | None = None,
    fixed_iters: int | None = None,
) -> DataFrame:
    """Returns (id long, val double). ``fixed_iters`` skips the
    convergence action entirely (the reference benchmark mode,
    run_pr.sh --max_niter 10) — use it when the superstep count is the
    contract, e.g. oracle-compared queries."""
    spark = g.edges.sparkSession
    n = g.n
    teleport = (1.0 - alpha) / n

    # Prep (reference example/gpr.cu:81-90): A(s,d) := α / outdeg(s).
    deg = g.out_degrees()  # (id, val=outdeg) — only vertices with out-edges
    w_edges = (
        g.edges.join(deg, on=g.edges["src"] == deg["id"], how="inner")
        .select(g.edges["src"], g.edges["dst"], (F.lit(alpha) / deg["val"]).alias("w"))
        .persist()
    )
    w_edges.count()  # materialize prep once

    zeros = g.vertices.select("id", F.lit(0.0).alias("c"))

    if runner is None:
        runner = SuperstepRunner(spark)

    def init():
        return {"ranks": g.vertices.select("id", F.lit(1.0 / n).alias("val"))}

    state, start_iter, _ = runner.resume_or_init(init)
    ranks = state["ranks"]

    niter = fixed_iters if fixed_iters is not None else desc.max_niter
    for it in range(start_iter, niter):
        t0 = time.time()
        contribs = (
            w_edges.join(ranks, on=w_edges["src"] == ranks["id"], how="inner")
            .select(w_edges["dst"].alias("id"), (F.col("w") * ranks["val"]).alias("c"))
        )
        new_ranks = (
            contribs.unionByName(zeros)
            .groupBy("id")
            .agg((F.lit(teleport) + F.sum("c")).alias("val"))
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)  # superstep action

        err = None
        if fixed_iters is None:
            err = (
                new_ranks.join(ranks, on="id")
                .agg(F.sum(F.pow(new_ranks["val"] - ranks["val"], 2)).alias("e"))
                .first()["e"]
            )
        ms = (time.time() - t0) * 1000.0
        state = runner.commit(
            it,
            {"ranks": new_ranks},
            scalars={"err": err},
            metrics={"ms": ms, "err_over_n": (err / n) if err is not None else None},
        )
        ranks = state["ranks"]
        if err is not None and err < eps:
            break

    w_edges.unpersist()
    return ranks
