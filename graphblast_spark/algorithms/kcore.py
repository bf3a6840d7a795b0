"""k-core membership (iterative degree peeling) and full core
decomposition (per-vertex coreness via distributed h-index iteration).

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


def core_decomposition(
    g: Graph,
    desc: Descriptor = DEFAULT_DESC,
    runner: SuperstepRunner | None = None,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Per-vertex coreness (the max k with the vertex in the k-core) of
    the undirected view, via the distributed h-index iteration
    (Montresor-De Pellegrini-Miorandi 2011 / Lü et al. 2016): start at
    c(v) = deg(v) and repeat c'(v) = H({min(c(w), c(v)) : w ∈ N(v)})
    until the fixpoint, where H is the h-index (max t with ≥ t
    neighbors of value ≥ t). c is non-increasing, always ≥ coreness,
    and the fixpoint is exactly coreness — so the decimal-sum witness
    (scc.py's pattern) is an exact convergence test. The min(·, c(v))
    cap never changes H (all uncapped values ≥ c(v) are ≥ H) but keeps
    the per-vertex distinct-value spread bounded by c(v), which after
    round 1 is ≤ H(deg of neighbors) — the power-law hub's value list
    collapses from deg(hub) to O(√|E|)-ish immediately.

    Per round: two hash joins (neighbor + own value), one map-side-
    combining (id, val) count, one bounded per-id window cum-sum —
    group size = distinct capped values ≤ c(v), NOT deg(v), so the
    window sort is skew-safe at web scale.

    Returns (id long, coreness long), 0 for isolated vertices. With
    ``fixed_rounds`` the deterministic partially-converged state is
    returned (the unrolled-SQL oracle contract, lp.py's posture);
    convergence is the default. Relates to ``k_core``:
    in_core(k) = 1 ⟺ coreness ≥ k (pytest-pinned).
    """
    from pyspark.sql import Window

    from graphblast_spark.algorithms.scc import _sum_witness

    spark = g.edges.sparkSession
    if runner is None:
        runner = SuperstepRunner(spark)

    e = g.edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).filter(F.col("a") != F.col("b"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # symmetric closure deduped with ONE distinct (mirror-then-dedup —
    # dedup-then-mirror would evaluate the distinct shuffle twice)
    adj = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(n_part, "b")
        .persist()
    )
    adj.count()

    def init():
        deg = adj.groupBy(F.col("a").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return {
            "core": g.vertices.join(deg, "id", "left").select(
                "id", F.coalesce("c", F.lit(0).cast("long")).alias("c")
            )
        }

    state, start_iter, scalars = runner.resume_or_init(init)
    core = state["core"]
    prev = int(scalars["w"]) if "w" in scalars else _sum_witness(core, "c")

    max_rounds = fixed_rounds if fixed_rounds is not None else desc.max_niter
    w = Window.partitionBy("id").orderBy(F.col("val").desc())
    with stable_partitions(spark):
        for it in range(start_iter, max_rounds):
            t0 = time.time()
            cd = core.select(F.col("id").alias("b"), F.col("c").alias("cb"))
            cs = core.select(F.col("id").alias("a"), F.col("c").alias("ca"))
            cnt = (
                adj.join(cd, "b").join(cs, "a")
                .groupBy(F.col("a").alias("id"),
                         F.least("cb", "ca").alias("val"))
                .agg(F.count(F.lit(1)).alias("n"))
            )
            h = (
                cnt.withColumn("cum", F.sum("n").over(w))
                .groupBy("id")
                .agg(F.max(F.least(F.col("val"), F.col("cum"))).alias("h"))
            )
            new_core = core.join(h, "id", "left").select(
                "id",
                F.coalesce("h", F.lit(0)).cast("long").alias("c"),
            ).transform(truncate_plan)
            state = runner.truncate({"core": new_core})
            new_core = state["core"]
            cur = _sum_witness(new_core, "c")
            core = new_core
            runner.commit(
                it, state, scalars={"w": cur},
                metrics={"ms": (time.time() - t0) * 1000.0, "witness": cur},
            )
            if cur == prev and fixed_rounds is None:
                break
            prev = cur
        else:
            if fixed_rounds is None:
                raise RuntimeError(
                    f"core_decomposition did not converge within "
                    f"max_niter={desc.max_niter} h-index rounds; raise "
                    f"desc.max_niter (rounds needed is graph-dependent, "
                    f"typically O(peel depth))"
                )

    adj.unpersist()
    return core.select("id", F.col("c").alias("coreness"))
