"""Connected components — FastSV-style min-label hooking + pointer jumping.

Reference: graphblas/algorithm/cc.hpp:17-136 (FastSV, Zhang/Azad/Hu
SIAM PP20): per round (1) min-neighbor-grandparent hooking, (2)
shortcutting, (3) pointer jumping, converging when parents stabilize.
Labels converge to the **min vertex id of the component** (parent init
is fillAscending, cc.hpp:44), which is exactly what we return —
deterministic, unlike the reference's GPU last-write-wins scatter
(SURVEY §7.3.3: min-resolution reaches the same fixpoint).

Spark formulation per superstep (undirected: edges are used in both
orientations, the --directed 2 semantics of run_cc.sh:16):

1. hook:   f'(u) = min(f(u), min_{v∈N(u)} f(v))     — join + min-agg
2. jump:   f''(u) = f'(f'(u))                        — self-join gather
3. converged when Σ[f'' ≠ f] == 0                    — the scalar action

Both steps shrink labels monotonically, so the fixpoint is the
component minimum; hooking alone is O(diameter) rounds, jumping makes
long chains collapse in O(log n) — the property that matters on a
100 TB web graph whose link chains can be thousands long.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.descriptor import DEFAULT_DESC, Descriptor
from graphblast_spark.matrix import Graph
from graphblast_spark.operators.assign import extract_gather
from graphblast_spark.runtime.superstep import SuperstepRunner, stable_partitions, truncate_plan


def connected_components(
    g: Graph,
    desc: Descriptor = DEFAULT_DESC,
    runner: SuperstepRunner | None = None,
    pointer_jump: bool = True,
) -> DataFrame:
    """Returns (id long, component long) with component = min id of the
    connected component (treating edges as undirected)."""
    spark = g.edges.sparkSession

    # Undirected view: both orientations; duplicates are harmless under
    # the min aggregate, so skip the dedup shuffle (cf. util.hpp:263-329
    # which dedups at build — our build already deduped (src,dst)).
    e = g.edges.select("src", "dst")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin layout on dst — the hook join's edge-side key — so only the
    # (small) parent table shuffles each superstep
    e_sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(n_part, "dst")
        .persist()
    )
    e_sym.count()

    if runner is None:
        runner = SuperstepRunner(spark)

    def init():
        return {"parent": g.vertices.select("id", F.col("id").alias("val"))}

    state, start_iter, _ = runner.resume_or_init(init)
    parent = state["parent"]

    with stable_partitions(spark):
        for it in range(start_iter, desc.max_niter):
            t0 = time.time()
            # (1) hooking: min neighbor parent (cc.hpp:78 MinimumSelectSecond
            # vxm); shuffle-hash: probe persisted edges, build from parent
            p = parent.hint("shuffle_hash")
            nbr_min = (
                e_sym.join(p, on=e_sym["dst"] == p["id"], how="inner")
                .groupBy(e_sym["src"].alias("id"))
                .agg(F.min(p["val"]).alias("nmin"))
            )
            hooked = (
                parent.join(nbr_min, on="id", how="left")
                .select("id", F.least(F.col("val"), F.coalesce(F.col("nmin"), F.col("val"))).alias("val"))
            )
            # (2) shortcut/jump: f[u] = f[f[u]] (cc.hpp:98-99 extractGather)
            new_parent = extract_gather(hooked, hooked) if pointer_jump else hooked
            new_parent = new_parent.transform(truncate_plan)

            # (3) convergence (cc.hpp:102-104 MinimumNotEqualTo reduce).
            # Labels are integers and strictly monotone non-increasing, so
            # Σ label is an exact fixpoint witness: unchanged sum ⟺ no
            # label moved. One agg over the just-checkpointed table — no
            # 1M×1M diff join per superstep. Summed as decimal(38,0):
            # at 10^12 vertices × 10^12-sized labels the int64 sum
            # overflows (~10^24 ≫ 2^63) — ANSI Spark (4.x default) kills
            # the job mid-superstep, non-ANSI wraps silently and a
            # wrapped collision could fake convergence; decimal keeps
            # the witness exact at any scale for the same single-agg
            # cost (tests/test_operators3.py pins both behaviors).
            label_sum = int(
                new_parent.agg(F.sum(F.col("val").cast("decimal(38,0)"))).first()[0]
            )
            changed = None if it == start_iter else (label_sum != prev_sum)
            prev_sum = label_sum
            ms = (time.time() - t0) * 1000.0
            state = runner.commit(
                it, {"parent": new_parent},
                scalars={"label_sum": label_sum}, metrics={"ms": ms},
            )
            parent = state["parent"]
            if changed is False:
                break

    e_sym.unpersist()
    return parent.select("id", F.col("val").alias("component"))
