"""k-truss decomposition — edge-level cohesion by support peeling.

k-core (kcore.py) peels VERTICES by degree; the k-truss (Cohen 2008,
"Trusses: cohesive subgraphs for social network analysis") peels EDGES
by triangle support: the k-truss is the maximal subgraph in which every
edge participates in at least k-2 triangles *within the subgraph*. It
is the standard community-core / spam-link filter one tier stronger
than k-core (every k-truss is a (k-1)-core, not vice versa).

Reference scope: the reference ships triangle counting (tc.hpp) but no
truss; this reuses tc.py's sorted-adjacency-intersection shape
(test_tc.hpp:14-84's CPU oracle, vectorized) per peel round.

Plan shape per round (the whole round is 3 shuffles + 1 action):
adjacency rebuild = one groupBy(id) with sort_array(collect_list) —
per-vertex arrays bounded by current degree; support = two vertex-keyed
hash joins + size(array_intersect) — shuffle volume O(Σ deg(u)+deg(v)
per edge) like tc; the filter is free. Rounds = peel depth (small on
power-law graphs: most edges die in the first rounds). Hub caveat: a
10^7-degree hub's adjacency array is one fat row — same trade tc.py
makes; at that scale orient-and-batch or switch to the wedge-join
support (mxm_masked) per round.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.runtime.superstep import SuperstepRunner, stable_partitions, truncate_plan


def _support(und: DataFrame) -> DataFrame:
    """(a, b, support) per canonical undirected edge: the number of
    common neighbors of a and b inside ``und``."""
    nbrs = und.select(F.col("a").alias("id"), F.col("b").alias("n")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("n"))
    )
    adj = nbrs.groupBy("id").agg(F.sort_array(F.collect_list("n")).alias("nbrs"))
    aa = adj.select(F.col("id").alias("a"), F.col("nbrs").alias("na"))
    ab = adj.select(F.col("id").alias("b"), F.col("nbrs").alias("nb"))
    return (
        und.join(aa, "a")
        .join(ab, "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("na", "nb")).alias("support"),
        )
    )


def edge_triangle_support(g: Graph) -> DataFrame:
    """Triangle support of every undirected edge of ``g``:
    (a, b, support) with a < b — the single-pass building block of the
    truss peel (and a useful signal on its own: support-0 edges are
    bridges/noise, high-support edges are community cores)."""
    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    return _support(und)


def k_truss(
    g: Graph,
    k: int = 3,
    runner: SuperstepRunner | None = None,
    max_rounds: int = 1000,
) -> DataFrame:
    """Edges of the k-truss of the undirected view of ``g``:
    (a, b, support) with a < b and support = the edge's triangle count
    WITHIN the truss (≥ k-2 by definition; empty result if no edge
    survives). Peeling converges because the edge set shrinks
    monotonically."""
    if k < 2:
        raise ValueError("k-truss needs k >= 2 (k=2 is the full graph)")
    spark = g.edges.sparkSession
    if runner is None:
        runner = SuperstepRunner(spark)

    e = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .transform(truncate_plan)
    )
    n_edges = und.count()

    with stable_partitions(spark):
        for rnd in range(max_rounds):
            t0 = time.time()
            if n_edges == 0:
                break
            sup = _support(und)
            keep = sup.filter(F.col("support") >= k - 2).transform(truncate_plan)
            n_keep = keep.count()
            runner.commit(
                rnd, {},
                metrics={"edges": n_keep, "ms": (time.time() - t0) * 1000.0},
            )
            if n_keep == n_edges:
                return keep
            und = keep.select("a", "b")
            n_edges = n_keep
    if n_edges > 0:
        # A pathological peel can remove one edge per round; silently
        # returning the empty frame here would misreport a non-empty
        # truss as empty. Fail loudly instead.
        raise RuntimeError(
            f"k_truss did not converge within max_rounds={max_rounds} "
            f"({n_edges} edges still unsettled); raise max_rounds"
        )
    # empty truss: preserve the output schema
    return und.limit(0).withColumn("support", F.lit(0))
