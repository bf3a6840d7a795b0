"""Deterministic RMAT power-law graph generator — pure Spark expressions.

The reference benchmarks on RMAT/Kronecker graphs (rmat_n22-n24 in
run_pr.sh / run_bfs.sh dataset tiers) and SuiteSparse downloads; this
sandbox has no external data, so we synthesise the same family
deterministically. Each edge id i ∈ [0, m) derives its endpoints from
``xxhash64(i, seed, level)`` quadrant draws — no RNG state, no driver
data, no Python in the hot path: the whole generator is one
``spark.range(m)`` plus chained JVM column expressions, so it is
embarrassingly parallel and reproducible across any partitioning or
cluster size.

Standard Graph500 parameters (a,b,c,d) = (0.57, 0.19, 0.19, 0.05)
give the power-law degree skew the north rule's hub handling must
survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rmat_edges(
    spark: SparkSession,
    scale: int = 20,
    edge_factor: int = 16,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    num_partitions: int | None = None,
) -> DataFrame:
    """Edge table (src long, dst long, val double) with n=2^scale
    vertices and m=n*edge_factor generated edges (duplicates/self-loops
    included, as Graph500 generates them — ``Graph.build`` cleans)."""
    n = 1 << scale
    m = n * edge_factor
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(0, m, 1, num_partitions)

    # Quadrant thresholds on a uniform draw in [0, 1).
    t_ab = a + b
    t_abc = a + b + c
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(level))
        # map signed 64-bit hash → uniform [0,1)
        u = (F.pmod(h, F.lit(1_000_003))).cast("double") / 1_000_003.0
        src_bit = (u >= t_ab).cast("long")
        dst_bit = ((u >= a) & (u < t_ab) | (u >= t_abc)).cast("long")
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select(
        src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("val")
    )


def rmat_vertices(spark: SparkSession, scale: int) -> DataFrame:
    """Dense vertex universe 0..2^scale-1 (includes isolated ids —
    the PR dangling-vertex domain, SURVEY §7.3.5)."""
    return spark.range(0, 1 << scale).select(F.col("id"))
