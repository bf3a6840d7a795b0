"""assign / scatter / gather — indexed projection & update.

Reference: operations.hpp:417-530 (assign family), 748-814
(scatter/extractGather) → kernels/scatter.hpp, kernels/gather.hpp.
These are the FastSV-CC workhorses (cc.hpp:77-99).

Point-writes don't exist on immutable DataFrames; every variant is a
join + coalesce/when projection. Where the reference's GPU scatter is
*nondeterministic last-write-wins* (kernels/scatter.hpp:23-37), we
resolve collisions with a deterministic ``min`` — FastSV's fixpoint is
invariant to the choice (SURVEY §7.3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_masked_constant(
    w: DataFrame,
    mask: DataFrame,
    c,
    mask_complement: bool = False,
    replace: bool = False,
) -> DataFrame:
    """w[all]⟨mask⟩ = c — the frontier-filter primitive (reference
    operations.hpp:502-530; BFS depth-marking bfs.hpp:65-66).

    Rows of ``w`` whose id is in ``mask`` (or NOT in it, when
    complemented) get value ``c``; others keep their value — unless
    ``replace`` (GrB_REPLACE, types.hpp:44-78): then rows outside the
    writable region are dropped instead of kept."""
    m = mask.select("id").withColumn("__hit", F.lit(True))
    joined = w.alias("w").join(m, on="id", how="left")
    hit = F.col("__hit").isNotNull()
    cond = ~hit if mask_complement else hit
    if replace:
        return joined.filter(cond).select("id", F.lit(c).alias("val"))
    return joined.select("id", F.when(cond, F.lit(c)).otherwise(F.col("w.val")).alias("val"))


def assign_indexed(w: DataFrame, u: DataFrame, indices: DataFrame) -> DataFrame:
    """w[indices[i]] = u[i] — dense gather-assign (reference
    operations.hpp:417-439 → backend/cuda/operations.hpp:743-775).

    ``indices`` is a vector (id, val) whose val holds the TARGET
    position in ``w`` for the element u[id]; elements of ``w`` not
    targeted keep their value. Collisions (two i mapping to the same
    target — impossible for the reference's dense index array but
    possible for arbitrary inputs) resolve to the update from the
    smallest source id, for determinism."""
    up = (
        indices.alias("ix")
        .join(u.alias("u"), on=F.col("ix.id") == F.col("u.id"), how="inner")
        .groupBy(F.col("ix.val").cast("long").alias("id"))
        .agg(F.min_by(F.col("u.val"), F.col("u.id")).alias("__new"))
    )
    return (
        w.join(up, on="id", how="left")
        .select("id", F.coalesce(F.col("__new"), F.col("val")).alias("val"))
    )


def assign_scatter(w: DataFrame, updates: DataFrame) -> DataFrame:
    """w[updates.target] = updates.val — vector-of-indices scatter
    (reference operations.hpp:769-790; FastSV hooking f[f[u]]=mngf[u],
    cc.hpp:83-84). ``updates`` has columns (target, val). Collisions
    resolve to min(val) for determinism."""
    up = updates.groupBy(F.col("target").alias("id")).agg(F.min("val").alias("__new"))
    return (
        w.join(up, on="id", how="left")
        .select("id", F.coalesce(F.col("__new"), F.col("val")).alias("val"))
    )


def extract_gather(indices: DataFrame, u: DataFrame) -> DataFrame:
    """w[i] = u[indices[i]] — gather (reference operations.hpp:796-814;
    FastSV grandparent gf[u]=f[f[u]], cc.hpp:98-99). ``indices`` is a
    vector whose val column holds ids to look up in ``u``; this is the
    pointer-jumping self-join."""
    idx, uu = indices.alias("idx"), u.alias("u")
    return idx.join(uu, on=F.col("idx.val") == F.col("u.id"), how="inner").select(
        F.col("idx.id").alias("id"), F.col("u.val").alias("val")
    )


def scatter_constant(u: DataFrame, c) -> DataFrame:
    """w[u[i]] = c — constant scatter over an index vector (reference
    operations.hpp:748-761; GC used-colors bitmap gc.hpp:364-366)."""
    return u.select(F.col("val").cast("long").alias("id")).distinct().withColumn(
        "val", F.lit(c)
    )
