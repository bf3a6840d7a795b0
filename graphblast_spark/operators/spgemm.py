"""Masked SpGEMM and trace — the matrix-matrix family.

Reference: operations.hpp:20-49 (mxm) → backend/cuda/operations.hpp:16-78
→ spgemm.hpp:20-110 (masked kernel: per mask-edge (i,j), dot of A's
row i with B's column j, kernels/spgemm.hpp:30-78); operations.hpp:698-711
(traceMxmTranspose) → trace.hpp.

The masked SpGEMM is the classic Spark wedge join: the mask edge set
*is* the output pattern (reference spgemm.hpp:84-87 duplicates the mask
structure into C), so

    C(i,j) = ⊕_k A(i,k) ⊗ B(k,j)   for (i,j) ∈ mask

becomes  mask ⋈ A on i ⋈ B on (k, j)  → groupBy(i,j) agg.

At scale: the wedge join's shuffle is on the intermediate key k; skew
on hub vertices is handled by AQE skew-join splitting plus the
degree-ordered tril prep in the TC algorithm (see algorithms/tc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.semiring import Semiring, semiring as _resolve


def mxm_masked(
    mask: DataFrame,
    a: Graph,
    b: Graph,
    sr: Semiring | str = "PlusMultiplies",
) -> DataFrame:
    """C⟨mask⟩ = A ⊕.⊗ B, output pattern = mask pattern.

    ``mask`` is an edge DataFrame (src, dst[, val]); returns
    (src, dst, val) with val = ⊕_k A(src,k) ⊗ B(k,dst), rows restricted
    to mask entries that have ≥1 contributing k (reference kernel
    leaves others at identity; empty dots produce no row here —
    callers needing explicit identities can outer-join the mask).
    """
    sr = _resolve(sr)
    m = mask.select(F.col("src").alias("m_src"), F.col("dst").alias("m_dst"))
    ae = a.edges.select(
        F.col("src").alias("a_src"), F.col("dst").alias("a_dst"), F.col("val").alias("a_val")
    )
    be = b.edges.select(
        F.col("src").alias("b_src"), F.col("dst").alias("b_dst"), F.col("val").alias("b_val")
    )
    return (
        m.join(ae, on=F.col("m_src") == F.col("a_src"))
        .join(be, on=(F.col("a_dst") == F.col("b_src")) & (F.col("m_dst") == F.col("b_dst")))
        .groupBy(F.col("m_src").alias("src"), F.col("m_dst").alias("dst"))
        .agg(sr.add_agg(sr.mul(F.col("a_val"), F.col("b_val"))).alias("val"))
    )


def mxm(
    a: Graph,
    b: Graph,
    sr: Semiring | str = "PlusMultiplies",
) -> DataFrame:
    """C = A ⊕.⊗ B — general (unmasked) semiring SpGEMM.

    Reference: the cuSPARSE csrgemm path (operations.hpp:44-47 →
    backend/cuda/spgemm.hpp:112-512) — the one mxm variant with a live
    unmasked implementation. Returns the edge table of C:
    (src, dst, val) with val = ⊕_k A(src,k) ⊗ B(k,dst); structural
    zeros produce no row (sparse semantics).

    Spark shape: one join on the contraction key k (A.dst == B.src) and
    one groupBy (src, dst) with map-side partial ⊕ — the exchange +
    hash-agg IS the reference's hash-table row-merge, with Spark doing
    the load balancing the kernel hand-rolls.

    At 100 TB scale the hazards are (1) skew on hub k — the join
    explodes d_in(k)·d_out(k) wedges per hub; AQE skew-join splitting
    handles the join side, and the two-level partial agg absorbs the
    reduce side; (2) output cardinality — |C| can be ≫ |A|+|B| (up to
    Σ_k d_in·d_out); callers that only need a restricted pattern should
    use :func:`mxm_masked`, which prunes BEFORE the wedge explosion."""
    sr = _resolve(sr)
    ae = a.edges.select(
        F.col("src").alias("a_src"), F.col("dst").alias("k"), F.col("val").alias("a_val")
    )
    be = b.edges.select(
        F.col("src").alias("k"), F.col("dst").alias("b_dst"), F.col("val").alias("b_val")
    )
    return (
        ae.join(be, on="k")
        .groupBy(F.col("a_src").alias("src"), F.col("b_dst").alias("dst"))
        .agg(sr.add_agg(sr.mul(F.col("a_val"), F.col("b_val"))).alias("val"))
    )


def trace_mxm_transpose(a: Graph, b: Graph, sr: Semiring | str = "PlusMultiplies"):
    """val = Tr(A ⊕.⊗ Bᵀ) = ⊕ over coincident edges of A(i,j)⊗B(i,j)
    (reference operations.hpp:698-711 → trace.hpp:10-53)."""
    sr = _resolve(sr)
    ae = a.edges.alias("a")
    be = b.edges.alias("b")
    row = (
        ae.join(be, on=(F.col("a.src") == F.col("b.src")) & (F.col("a.dst") == F.col("b.dst")))
        .agg(sr.add_agg(sr.mul(F.col("a.val"), F.col("b.val"))).alias("v"))
        .first()
    )
    return row["v"]
