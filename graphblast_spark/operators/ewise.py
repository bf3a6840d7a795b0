"""Element-wise ops — intersection/union joins and projections.

GraphBLAS semantics (reference operations.hpp:129-158, 269-299):
``eWiseMult`` operates on the *intersection* of nonzero structures
(inner join on id) using the semiring's ⊗; ``eWiseAdd`` on the
*union* (full outer join, identity fill) using the semiring's ⊕.
Scalar-broadcast variants are plain projections.

These are pure Column-expression pipelines — whole-stage codegen
fuses chains of them (the reference fuses apply+vxm by hand,
operations.hpp:835-865; Catalyst fuses projections automatically).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphblast_spark.operators.accum import accum_merge
from graphblast_spark.semiring import Semiring, semiring as _resolve


def _mask_join(out: DataFrame, mask: DataFrame | None, complement: bool) -> DataFrame:
    if mask is None:
        return out
    how = "left_anti" if complement else "left_semi"
    return out.join(mask.select("id"), on="id", how=how)


def ewise_mult(
    u: DataFrame,
    v: DataFrame,
    sr: Semiring | str = "PlusMultiplies",
    mask: DataFrame | None = None,
    mask_complement: bool = False,
    accum=None,
    w: DataFrame | None = None,
    replace: bool = False,
) -> DataFrame:
    """w = u ⊗ v on the intersection of structures — reference
    operations.hpp:135-158 → ewisemult.hpp. Inner join on id.
    ``accum``/``w``/``replace``: GraphBLAS merge-on-write (accum.py)."""
    sr = _resolve(sr)
    uu, vv = u.alias("u"), v.alias("v")
    out = uu.join(vv, on=F.col("u.id") == F.col("v.id"), how="inner").select(
        F.col("u.id").alias("id"),
        sr.mul(F.col("u.val"), F.col("v.val")).alias("val"),
    )
    out = _mask_join(out, mask, mask_complement)
    return accum_merge(w, out, accum=accum, mask=mask,
                       mask_complement=mask_complement, replace=replace)


def ewise_add(
    u: DataFrame,
    v: DataFrame,
    sr: Semiring | str = "PlusMultiplies",
    mask: DataFrame | None = None,
    mask_complement: bool = False,
    accum=None,
    w: DataFrame | None = None,
    replace: bool = False,
) -> DataFrame:
    """w = u ⊕ v on the union of structures (missing side = ⊕-identity)
    — reference operations.hpp:275-299 → ewiseadd.hpp. Full outer join.
    ``accum``/``w``/``replace``: GraphBLAS merge-on-write (accum.py)."""
    sr = _resolve(sr)
    ident = F.lit(sr.identity)
    uu, vv = u.alias("u"), v.alias("v")
    out = uu.join(vv, on=F.col("u.id") == F.col("v.id"), how="full_outer").select(
        F.coalesce(F.col("u.id"), F.col("v.id")).alias("id"),
        sr.add(
            F.coalesce(F.col("u.val"), ident), F.coalesce(F.col("v.val"), ident)
        ).alias("val"),
    )
    out = _mask_join(out, mask, mask_complement)
    return accum_merge(w, out, accum=accum, mask=mask,
                       mask_complement=mask_complement, replace=replace)


def ewise_add_matrix(a, b, sr: Semiring | str = "PlusMultiplies") -> DataFrame:
    """C = A ⊕ B on the union of edge structures (missing side =
    ⊕-identity). The reference declares this but returns
    NOT_IMPLEMENTED (operations.hpp:301-319); here it falls out of the
    same full-outer-join shape as the vector eWiseAdd, keyed on
    (src, dst). ``a``/``b`` are Graphs or edge DataFrames; returns an
    edge DataFrame (src, dst, val).

    At scale both sides hash-shuffle on (src, dst) once; if both edge
    tables share the build's src partitioning the exchange reuses it on
    the src component."""
    sr = _resolve(sr)
    ae = (a.edges if hasattr(a, "edges") else a).alias("a")
    be = (b.edges if hasattr(b, "edges") else b).alias("b")
    ident = F.lit(sr.identity)
    return ae.join(
        be,
        on=(F.col("a.src") == F.col("b.src")) & (F.col("a.dst") == F.col("b.dst")),
        how="full_outer",
    ).select(
        F.coalesce(F.col("a.src"), F.col("b.src")).alias("src"),
        F.coalesce(F.col("a.dst"), F.col("b.dst")).alias("dst"),
        sr.add(
            F.coalesce(F.col("a.val"), ident), F.coalesce(F.col("b.val"), ident)
        ).alias("val"),
    )


def ewise_mult_scalar(u: DataFrame, c, sr: Semiring | str = "PlusMultiplies") -> DataFrame:
    """w = u ⊗ c — reference operations.hpp:204-228 (matrix×scalar is
    Graph.scale_vals). Pure projection."""
    sr = _resolve(sr)
    return u.select("id", sr.mul(F.col("val"), F.lit(c)).alias("val"))


def ewise_add_scalar(u: DataFrame, c, sr: Semiring | str = "PlusMultiplies") -> DataFrame:
    """w = u ⊕ c — the PR teleport add (reference operations.hpp:321-353,
    pr.hpp:71-72). Pure projection."""
    sr = _resolve(sr)
    return u.select("id", sr.add(F.col("val"), F.lit(c)).alias("val"))


def apply_unary(
    u: DataFrame,
    fn: Callable[[Column], Column],
    mask: DataFrame | None = None,
    mask_complement: bool = False,
) -> DataFrame:
    """w⟨mask⟩ = op(u) — reference operations.hpp:554-610 (apply).
    ``fn`` is a Column→Column expression; e.g. the reference's
    ``set_random`` (algorithm/common.hpp:8-42) becomes a seeded
    deterministic hash: ``lambda c: F.xxhash64(c, F.lit(seed))``."""
    out = u.select("id", fn(F.col("val")).alias("val"))
    return _mask_join(out, mask, mask_complement)


def ewise_mult_matrix_vector(
    g, u: DataFrame, sr: Semiring | str = "PlusMultiplies",
    axis: str = "col",
) -> "DataFrame":
    """Matrix×vector broadcast eWiseMult — A(i,j) ⊗ u(j) (axis='col')
    or A(i,j) ⊗ u(i) (axis='row'); reference operations.hpp:230-267 →
    backend eWiseMultColInner/RowInner (the PR A÷outdeg prep,
    example/gpr.cu:89-90). Returns an edge DataFrame (src, dst, val).

    Physical note: ``u`` is a vertex vector (≪ |E|); Spark's planner
    broadcasts it under the threshold, else AQE converts at runtime —
    either way the edge table is NOT shuffled."""
    sr = _resolve(sr)
    key = "dst" if axis == "col" else "src"
    uu = u.select(F.col("id").alias("__uid"), F.col("val").alias("__uval"))
    return (
        g.edges.join(uu, on=g.edges[key] == uu["__uid"], how="inner")
        .select("src", "dst", sr.mul(F.col("val"), F.col("__uval")).alias("val"))
    )


def extract_subvector(u: DataFrame, ids: DataFrame) -> DataFrame:
    """w = u[indices] — the reference's (unimplemented) extract stubs,
    operations.hpp:360-410; here a semi-join."""
    return u.join(ids.select("id"), on="id", how="left_semi")


def extract_submatrix(g: "Graph", row_ids: DataFrame, col_ids: DataFrame | None = None):
    """C = A[rows, cols] — submatrix extract (reference stub,
    operations.hpp:372-391). Two semi-joins; both prune BEFORE any
    downstream shuffle (Catalyst pushes the filters into the edge
    scan when the id sets are literal/broadcastable)."""
    e = g.edges.join(
        row_ids.select(F.col(row_ids.columns[0]).alias("src")), on="src", how="left_semi"
    )
    if col_ids is not None:
        e = e.join(
            col_ids.select(F.col(col_ids.columns[0]).alias("dst")), on="dst", how="left_semi"
        )
    return e


def extract_matrix_column(g: "Graph", j: int) -> DataFrame:
    """w = A[:, j] — matrix-column extract as a vector (reference stub,
    operations.hpp:393-410): a pushed-down filter on dst."""
    return g.edges.filter(F.col("dst") == F.lit(j)).select(
        F.col("src").alias("id"), "val"
    )


def set_element(u: DataFrame, idx: int, value) -> DataFrame:
    """Vector::setElement (vector.hpp:132-141) — never a point write:
    a projection with a conditional, preserving immutability."""
    return u.select(
        "id",
        F.when(F.col("id") == F.lit(idx), F.lit(value)).otherwise(F.col("val")).alias("val"),
    )


def extract_element(u: DataFrame, idx: int):
    """Vector::extractElement — point lookup (a filter, not a scan at
    scale when id is the partition key)."""
    rows = u.filter(F.col("id") == F.lit(idx)).select("val").take(1)
    return rows[0]["val"] if rows else None


def count_unique(u: DataFrame, approx: bool = False):
    """countUnique (declared-but-stubbed in the reference,
    vector.hpp:190-194 — implemented here): distinct value count."""
    agg = F.approx_count_distinct("val") if approx else F.countDistinct("val")
    return u.agg(agg.alias("n")).first()["n"]
