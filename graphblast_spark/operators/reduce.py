"""Reductions — reference operations.hpp:618-673 → reduce.hpp.

- matrix→vector: row- or column-wise semiring reduce (out-degrees etc.)
  = ``groupBy(key).agg`` — Spark's partial+final hash aggregate is the
  CUB segmented-reduce analog, with map-side combine for free.
- vector→scalar / matrix→scalar: a single agg action; this is the
  per-superstep device→host sync of the reference (reduce.hpp:43) and
  is budgeted at one per superstep.
- struconly shortcut (reference reduce.hpp:71-74): count instead of sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.semiring import Monoid, monoid as _resolve_monoid


def reduce_matrix_to_vector(
    g: Graph, m: Monoid | str = "Plus", axis: str = "src"
) -> DataFrame:
    """w(i) = ⊕_j A(i,j) (axis='src', row-wise) or ⊕_i A(i,j)
    (axis='dst'). Reference operations.hpp:618-633."""
    mo = _resolve_monoid(m)
    return g.edges.groupBy(F.col(axis).alias("id")).agg(mo.agg(F.col("val")).alias("val"))


def reduce_vector_to_scalar(u: DataFrame, m: Monoid | str = "Plus", structure_only: bool = False):
    """val = ⊕_i u(i). Reference operations.hpp:640-653. With
    structure_only, returns nvals (reference reduce.hpp:71-74)."""
    if structure_only:
        return u.count()
    mo = _resolve_monoid(m)
    row = u.agg(mo.agg(F.col("val")).alias("v")).first()
    return row["v"]


def reduce_matrix_to_scalar(g: Graph, m: Monoid | str = "Plus"):
    """val = ⊕_{i,j} A(i,j) — the TC total (reference tc.hpp:42)."""
    mo = _resolve_monoid(m)
    row = g.edges.agg(mo.agg(F.col("val")).alias("v")).first()
    return row["v"]
