"""Per-partition vectorized SpMV kernel — the mapInArrow gather path.

The reference's pull SpMV is a per-row CSR gather: each GPU thread-row
walks its adjacency segment, multiplies against the *fully materialized
dense vector* resident on the device, and reduces locally
(reference graphblas/backend/cuda/kernels/spmv.hpp:33-120). The
join+agg formulation in :mod:`.vecmat` is the beyond-reference scale
path (the vector is never materialized anywhere); THIS module is the
faithful kernel analog for the dense-vector regime the reference
actually runs in:

- the dense vector (one float64 per vertex) is broadcast to every
  executor — exactly the reference's device-resident ``d_val`` array,
  and the same memory constraint (|V|×8 bytes must fit per node; at
  |V|=10^9 that is 8 GB — the practical ceiling, beyond which the
  join path takes over);
- each edge partition runs one numpy pass: gather ``u[src]``, ⊗ with
  the edge value, partial-⊕ by ``dst`` (``np.bincount`` for Plus,
  ``ufunc.at`` otherwise) — the merge-path row-segment reduce,
  vectorized instead of hand-scheduled;
- partials shuffle once, grouped by ``dst`` with the monoid aggregate
  — Spark's partial/final agg split, made explicit.

Supported semirings: the dense-regime hot pair (PlusMultiplies — PR,
LGC; MinimumPlus — SSSP, CC shortcut). Both have the property that a
"missing" vector entry filled with the ⊕ identity contributes nothing
(0 to a sum, +inf to a min), so dense-filling is semantics-preserving
for a dense or effectively-dense u.

Measured (BENCH.md): at RMAT-20/local[32], join+agg 1.53 s/op vs
kernel 8.23 s/op — the JVM hash join beats the kernel **5.4×**,
because the kernel ships all |E| rows across the JVM↔Python Arrow
boundary every call while the join never leaves codegen. This module
therefore exists as (a) the measured evidence behind the engine's
join-first design (SURVEY §7.0 proposed this kernel; the numbers
reject it for the hot path), and (b) the template for semantics the
DataFrame ops genuinely cannot express, where mapInArrow is the
sanctioned escape hatch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.matrix import Graph
from graphblast_spark.semiring import Semiring, semiring as _resolve

# numpy realizations of the supported ⊗ and ⊕ (keyed by registry names)
_NP_MUL = {
    "PlusMultiplies": lambda u, w: u * w,
    "MinimumPlus": lambda u, w: u + w,
}
_NP_MONOID = {
    "Plus": (np.add, 0.0),
    "Minimum": (np.minimum, np.inf),
}


def _dense_array(u: DataFrame, n: int, identity: float) -> np.ndarray:
    """u(id, val) → float64[max_id+1] indexed by id. The contract is a
    *compact* non-negative id domain (the distill dense rank /
    fillAscending invariant — ids in [0, ~n)); u must cover every edge
    source id. Absent slots take the ⊕ identity (contribute nothing)."""
    pdf = u.select("id", "val").toPandas()
    ids = pdf["id"].to_numpy()
    max_id = int(ids.max()) if len(ids) else -1
    if max_id < 0 and n <= 0:
        raise ValueError("empty vector and empty graph domain")
    if (len(ids) and ids.min() < 0) or max_id >= (1 << 31):
        raise ValueError(
            "kernel path requires a compact non-negative id domain "
            f"(got min={ids.min() if len(ids) else None}, max={max_id})"
        )
    arr = np.full(max(n, max_id + 1), identity, dtype=np.float64)
    arr[ids] = pdf["val"].to_numpy(dtype=np.float64)
    return arr


def _vecmat_arrow(
    u: DataFrame, g: Graph, sr: Semiring | str, in_key: str, out_key: str
) -> DataFrame:
    sr = _resolve(sr)
    if sr.name not in _NP_MUL or sr.add_monoid.name not in _NP_MONOID:
        raise ValueError(
            f"kernel path supports {sorted(_NP_MUL)}; use operators.vxm for {sr.name}"
        )
    np_mul = _NP_MUL[sr.name]
    ufunc, identity = _NP_MONOID[sr.add_monoid.name]
    is_plus = sr.add_monoid.name == "Plus"

    spark = g.edges.sparkSession
    bc = spark.sparkContext.broadcast(_dense_array(u, g.n, identity))

    def kernel(batches):
        import pyarrow as pa

        u_arr = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            src = batch.column(0).to_numpy(zero_copy_only=False)
            dst = batch.column(1).to_numpy(zero_copy_only=False)
            val = batch.column(2).to_numpy(zero_copy_only=False)
            prod = np_mul(u_arr[src], val)
            uniq, inv = np.unique(dst, return_inverse=True)
            if is_plus:
                part = np.bincount(inv, weights=prod, minlength=len(uniq))
            else:
                part = np.full(len(uniq), identity)
                ufunc.at(part, inv, prod)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq), pa.array(part)], ["id", "p"]
            )

    partials = g.edges.select(
        F.col(in_key).alias("src"), F.col(out_key).alias("dst"), "val"
    ).mapInArrow(kernel, "id long, p double")
    return partials.groupBy("id").agg(sr.add_agg(F.col("p")).alias("val"))


def vxm_arrow(u: DataFrame, g: Graph, sr: Semiring | str = "PlusMultiplies") -> DataFrame:
    """w(dst) = ⊕_src u(src) ⊗ A(src,dst) via the per-partition numpy
    kernel — dense-u pull regime only (see module docstring)."""
    return _vecmat_arrow(u, g, sr, "src", "dst")


def mxv_arrow(u: DataFrame, g: Graph, sr: Semiring | str = "PlusMultiplies") -> DataFrame:
    """w(src) = ⊕_dst A(src,dst) ⊗ u(dst) via the kernel (commutative ⊗
    in the supported set, so operand order is immaterial)."""
    return _vecmat_arrow(u, g, sr, "dst", "src")
