"""graphblast_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the GraphBLAS operation set of gunrock/graphblast (the
reference at /root/reference) as DataFrame transforms over two tables:

- ``edges(src: long, dst: long, val: double)`` — the Matrix (both
  orientations are served by choosing the join key; no physical
  transpose, cf. reference backend/cuda/operations.hpp:107).
- ``v(id: long, val: <T>)`` — every Vector; *dense* means one row per
  vertex, *sparse* means only the frontier rows (same schema, cf.
  reference backend/cuda/vector.hpp:25-84).

Operations are parameterized by semirings (see :mod:`.semiring`,
mirroring reference stddef.hpp:142-213) and an execution descriptor
(:mod:`.descriptor`, mirroring reference graphblas/descriptor.hpp).
"""

from graphblast_spark.descriptor import Descriptor
from graphblast_spark.matrix import Graph
from graphblast_spark.semiring import SEMIRINGS, Semiring
from graphblast_spark.session import get_spark

__all__ = ["Descriptor", "Graph", "SEMIRINGS", "Semiring", "get_spark"]

__version__ = "0.1.0"
