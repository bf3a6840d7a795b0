from graphblast_spark.operators.vecmat import vxm, mxv
from graphblast_spark.operators.ewise import (
    apply_unary,
    ewise_add,
    ewise_add_scalar,
    ewise_mult,
    ewise_mult_scalar,
)
from graphblast_spark.operators.reduce import (
    reduce_matrix_to_scalar,
    reduce_matrix_to_vector,
    reduce_vector_to_scalar,
)
from graphblast_spark.operators.assign import (
    assign_masked_constant,
    assign_scatter,
    extract_gather,
    scatter_constant,
)
from graphblast_spark.operators.spgemm import mxm_masked, trace_mxm_transpose

__all__ = [
    "vxm", "mxv",
    "apply_unary", "ewise_add", "ewise_add_scalar", "ewise_mult", "ewise_mult_scalar",
    "reduce_matrix_to_scalar", "reduce_matrix_to_vector", "reduce_vector_to_scalar",
    "assign_masked_constant", "assign_scatter", "extract_gather", "scatter_constant",
    "mxm_masked", "trace_mxm_transpose",
]
