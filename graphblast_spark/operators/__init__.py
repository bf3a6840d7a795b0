from graphblast_spark.operators.accum import accum_merge
from graphblast_spark.operators.vecmat import vxm, mxv, apply_vxm
from graphblast_spark.operators.kernel import mxv_arrow, vxm_arrow
from graphblast_spark.operators.ewise import (
    apply_unary,
    count_unique,
    ewise_add,
    ewise_add_matrix,
    ewise_add_scalar,
    ewise_mult,
    ewise_mult_matrix_vector,
    ewise_mult_scalar,
    extract_element,
    extract_matrix_column,
    extract_submatrix,
    extract_subvector,
    set_element,
)
from graphblast_spark.operators.reduce import (
    reduce_matrix_to_scalar,
    reduce_matrix_to_vector,
    reduce_vector_to_scalar,
)
from graphblast_spark.operators.assign import (
    assign_indexed,
    assign_masked_constant,
    assign_scatter,
    extract_gather,
    scatter_constant,
)
from graphblast_spark.operators.spgemm import mxm, mxm_masked, trace_mxm_transpose

__all__ = [
    "accum_merge",
    "vxm", "mxv", "apply_vxm", "vxm_arrow", "mxv_arrow",
    "apply_unary", "ewise_add", "ewise_add_matrix", "ewise_add_scalar",
    "ewise_mult", "ewise_mult_scalar",
    "ewise_mult_matrix_vector", "extract_submatrix", "extract_matrix_column",
    "extract_subvector", "set_element",
    "extract_element", "count_unique",
    "reduce_matrix_to_scalar", "reduce_matrix_to_vector", "reduce_vector_to_scalar",
    "assign_indexed", "assign_masked_constant", "assign_scatter", "extract_gather",
    "scatter_constant",
    "mxm", "mxm_masked", "trace_mxm_transpose",
]
