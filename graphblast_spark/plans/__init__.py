from graphblast_spark.plans.audit import (
    count_exchanges,
    explain_str,
    has_whole_stage_codegen,
    join_strategies,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_whole_stage_codegen",
    "join_strategies",
    "pushed_filters",
    "read_schemas",
]
