"""Physical-plan audit — make the plan an assertable artifact.

The reference's performance knobs are kernel-dispatch bits checked by
eye (spmv.hpp:113-169 template selection); Spark's equivalent is the
physical plan, so the engine treats plan shape as part of its test
surface: joins that must broadcast are asserted broadcast, scans that
must prune columns are asserted pruned, filters that must reach
parquet are asserted pushed. A plan regression (e.g. a future change
reintroducing a sort-merge join into the PageRank superstep) fails CI
instead of shipping a 2× slowdown to the 1000-executor cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The .explain output as a string (what you'd read by eye)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def _physical(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # AQE plans print "== Final Plan ==" followed by "== Initial Plan ==";
    # audit only what actually executed.
    cut = plan.find("== Initial Plan ==")
    return plan[:cut] if cut != -1 else plan


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (each is a full-data
    network/disk round at cluster scale — the thing to minimize)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          _physical(df)))


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in plan order, e.g. ['BroadcastHashJoin',
    'ShuffledHashJoin', 'SortMergeJoin']."""
    return re.findall(
        r"\b(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        _physical(df),
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every file scan in the plan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(f.strip() for f in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — audit column pruning (a scan
    reading all columns for a 2-column projection is a bug)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Executed plans mark codegen stages with ``*(N)`` prefixes (the
    formatted mode spells out WholeStageCodegen) — accept either."""
    plan = _physical(df)
    return "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan) is not None
