"""Custom stateful streaming operator — applyInPandasWithState.

Per-user running aggregates that survive across micro-batches (the
"custom stateful operator" slot the built-in windowed aggs can't
express: arbitrary per-key state transition in vectorized pandas).
State per user_id: (n_events, total_value, last_ts). At scale the
state store is keyed by user_id — hash-partitioned, incremental
checkpointed by Spark's state store; the transition function is
Arrow-batched pandas, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`running_user_stats`'s FINAL state: per-user
    totals after every event is processed — what the stateful stream
    converges to when the source drains. SQL-expressible, so it anchors
    the stateful operator to the driver's DuckDB oracle (the stream
    itself is checked for parity against this in test_streaming)."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running (count, sum, last_ts), emitted
    every micro-batch the user appears in."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
