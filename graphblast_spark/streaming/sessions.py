"""Gap-based sessionization — batch twin + custom stateful stream.

The canonical "operator the built-in windowed aggs can't express":
group a user's events into sessions separated by inactivity gaps.

- :func:`sessionize_batch` — deterministic batch semantics: per user,
  events ordered by (ts, event_id); a new session starts when the gap
  from the previous event exceeds ``gap``. Pure window expressions
  (lag → boundary flag → running sum = session ordinal), so it is
  ANSI-SQL replayable and serves as the driver-oracle anchor.
- :func:`sessionize_stream` — the streaming version: per-user state in
  ``applyInPandasWithState`` carries the open session across
  micro-batches; sessions CLOSED by a later event are emitted as final.
  The still-open tail session lives in the state store until more
  events (or a timeout policy a production deployment would add)
  close it — exactly the reference between the two is pinned by
  tests/test_streaming.py.

Scale shape: the batch window partitions by user_id — per-user event
counts are small and the shuffle is one exchange on user_id; the
stream's state store is likewise hash-partitioned by user_id with
incremental checkpointing.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_ts timestamp, end_ts timestamp, total_value double"
)
_STATE_SCHEMA = "start_ts timestamp, last_ts timestamp, n long, total double, emitted long"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events → one row per session (closed AND the trailing open one):
    (user_id, session_id, n_events, start_ts, end_ts, total_value)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval comparison, not epoch-cast: works for TIMESTAMP and
    # TIMESTAMP_NTZ alike and is timezone-free by construction
    gap = F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")
    flagged = events.select("user_id", "event_id", "ts", "value").withColumn(
        "new_sess",
        F.when(F.col("ts") - F.lag("ts").over(w) > gap, F.lit(1)).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w) + 1
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization: emits each session once it is CLOSED by
    a later event arriving past the gap. Requires per-user event-time
    order across micro-batches (single source, ordered files) — the
    usual replay discipline for deterministic streaming tests."""
    gap_s = gap_minutes * 60

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start_ts, last_ts, n, total, emitted = state.get
        else:
            start_ts = last_ts = None
            n, total, emitted = 0, 0.0, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                if last_ts is not None and (ts - last_ts).total_seconds() > gap_s:
                    emitted += 1
                    out.append((key[0], emitted, n, start_ts, last_ts, round(total, 6)))
                    start_ts, n, total = ts, 0, 0.0
                if start_ts is None:
                    start_ts = ts
                n += 1
                total += float(val)
                last_ts = ts
        state.update((start_ts, last_ts, n, total, emitted))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_id", "n_events",
                    "start_ts", "end_ts", "total_value",
                ],
            )

    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
