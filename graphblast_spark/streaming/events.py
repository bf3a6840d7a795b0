"""Windowed event analytics — watermark + tumbling-window aggregation.

Stream side and batch side are the SAME logical aggregation, so
correctness is batch/stream parity (run the stream with
``availableNow`` and compare). At scale: the shuffle keys are
(window, event_type) — low cardinality, so the stateful agg's state
store stays tiny; late events beyond the watermark are dropped
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over an events-shaped parquet directory."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _window_agg(events: DataFrame, window: str) -> DataFrame:
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value", "approx_users",
        )
    )


def windowed_event_stats(
    events_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming: tumbling-window stats with a watermark bounding state
    and dropping late data."""
    return _window_agg(events_stream.withWatermark("ts", watermark), window)


def windowed_event_stats_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin (no watermark semantics — batch sees everything)."""
    return _window_agg(events, window)
