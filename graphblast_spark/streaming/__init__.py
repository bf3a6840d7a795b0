"""Structured-Streaming surface.

The reference is batch-only (no watermarks/windows/stateful operators
anywhere in /root/reference — SURVEY §2.10); this package is the
engine's forward extension for the web-scale ingestion story: pages
arrive continuously, edges are distilled incrementally, and windowed
event analytics run with late-data handling. Batch/stream parity is
tested by running every streaming query with
``trigger(availableNow=True)`` and comparing against the equivalent
batch DataFrame op.
"""

from graphblast_spark.streaming.events import (
    stream_events,
    windowed_event_stats,
    windowed_event_stats_batch,
)
from graphblast_spark.streaming.dedup import dedup_gate_batch, streaming_dedup_gate
from graphblast_spark.streaming.ingest import edge_log_graph, stream_pages, streaming_distill
from graphblast_spark.streaming.sessions import sessionize_batch, sessionize_stream
from graphblast_spark.streaming.state import running_user_stats, running_user_stats_batch

__all__ = [
    "stream_events",
    "windowed_event_stats",
    "windowed_event_stats_batch",
    "edge_log_graph",
    "stream_pages",
    "streaming_distill",
    "dedup_gate_batch",
    "streaming_dedup_gate",
    "running_user_stats",
    "running_user_stats_batch",
    "sessionize_batch",
    "sessionize_stream",
]
