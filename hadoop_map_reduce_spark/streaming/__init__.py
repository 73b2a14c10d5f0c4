"""Structured Streaming surface: the reference's batch pipeline and the
engine's event workloads, re-expressed over unbounded inputs."""

from hadoop_map_reduce_spark.streaming.ops import (
    session_window_stats,
    streaming_bigram_counts,
    streaming_dedup,
    windowed_event_stats,
)

__all__ = [
    "session_window_stats",
    "streaming_bigram_counts",
    "streaming_dedup",
    "windowed_event_stats",
]
