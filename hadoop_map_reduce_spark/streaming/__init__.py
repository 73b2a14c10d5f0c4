"""Structured Streaming surface: the reference's batch pipeline and the
engine's event workloads, re-expressed over unbounded inputs."""

from hadoop_map_reduce_spark.streaming.ops import (
    session_window_stats,
    stream_stream_interval_join,
    streaming_bigram_counts,
    streaming_dedup,
    windowed_event_stats,
)
from hadoop_map_reduce_spark.streaming.stateful import running_user_stats

__all__ = [
    "running_user_stats",
    "session_window_stats",
    "stream_stream_interval_join",
    "streaming_bigram_counts",
    "streaming_dedup",
    "windowed_event_stats",
]
