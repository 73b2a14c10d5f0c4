"""Sinks: partitioned text output with reference-layout parity."""

from hadoop_map_reduce_spark.sinks.text_sink import write_kv_text

__all__ = ["write_kv_text"]
