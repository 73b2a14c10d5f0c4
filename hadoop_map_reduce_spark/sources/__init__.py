"""Sources: text lines and ZIP archives (reference O2/O3 equivalents)."""

from hadoop_map_reduce_spark.sources.text_source import read_text_lines
from hadoop_map_reduce_spark.sources.zip_source import read_zip_entries

__all__ = ["read_text_lines", "read_zip_entries"]
