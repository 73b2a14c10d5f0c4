"""Sources: text lines and ZIP archives (reference O2/O3 equivalents).

Two ZIP paths with identical row contracts: the RDD composition
(`read_zip_entries`, zero setup) and the registered Python DataSource
(`register_zip_datasource` → ``spark.read.format("zipentries")``, with
planner-level archive pruning and a ZIP writer).
"""

from hadoop_map_reduce_spark.sources.text_source import read_text_lines
from hadoop_map_reduce_spark.sources.zip_datasource import (
    ZipDataSource,
    register_zip_datasource,
)
from hadoop_map_reduce_spark.sources.zip_source import read_zip_entries

__all__ = [
    "ZipDataSource",
    "read_text_lines",
    "read_zip_entries",
    "register_zip_datasource",
]
