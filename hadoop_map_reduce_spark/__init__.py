"""hadoop_map_reduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce project (NikhilNar/hadoop-map-reduce): custom sources
(text lines, ZIP archives), record-level transforms (sanitize / tokenize /
filter / n-gram), keyed shuffle + grouped aggregation, partitioned sorted
text sinks — generalized to the full relational surface (joins, windows,
set ops, scalar functions) and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis).

Architecture is idiomatic Spark: declarative DataFrame/SQL plans optimized
by Catalyst; Python UDFs only where built-ins cannot express the semantics.
"""

from hadoop_map_reduce_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
