"""Query registry: every operator the engine claims ships here as a named
query with (where SQL-expressible) a DuckDB oracle. Importing this package
populates the registry."""

from hadoop_map_reduce_spark.plans.registry import REGISTRY, Query, register

# Import for registration side effects.
from hadoop_map_reduce_spark.plans import reference_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import llm_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import subquery_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import stats_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import pipeline_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries2  # noqa: F401
from hadoop_map_reduce_spark.plans import subquery_queries2  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries3  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries4  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries5  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries6  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries7  # noqa: F401
from hadoop_map_reduce_spark.plans import llm_queries2  # noqa: F401
from hadoop_map_reduce_spark.plans import streaming_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import llm_queries3  # noqa: F401
from hadoop_map_reduce_spark.plans import udtf_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import curation_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import sketch_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import graph_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import timeseries_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import ml_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import dq_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import layout_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries8  # noqa: F401
from hadoop_map_reduce_spark.plans import llm_queries4  # noqa: F401
from hadoop_map_reduce_spark.plans import llm_queries5  # noqa: F401
from hadoop_map_reduce_spark.plans import companion_queries  # noqa: F401
from hadoop_map_reduce_spark.plans import relational_queries9  # noqa: F401

__all__ = ["REGISTRY", "Query", "register"]
