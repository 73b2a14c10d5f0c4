"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hadoop_map_reduce_spark`` package; this
module is a thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_map_reduce_spark.plans import REGISTRY  # noqa: E402
from hadoop_map_reduce_spark.plans.verification import (  # noqa: E402
    verification_order,
)
from hadoop_map_reduce_spark.session import ensure_worker_imports  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _with_worker_imports(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """The driver supplies its own SparkSession (any CWD): ship this
    package to executor workers before building plans that pickle
    module-referencing functions (pandas UDFs, RDD partitioners)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_worker_imports(spark)
    return REGISTRY["bigram_count"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so that queries without a conclusive driver verdict come
    first: the driver verifies a bounded prefix per round, and already
    green queries stay covered by the local oracle tests.
    """
    return {
        name: _with_worker_imports(REGISTRY[name].fn)
        for name in verification_order(list(REGISTRY))
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {
        name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None
    }
