"""Oracle-differential tests for the registered streaming queries: the
streaming plan runs to completion (availableNow) and its materialized
result must equal the batch semantics DuckDB computes."""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

STREAMING = sorted(
    name for name, q in REGISTRY.items() if "streaming" in q.tags
)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_rerun_same_session(spark, sf_dir, name):
    """The driver and verify tool re-invoke queries in one session; the
    memory-sink query name must be reusable after termination."""
    df1 = REGISTRY[name].fn(spark, sf_dir)
    n1 = df1.count()
    df2 = REGISTRY[name].fn(spark, sf_dir)
    assert df2.count() == n1
