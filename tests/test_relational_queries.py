"""Oracle-differential tests for the generalized relational surface (M4)."""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

RELATIONAL = sorted(
    name for name, q in REGISTRY.items() if "relational" in q.tags
)


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)
