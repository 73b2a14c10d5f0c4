"""Layout query batch (`plans/layout_queries.py`): oracle differential,
a pure-Python Morton recomputation, and the locality property that is
the entire point of z-ordering."""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

LAYOUT = sorted(n for n, q in REGISTRY.items() if "layout" in q.tags)


@pytest.mark.parametrize("name", LAYOUT)
def test_oracle_match(spark, oracle_sf_dir, name):
    compare_query(spark, oracle_sf_dir, name)


def test_zorder_key_matches_pure_python(spark):
    """Spark bit-interleave == reference Python implementation on a
    grid of inputs including the 8-bit corners."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.plans.layout_queries import zorder_key

    def morton(x: int, y: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in (0, 1, 2, 3, 85, 170, 254, 255)
           for y in (0, 1, 2, 3, 85, 170, 254, 255)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert r.z == morton(r.x, r.y), (r.x, r.y)


def test_zorder_clusters_are_tight_rectangles(spark, oracle_sf_dir):
    """Cutting a 16-bit z-range into 64 clusters (10 z-bits each) bounds
    every cluster's bounding box at 32x32 buckets (5 bits per dim) —
    the min/max-stats tightness that makes both dimensions prunable."""
    rows = REGISTRY["layout_zorder_clusters"].fn(
        spark, oracle_sf_dir
    ).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.max_day - r.min_day < 32, r
        assert r.max_price - r.min_price < 32, r


def test_triangle_participation_divisible_by_3(spark, oracle_sf_dir):
    """Every triangle contributes exactly one participation count to
    each of its three vertices."""
    rows = REGISTRY["graph_triangles"].fn(spark, oracle_sf_dir).collect()
    total = sum(r.n_triangles for r in rows)
    assert total > 0 and total % 3 == 0
