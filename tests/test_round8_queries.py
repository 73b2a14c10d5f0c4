"""Round-8 additions: oracle differentials plus the semantic pins the
oracle can't express (ADVICE-r7 contracts, sink manifests, hybrid
triangle reconciliation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query


def test_cluster_retention_keeps_unscored_members(spark):
    """ADVICE r7 #2 contract: members missing a quality row are kept in
    the output and rank after every scored member; an all-unscored
    cluster still emits exactly one keep row (lowest id)."""
    from hadoop_map_reduce_spark.operators.clustering import (
        cluster_retention,
    )

    reps = spark.createDataFrame(
        [
            # cluster 1: ids 1 (scored), 2 (unscored), 3 (scored, best)
            (1, 1),
            (2, 1),
            (3, 1),
            # cluster 10: every member unscored
            (10, 10),
            (11, 10),
        ],
        "doc_id INT, representative INT",
    )
    quality = spark.createDataFrame(
        [(1, 5), (3, 9)], "doc_id INT, quality INT"
    )
    rows = {
        r["doc_id"]: r
        for r in cluster_retention(reps, quality).collect()
    }
    assert set(rows) == {1, 2, 3, 10, 11}, "unscored members dropped"
    assert rows[3]["action"] == "keep"
    assert rows[1]["action"] == "remove"
    assert rows[2]["action"] == "remove"  # unscored ranks last
    assert all(rows[i]["kept_id"] == 3 for i in (1, 2, 3))
    # all-unscored cluster: one keep row, lowest id wins
    assert rows[10]["action"] == "keep"
    assert rows[11]["action"] == "remove"
    assert rows[11]["kept_id"] == 10
