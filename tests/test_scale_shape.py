"""The BASELINE.md scale-shape gate: reduce a >=10.5M-instance /
>=1.27M-distinct-key bigram workload through ONE shuffle into 32 sorted
partitions with no driver-side materialization (matching the reference's
committed bigram_custom8 run: 10,546,595 instances, 1,274,937 keys).

The corpus is manufactured ON THE EXECUTORS from the reference's own
sample (zuni.txt): each line is replicated R times via explode (no driver
loop, no collected data); half the replicas suffix every token with the
replica id, multiplying the distinct-bigram space past the golden run's
cardinality while keeping per-line window semantics intact.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.bigram import bigram_counts
from hadoop_map_reduce_spark.sinks import write_kv_text
from hadoop_map_reduce_spark.sources import read_text_lines

ZUNI = Path("/root/reference/src/main/resources/sample/zuni.txt")
REPLICAS = 20


@pytest.mark.skipif(not ZUNI.exists(), reason="reference fixture missing")
def test_reference_scale_bigram_workload(spark, tmp_path):
    lines = read_text_lines(spark, str(ZUNI))
    replicated = lines.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("rep"),
    )
    # Every replica but the first suffixes its tokens with the replica id
    # — a disjoint bigram keyspace per replica (executor-side transform).
    corpus = replicated.select(
        F.when(F.col("rep") == 0, F.col("value"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("value"), r"\s+"),
                    lambda t: F.concat(t, F.lit("qq"), F.col("rep").cast("string")),
                ),
                " ",
            )
        )
        .alias("text")
    )

    counts = bigram_counts(corpus)

    # ONE shuffle for the count: assert on the plan before executing.
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan

    out = tmp_path / "scale_out"
    write_kv_text(
        counts, str(out), "bigram", "cnt", num_partitions=32, sort_within=True
    )

    parts = sorted(out.glob("part-*"))
    assert len(parts) == 32
    assert (out / "_SUCCESS").exists()

    distinct_keys = 0
    total_instances = 0
    for p in parts:
        prev = None
        with p.open(encoding="utf-8") as f:
            for line in f:
                k, v = line.rstrip("\n").split("\t")
                assert prev is None or k >= prev  # sorted within partition
                prev = k
                distinct_keys += 1
                total_instances += int(v)

    # The golden run's scale: 10,546,595 instances / 1,274,937 keys.
    assert total_instances >= 10_500_000, total_instances
    assert distinct_keys >= 1_270_000, distinct_keys
