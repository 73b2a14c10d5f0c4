"""operators/relational.exact_ranks_for: the broadcast count-of-better
rank recovery that lets top-k-then-fuse plans (search_hybrid_rrf) report
EXACT global ranks without a single-partition sort. Differential vs the
row_number window on data with heavy score ties."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.operators.relational import exact_ranks_for


def _scored(spark, parts: int = 7):
    # 200 rows, scores drawn from 10 values -> ~20-way ties, so the
    # id tiebreak carries real weight.
    rows = [(i, (i * 37) % 10) for i in range(200)]
    return spark.createDataFrame(rows, "id long, score long").repartition(
        parts
    )


def test_matches_window_row_number(spark):
    scored = _scored(spark)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    expected = {
        r.id: r.rk
        for r in scored.select(
            "id", F.row_number().over(w).cast("long").alias("rk")
        ).collect()
    }
    cands = spark.createDataFrame(
        [(i,) for i in (0, 1, 7, 42, 137, 199)], "id long"
    )
    got = {
        r.id: r.rk
        for r in exact_ranks_for(scored, cands, "score", "id", "rk").collect()
    }
    assert got == {i: expected[i] for i in (0, 1, 7, 42, 137, 199)}


def test_absent_candidates_omitted(spark):
    scored = _scored(spark)
    cands = spark.createDataFrame([(5,), (100_000,)], "id long")
    got = exact_ranks_for(scored, cands, "score", "id", "rk").collect()
    assert {r.id for r in got} == {5}


def test_rank_one_and_last(spark):
    scored = _scored(spark)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    ranked = scored.select(
        "id", F.row_number().over(w).cast("long").alias("rk")
    )
    first = ranked.filter(F.col("rk") == 1).collect()[0]
    last = ranked.filter(F.col("rk") == 200).collect()[0]
    cands = spark.createDataFrame([(first.id,), (last.id,)], "id long")
    got = {
        r.id: r.rk
        for r in exact_ranks_for(scored, cands, "score", "id", "rk").collect()
    }
    assert got == {first.id: 1, last.id: 200}


def test_no_single_partition_exchange(spark):
    from hadoop_map_reduce_spark.plancheck import (
        unbounded_single_partition_exchanges,
    )

    scored = _scored(spark)
    cands = spark.createDataFrame([(5,), (9,)], "id long")
    out = exact_ranks_for(scored, cands, "score", "id", "rk")
    out.collect()
    assert unbounded_single_partition_exchanges(out) == []
