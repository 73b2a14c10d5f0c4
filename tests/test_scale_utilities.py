"""Skew salting and bucketing: result parity + the plans they exist for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.skew import salted_join, two_phase_agg
from hadoop_map_reduce_spark.storage import read_table, write_bucketed


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on one hot key.
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(100).select(
        F.col("id").alias("k2"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    plain = skewed.join(dim, skewed.k == dim.k2).select("k", "v", "name")
    salted = salted_join(skewed, dim, "k", "k2", salt=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_two_phase_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.cnt, r.total)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    two = {(r.k): (r.cnt, r.total) for r in two_phase_agg(skewed, "k", "v").collect()}
    assert plain == two


def test_bucketed_join_is_shuffle_free(spark):
    import shutil

    # Clear any orphaned location from a previous session: the in-memory
    # catalog forgets tables across sessions but the warehouse dir remains.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_bleft", "t_bright"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bleft", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(right, "t_bright", ["k"], num_buckets=8, sort_cols=["k"])

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_bleft").join(
            read_table(spark, "t_bright"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Co-located buckets: the join runs with NO shuffle on either side.
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
