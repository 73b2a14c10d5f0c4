"""Approximate aggregates and sampling: accuracy bounds vs exact results
(approx values are engine-specific, so these are test-pinned rather than
oracle-pinned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.session import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_percentile_approx_brackets_exact(spark):
    orders = load_table(spark, SF, "orders")
    exact = orders.select(
        F.percentile("o_totalprice", F.lit(0.5))
    ).collect()[0][0]
    approx = orders.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    # With accuracy=10000 on 15k rows the approx median lands within 1%.
    assert abs(approx - exact) / exact < 0.01


def test_stratified_sample_fractions(spark):
    events = load_table(spark, SF, "events")
    fractions = {"click": 0.5, "view": 0.1, "error": 1.0}
    sampled = events.sampleBy("event_type", fractions, seed=42)
    got = {
        r["event_type"]: r["cnt"]
        for r in sampled.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    base = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert set(got) <= set(fractions)  # unlisted strata dropped entirely
    assert got["error"] == base["error"]  # fraction 1.0 keeps everything
    for k in ("click", "view"):
        expected = fractions[k] * base[k]
        assert abs(got[k] - expected) / expected < 0.25  # Bernoulli tolerance


def test_tablesample_deterministic_with_seed(spark):
    li = load_table(spark, SF, "lineitem")
    a = li.sample(fraction=0.1, seed=7).count()
    b = li.sample(fraction=0.1, seed=7).count()
    assert a == b  # same seed + same partitioning -> same sample
    assert abs(a - 6000) / 6000 < 0.2
