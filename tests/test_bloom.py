"""Bloom semi-join: exact parity with the plain semi join, pre-filter
effectiveness (the operator's reason to exist), and contract errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.bloom import (
    bloom_bitmap,
    bloom_semi_join,
)
from hadoop_map_reduce_spark.session import load_table


def test_parity_with_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = sorted(
        map(tuple, bloom_semi_join(li, keys, "l_orderkey").collect())
    )
    want = sorted(map(tuple, li.join(keys, "l_orderkey", "left_semi").collect()))
    assert got == want
    assert want  # the fixture must actually exercise the join


def test_prefilter_drops_most_nonmatches(spark, sf_dir):
    """With a selective key set, the bitmap must reject almost every
    non-matching probe row BEFORE the exact join — measure the candidate
    count the exact join would receive."""
    from hadoop_map_reduce_spark.operators.bloom import _membership_expr

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)  # ~1% of orders
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    n_bits = 1 << 18
    bm = bloom_bitmap(keys, "l_orderkey", n_bits=n_bits, n_hashes=5)
    candidates = (
        li.join(F.broadcast(bm))
        .withColumn("_h1", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_bits)))
        .withColumn(
            "_h2",
            F.pmod(
                F.xxhash64("l_orderkey", F.lit("bloom:h2")), F.lit(n_bits)
            ),
        )
        .filter(F.expr(_membership_expr("_h1", "_h2", "bitmap", n_bits, 5)))
        .count()
    )
    total = li.count()
    matches = li.join(keys, "l_orderkey", "left_semi").count()
    # Candidates = matches + false positives; the FP rate at this
    # load factor is well under 1%, so candidates must sit far below
    # the unfiltered probe count.
    assert matches <= candidates < matches + 0.01 * total + 1


def test_bitmap_is_one_dense_row(spark, sf_dir):
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).limit(100)
    rows = bloom_bitmap(keys, "k", n_bits=1 << 10, n_hashes=3).collect()
    assert len(rows) == 1
    bitmap = rows[0]["bitmap"]
    assert len(bitmap) == (1 << 10) // 64
    assert any(w != 0 for w in bitmap)


def test_integral_type_mismatch_is_healed(spark):
    """xxhash64 is type-sensitive (hashing 7 as int != 7 as long), so a
    probe/build dtype mismatch would silently drop every true match if
    both sides weren't hashed through a common BIGINT (round-6 review
    finding, runtime-confirmed)."""
    big = spark.createDataFrame([(1,), (2,), (3,)], "k: bigint")
    keys = spark.createDataFrame([(1,), (3,)], "k: int")
    got = sorted(r["k"] for r in bloom_semi_join(big, keys, "k").collect())
    assert got == [1, 3]


def test_non_integral_type_mismatch_refuses_loudly(spark):
    big = spark.createDataFrame([("1",)], "k: string")
    keys = spark.createDataFrame([(1,)], "k: int")
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_semi_join(big, keys, "k")


def test_caller_columns_named_like_scratch_survive(spark):
    """Probe-side columns named _h1/_h2/bitmap must pass through
    untouched — scratch names are derived to dodge the caller's schema
    (round-6 review finding, runtime-confirmed)."""
    big = spark.createDataFrame(
        [(1, 10, 20, 30), (2, 11, 21, 31)],
        "k: bigint, _h1: bigint, _h2: bigint, bitmap: bigint",
    )
    keys = spark.createDataFrame([(1,)], "k: bigint")
    rows = bloom_semi_join(big, keys, "k").collect()
    assert sorted(rows[0].asDict().keys()) == ["_h1", "_h2", "bitmap", "k"]
    assert rows[0]["_h1"] == 10 and rows[0]["bitmap"] == 30


def test_n_bits_must_be_word_aligned(spark, sf_dir):
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(keys, "k", n_bits=100)
