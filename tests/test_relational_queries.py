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


def test_salted_join_parity_and_spread(spark, sf_dir):
    """salted_equi_join is row-identical to the plain inner join, and
    the salt actually spreads one key's rows across multiple groups."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.operators.relational import (
        salted_equi_join,
    )
    from hadoop_map_reduce_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = salted_equi_join(li, part, "l_partkey", salts=4,
                              salt_by="l_orderkey")
    plain = li.join(part, "l_partkey")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # The hottest partkey's rows land in >1 salt group (spread works).
    spread = (
        li.withColumn(
            "_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(4))
        )
        .groupBy("l_partkey")
        .agg(F.countDistinct("_salt").alias("ns"), F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .first()
    )
    assert spread.ns > 1
    with pytest.raises(ValueError):
        salted_equi_join(li, part, "l_partkey", salts=0,
                         salt_by="l_orderkey")
    # Omitted or key-valued salt_by gives zero spread — must raise
    # (round-5 ADVICE: the old default silently salted by the join key).
    with pytest.raises(ValueError, match="salt_by"):
        salted_equi_join(li, part, "l_partkey", salts=4)
    with pytest.raises(ValueError, match="salt_by"):
        salted_equi_join(li, part, "l_partkey", salts=4,
                         salt_by="l_partkey")


def test_interval_union_drops_empty_and_inverted_intervals(spark):
    """[5,5) is the empty set (not an island) and an inverted row must
    not feed negative lengths into covered (round-6 review finding,
    runtime-confirmed); a key with only empty intervals is absent."""
    from hadoop_map_reduce_spark.operators.relational import (
        interval_union_length,
    )

    iv = spark.createDataFrame(
        [
            ("a", 0, 3),
            ("a", 5, 5),   # empty: dropped, not an island
            ("a", 10, 12),
            ("a", 9, 2),   # inverted: empty set, dropped
            ("b", 7, 7),   # only-empty key: absent from output
        ],
        ["k", "s", "e"],
    )
    rows = {
        r["k"]: (r["n_islands"], r["covered"])
        for r in interval_union_length(
            iv, key_col="k", start_col="s", end_col="e"
        ).collect()
    }
    assert rows == {"a": (2, 5)}
