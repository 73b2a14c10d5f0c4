"""Forward / nearest as-of joins: pandas ``merge_asof`` differential
(the industry-reference implementation of the semantics) plus plan-shape
pins — both directions must stay one hash exchange, no nested loops.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hadoop_map_reduce_spark.operators.relational import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)
from hadoop_map_reduce_spark.plans import REGISTRY


def _frames(spark):
    """Keyed quote/trade-style frames with every edge: no backward
    candidate, no forward candidate, exact-time tie, equidistant pair,
    key with no right rows at all."""
    left = spark.createDataFrame(
        [
            (1, 10, "a"),  # before any right row for key 1
            (1, 20, "b"),  # exactly on a right row
            (1, 27, "c"),  # equidistant between 24 and 30 -> backward
            (1, 95, "d"),  # after the last right row
            (2, 50, "e"),  # key with no right rows
        ],
        ["k", "t", "tag"],
    ).selectExpr("k", "timestamp_seconds(t) as t", "tag")
    right = spark.createDataFrame(
        [(1, 20, 100), (1, 24, 101), (1, 30, 102), (1, 90, 103)],
        ["k", "rt", "payload"],
    ).selectExpr("k", "timestamp_seconds(rt) as rt", "payload")
    return left, right


def _pandas_asof(left, right, direction):
    lp = left.toPandas().sort_values("t").reset_index(drop=True)
    rp = right.toPandas().sort_values("rt").reset_index(drop=True)
    out = pd.merge_asof(
        lp,
        rp.rename(columns={"rt": "t"}),
        on="t",
        by="k",
        direction=direction,
    )
    return sorted(
        (r.k, r.t.isoformat(), r.tag, None if pd.isna(r.payload) else int(r.payload))
        for r in out.itertuples()
    )


@pytest.mark.parametrize(
    "direction,op",
    [
        ("backward", asof_join_backward),
        ("forward", asof_join_forward),
        ("nearest", asof_join_nearest),
    ],
)
def test_matches_pandas_merge_asof(spark, direction, op):
    left, right = _frames(spark)
    got = op(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        payload_cols=["payload"],
    )
    rows = sorted(
        (r.k, r.t.isoformat(), r.tag, r.payload) for r in got.collect()
    )
    assert rows == _pandas_asof(left, right, direction)


def test_forward_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    got = asof_join_forward(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        payload_cols=["payload"],
        tolerance="INTERVAL 5 SECOND",
    )
    by_tag = {r.tag: r.payload for r in got.collect()}
    # t=10 -> nearest forward right is 20 (distance 10 > 5) -> nulled
    assert by_tag["a"] is None
    # t=20 -> match at 20 (distance 0) survives
    assert by_tag["b"] == 100
    # t=27 -> forward match 30 (distance 3 <= 5) survives
    assert by_tag["c"] == 102


def test_forward_tie_takes_smallest_payload(spark):
    left = spark.createDataFrame([(1, 10)], ["k", "t"]).selectExpr(
        "k", "timestamp_seconds(t) as t"
    )
    right = spark.createDataFrame(
        [(1, 15, 9), (1, 15, 3)], ["k", "rt", "payload"]
    ).selectExpr("k", "timestamp_seconds(rt) as rt", "payload")
    got = asof_join_forward(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["payload"],
    ).collect()
    assert got[0].payload == 3  # mirror of backward's greatest-wins


@pytest.mark.parametrize("name", ["join_asof_fwd", "join_asof_nearest"])
def test_single_exchange_no_nested_loop(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    if name == "join_asof_nearest":
        # both directional carries share the one exchange: two Window
        # operators, two in-partition sorts, zero extra shuffles.
        assert plan.count("Window") == 2
