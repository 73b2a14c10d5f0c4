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


def test_bulk_random_matches_pandas_all_directions(spark):
    """Seeded adversarial bulk check: 200 keys, duplicate timestamps,
    keys missing from either side, single-row groups — every direction
    must agree with pandas merge_asof row-for-row in one pass."""
    import numpy as np

    rng = np.random.RandomState(0)
    left_rows = [
        (int(k), int(t), i)
        for i, (k, t) in enumerate(
            zip(rng.randint(0, 200, 1500), rng.randint(0, 5000, 1500))
        )
    ]
    right_rows = [
        (int(k), int(t), j)
        for j, (k, t) in enumerate(
            zip(rng.randint(0, 220, 1200), rng.randint(0, 5000, 1200))
        )
    ]
    left = spark.createDataFrame(left_rows, ["k", "t", "lid"]).selectExpr(
        "k", "timestamp_seconds(t) as t", "lid"
    )
    right = spark.createDataFrame(
        right_rows, ["k", "rt", "payload"]
    ).selectExpr("k", "timestamp_seconds(rt) as rt", "payload")

    lp = left.toPandas().sort_values(["t", "lid"]).reset_index(drop=True)
    rp = right.toPandas().sort_values(["rt", "payload"]).reset_index(drop=True)

    for direction, op in [
        ("backward", asof_join_backward),
        ("forward", asof_join_forward),
        ("nearest", asof_join_nearest),
    ]:
        got = {
            r.lid: r.payload
            for r in op(
                left, right, on="k", left_time="t", right_time="rt",
                payload_cols=["payload"],
            ).collect()
        }
        # pandas tie-break among equal-time right rows is positional, so
        # pre-collapse each (k, rt) group to the row the engine's
        # deterministic rule picks: greatest payload for backward,
        # smallest for forward; nearest inherits per side.
        rp_back = (
            rp.groupby(["k", "rt"], as_index=False).last()
        )  # sorted by payload asc -> last = greatest
        rp_fwd = rp.groupby(["k", "rt"], as_index=False).first()
        ref = pd.merge_asof(
            lp,
            (rp_back if direction == "backward" else rp_fwd).rename(
                columns={"rt": "t"}
            ).sort_values("t"),
            on="t",
            by="k",
            direction=direction,
        )
        want = {
            r.lid: (None if pd.isna(r.payload) else int(r.payload))
            for r in ref.itertuples()
        }
        if direction == "nearest":
            # nearest with equal-time dup collapse differs per side; only
            # compare where both collapses agree (non-tied matches).
            ref2 = pd.merge_asof(
                lp,
                rp_back.rename(columns={"rt": "t"}).sort_values("t"),
                on="t",
                by="k",
                direction="nearest",
            )
            want2 = {
                r.lid: (None if pd.isna(r.payload) else int(r.payload))
                for r in ref2.itertuples()
            }
            agreed = {k: v for k, v in want.items() if want2.get(k) == v}
            assert sum(1 for k, v in agreed.items() if got.get(k) == v) == len(
                agreed
            )
        else:
            assert got == want
