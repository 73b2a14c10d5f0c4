"""Skyline operator: brute-force differential, partition invariance,
duplicate semantics, and plan shape (no join, no full-input shuffle)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.skyline import skyline


def _brute_frontier(M: np.ndarray) -> set[int]:
    """O(n²) reference dominance check (min-normalized matrix)."""
    keep = set()
    n = len(M)
    for i in range(n):
        dominated = False
        for j in range(n):
            if i != j and np.all(M[j] <= M[i]) and np.any(M[j] < M[i]):
                dominated = True
                break
        if not dominated:
            keep.add(i)
    return keep


def _make_df(spark, n: int, d: int, seed: int, parts: int):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 40, size=(n, d))
    rows = [
        (int(i), *[float(v) for v in vals[i]]) for i in range(n)
    ]
    cols = ["id"] + [f"x{k}" for k in range(d)]
    return spark.createDataFrame(rows, cols).repartition(parts), vals


@pytest.mark.parametrize("n,d,parts,seed", [
    (300, 2, 7, 0),
    (300, 3, 4, 1),
    (500, 2, 1, 2),
])
def test_matches_brute_force(spark, n, d, parts, seed):
    df, vals = _make_df(spark, n, d, seed, parts)
    dims = [(f"x{k}", "min" if k % 2 == 0 else "max") for k in range(d)]
    signs = np.array([1.0 if dr == "min" else -1.0 for _, dr in dims])
    expected = _brute_frontier(vals.astype(np.float64) * signs)
    got = {r["id"] for r in skyline(df, dims).collect()}
    assert got == expected


def test_partition_invariance(spark):
    df1, _ = _make_df(spark, 400, 2, 3, 1)
    df9, _ = _make_df(spark, 400, 2, 3, 9)
    dims = [("x0", "min"), ("x1", "max")]
    r1 = sorted(r["id"] for r in skyline(df1, dims).collect())
    r9 = sorted(r["id"] for r in skyline(df9, dims).collect())
    assert r1 == r9


def test_duplicates_all_kept(spark):
    # Equal points never dominate each other: every copy survives.
    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 1.0, 5.0), (3, 2.0, 6.0)], ["id", "x0", "x1"]
    ).repartition(3)
    got = {r["id"] for r in skyline(df, [("x0", "min"), ("x1", "min")]).collect()}
    assert got == {1, 2}


def test_passthrough_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, 5.0), (2, "b", 3.0, 1.0)], ["id", "tag", "x0", "x1"]
    )
    out = skyline(df, [("x0", "min"), ("x1", "min")])
    assert out.columns == ["id", "tag", "x0", "x1"]
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows == {1: "a", 2: "b"}


def test_plan_has_no_join_and_no_full_shuffle(spark, sf_dir):
    from hadoop_map_reduce_spark.plans import REGISTRY

    df = REGISTRY["skyline_parts"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # The merge phase is a coalesce (no exchange of the full input);
    # the only repartitioning allowed is the single-partition merge.
    assert "Exchange hashpartitioning" not in plan, plan


def test_bad_dims_raise(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "x0"])
    with pytest.raises(ValueError):
        skyline(df, [])
    with pytest.raises(ValueError):
        skyline(df, [("nope", "min")])


def test_int64_dims_above_2e53_stay_exact(spark):
    """Integral dims use an int64 dominance matrix: values above 2^53
    that differ by 1 must not collapse to the same double (which would
    fabricate a domination and drop a frontier row)."""
    base = 1 << 60
    rows = [
        (1, base + 1, base),      # incomparable with row 2 exactly,
        (2, base, base + 1),      # but equal after float64 rounding
        (3, base + 2, base + 2),  # dominated by neither? no: dominated by both
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r.id for r in skyline(df, [("a", "min"), ("b", "min")]).collect()}
    assert got == {1, 2}


def test_null_int_dims_fall_back_to_sql_semantics(spark):
    """An integral dim with NULLs arrives as float64+NaN: NaN rows are
    neither dominated nor dominating (SQL NOT EXISTS three-valued
    logic), and exact rows still resolve."""
    rows = [(1, 5, 5), (2, 6, 6), (3, None, 1)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r.id for r in skyline(df, [("a", "min"), ("b", "min")]).collect()}
    assert got == {1, 3}


@pytest.mark.parametrize("n,d,parts,seed", [
    (300, 2, 7, 0),
    (300, 3, 4, 1),
    (500, 2, 1, 2),
])
def test_grid_matches_brute_force(spark, n, d, parts, seed):
    from hadoop_map_reduce_spark.operators.skyline import skyline_grid

    df, vals = _make_df(spark, n, d, seed, parts)
    dims = [(f"x{k}", "min" if k % 2 == 0 else "max") for k in range(d)]
    signs = np.array([1.0 if dr == "min" else -1.0 for _, dr in dims])
    expected = _brute_frontier(vals.astype(np.float64) * signs)
    got = {r["id"] for r in skyline_grid(df, dims, grid_partitions=5).collect()}
    assert got == expected


def test_grid_anti_correlated_frontier(spark):
    """The regime the grid variant exists for: x1 = C - x0 puts EVERY
    point on the frontier (perfect anti-correlation). The parallel
    verify must keep all of them and agree with the plain operator."""
    from hadoop_map_reduce_spark.operators.skyline import skyline_grid

    n = 2000
    rows = [(i, float(i), float(n - i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "x0", "x1"]).repartition(8)
    dims = [("x0", "min"), ("x1", "min")]
    got = skyline_grid(df, dims, grid_partitions=8).count()
    assert got == n
    plain = skyline(df, dims).count()
    assert plain == n


def test_grid_candidate_ceiling_enforced(spark):
    """Beyond max_candidate_rows the broadcast verify must refuse (with
    routing guidance), not melt the driver."""
    from hadoop_map_reduce_spark.operators.skyline import skyline_grid

    n = 500
    rows = [(i, float(i), float(n - i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "x0", "x1"])
    with pytest.raises(ValueError, match="ceiling"):
        skyline_grid(
            df, [("x0", "min"), ("x1", "min")], max_candidate_rows=100
        )


def test_grid_duplicates_and_passthrough(spark):
    from hadoop_map_reduce_spark.operators.skyline import skyline_grid

    df = spark.createDataFrame(
        [(1, "a", 1.0, 5.0), (2, "b", 1.0, 5.0), (3, "c", 2.0, 6.0)],
        ["id", "tag", "x0", "x1"],
    ).repartition(3)
    out = skyline_grid(df, [("x0", "min"), ("x1", "min")])
    assert out.columns == ["id", "tag", "x0", "x1"]
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows == {1: "a", 2: "b"}
