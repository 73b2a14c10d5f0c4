"""Semantic invariants for the session-7 batch-8 queries, beyond the
oracle hash-match: SCD2 interval laws, transition-matrix row sums, and
TWAP bounds."""

from __future__ import annotations

from collections import defaultdict

from hadoop_map_reduce_spark.plans import REGISTRY


def test_scd2_intervals_partition_orders(spark, sf_dir):
    from hadoop_map_reduce_spark.session import load_table

    rows = REGISTRY["scd2_status_history"].fn(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    # Conservation: run lengths sum to the order count.
    assert sum(r["n_orders"] for r in rows) == n_orders

    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    for cust, runs in by_cust.items():
        runs.sort(key=lambda r: r["valid_from"])
        # Exactly one open interval per customer, and it is the last.
        open_runs = [r for r in runs if r["valid_to"] is None]
        assert len(open_runs) == 1 and runs[-1]["valid_to"] is None, cust
        for a, b in zip(runs, runs[1:]):
            # Chained intervals: each run ends where the next begins.
            assert a["valid_to"] == b["valid_from"], cust
            # Runs are maximal: adjacent runs never share a status.
            assert a["o_orderstatus"] != b["o_orderstatus"], cust


def test_transition_probs_rows_sum_to_one(spark, sf_dir):
    rows = REGISTRY["events_transition_probs"].fn(spark, sf_dir).collect()
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_type"]].append(r)
    for prev, outs in by_prev.items():
        total = sum(r["n"] for r in outs)
        # floor-scaled ppm row sums land in (1e6 - n_cells, 1e6].
        ppm = sum(r["prob_ppm"] for r in outs)
        assert 1_000_000 - len(outs) < ppm <= 1_000_000, prev
        assert all(0 < r["n"] <= total for r in outs)


def test_twap_within_value_bounds(spark, sf_dir):
    """A duration-weighted mean can never leave the min/max envelope of
    the user's per-span values."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.session import load_table

    twap = {
        r["user_id"]: r["twap_c_ppm"]
        for r in REGISTRY["timeseries_twap"].fn(spark, sf_dir).collect()
    }
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("value_c"),
        )
        .groupBy("user_id")
        .agg(F.min("value_c").alias("lo"), F.max("value_c").alias("hi"))
        .collect()
    }
    assert twap and set(twap) <= set(bounds)
    for user, ppm in twap.items():
        lo, hi = bounds[user]
        assert lo * 1_000_000 - 1 <= ppm <= hi * 1_000_000, user
