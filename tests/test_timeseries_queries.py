"""Oracle-differential tests for the time-series/sampling batch, plus
shape assertions the oracle can't see (gap rows really are gaps)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

TIMESERIES = sorted(
    name
    for name, q in REGISTRY.items()
    if ("timeseries" in q.tags or "sampling" in q.tags) and q.oracle
)


@pytest.mark.parametrize("name", TIMESERIES)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_gapfill_spine_is_contiguous(spark, sf_dir):
    df = REGISTRY["events_gapfill"].fn(spark, sf_dir).orderBy("hour")
    rows = df.collect()
    assert len(rows) >= 2
    deltas = {
        (b["hour"] - a["hour"]).total_seconds()
        for a, b in zip(rows, rows[1:])
    }
    assert deltas == {3600.0}, f"spine not hourly-contiguous: {sorted(deltas)}"
    # Zero-filled rows carry exact zeros, not nulls.
    zero = [r for r in rows if r["n_events"] == 0]
    assert all(r["total_value"] == 0.0 for r in zero)


def test_funnel_is_monotone(spark, sf_dir):
    rows = {
        r["stage"]: r["n_users"]
        for r in REGISTRY["events_funnel"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"stage1_view", "stage2_click", "stage3_purchase"}
    assert rows["stage1_view"] >= rows["stage2_click"] >= rows["stage3_purchase"]
    assert rows["stage1_view"] > 0


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    """Every user is active on their own cohort day, so the day_offset=0
    row of each cohort must count exactly the cohort's members."""
    from hadoop_map_reduce_spark.session import load_table

    ret = REGISTRY["events_retention"].fn(spark, sf_dir)
    day0 = {
        r["cohort_day"]: r["n_users"]
        for r in ret.filter(F.col("day_offset") == 0).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert day0 == {r["cohort_day"]: r["n"] for r in cohorts}


def test_quota_sample_caps_every_stratum(spark, sf_dir):
    rows = REGISTRY["sample_stratified_quota"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["n_docs"] <= 40 for r in rows)


def test_locf_segmented_bit_identical_to_plain(spark, sf_dir):
    """The segmented prefix-scan twin must reproduce events_locf
    byte-for-byte — values are moved through the stitch, never
    recomputed."""
    from hadoop_map_reduce_spark.plans import REGISTRY

    a = REGISTRY["events_locf"].fn(spark, sf_dir).collect()
    b = REGISTRY["events_locf_segmented"].fn(spark, sf_dir).collect()
    assert sorted(map(repr, map(tuple, a))) == sorted(
        map(repr, map(tuple, b))
    )
    assert len(a) > 0


def test_locf_segmented_stitches_across_empty_segments(spark, tmp_path):
    """Crafted series: observations in week 0 and week 3 with weeks 1-2
    entirely silent — the carry into weeks 1-3 must cross TWO empty
    segments (the case the segment-summary window's ignorenulls walk
    exists for), and interpolation must bridge the same gap."""
    import datetime as dt

    from hadoop_map_reduce_spark.plans import REGISTRY

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (ts, value): two obs in week 0, one in week 3
        (t0, 10.0),
        (t0 + dt.timedelta(hours=5), 20.0),
        (t0 + dt.timedelta(days=21, hours=2), 80.0),
    ]
    ev = spark.createDataFrame(
        [
            (i, i, "purchase", ts, float(v))
            for i, (ts, v) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    ev.write.parquet(f"{sf}/events.parquet")
    got = {
        r.hour: r
        for r in REGISTRY["events_locf_segmented"].fn(spark, sf).collect()
    }
    want = {
        r.hour: r for r in REGISTRY["events_locf"].fn(spark, sf).collect()
    }
    assert len(got) == 21 * 24 + 3  # full hour spine, inclusive ends
    assert sorted(map(repr, map(tuple, got.values()))) == sorted(
        map(repr, map(tuple, want.values()))
    )
    mid = t0 + dt.timedelta(days=10)  # deep inside the silent weeks
    r = got[mid]
    assert r.n_events == 0
    assert r.locf_value == 20.0  # carried across two empty segments
    assert 20.0 < r.interp_value < 80.0  # interpolated over the gap
