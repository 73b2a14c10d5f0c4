"""Simulate the verification driver's environment: a SparkSession the
engine did NOT build (no ``get_spark`` confs).

Round-1 regression: ``spark.sql.legacy.parquet.nanosAsLong`` was set only
at builder time, so events.parquet (TIMESTAMP(NANOS)) failed with
``PARQUET_TYPE_ILLEGAL`` on any externally supplied session — 7 registry
queries errored. ``load_table`` now (re)sets the conf at runtime.
"""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.session import load_table


@pytest.fixture()
def bare_conf_spark(spark):
    """The session fixture with the nanos conf reverted to its default —
    exactly what a driver-built bare session looks like to load_table."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    yield spark
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _events_ts_unit(sf_dir: str) -> str:
    import pyarrow.parquet as pq

    return str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)


def test_bare_session_cannot_read_nanos_events_directly(bare_conf_spark, sf_dir):
    # Precondition for the regression test to be meaningful: without the
    # conf, a raw read of a NANOS-timestamp parquet must fail. The driver
    # regenerates testdata per round and the timestamp unit has varied
    # (ns in round 1, us in round 2) — only the ns case exercises the
    # conf, so detect the actual unit and skip otherwise. load_table must
    # work on a bare session in BOTH cases (next tests).
    if _events_ts_unit(sf_dir) != "timestamp[ns]":
        pytest.skip("events.parquet not written with nanosecond timestamps")
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException, match="PARQUET_TYPE_ILLEGAL"):
        bare_conf_spark.read.parquet(f"{sf_dir}/events.parquet").collect()


def test_load_table_reads_events_on_bare_session(bare_conf_spark, sf_dir):
    df = load_table(bare_conf_spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_events_query_runs_on_bare_session(bare_conf_spark, sf_dir):
    # One of the 7 round-1 errored queries, end-to-end via the driver's
    # entry-point wrapper (ensure_worker_imports + query fn).
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["events_hourly"](bare_conf_spark, sf_dir)
    assert df.count() > 0
