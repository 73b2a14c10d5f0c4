"""Oracle-differential tests for the registered streaming queries: the
streaming plan runs to completion (availableNow) and its materialized
result must equal the batch semantics DuckDB computes."""

from __future__ import annotations

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query

STREAMING = sorted(
    name for name, q in REGISTRY.items() if "streaming" in q.tags
)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


@pytest.mark.parametrize("name", STREAMING)
def test_streaming_rerun_same_session(spark, sf_dir, name):
    """The driver and verify tool re-invoke queries in one session; the
    memory-sink query name must be reusable after termination."""
    df1 = REGISTRY[name].fn(spark, sf_dir)
    n1 = df1.count()
    df2 = REGISTRY[name].fn(spark, sf_dir)
    assert df2.count() == n1


def test_session_windows_merge_across_micro_batches(spark, sf_dir, tmp_path):
    """session_window state must merge on out-of-order arrival ACROSS
    micro-batches, not only within one: events split round-robin into 3
    files and streamed one file per trigger interleave every session
    across batches, yet the final sessions must equal the single-batch
    run. The watermark delay (90 days) must cover the arrival skew —
    here each batch spans the whole 40-day corpus, and session windows
    drop late input in EVERY output mode (verified: a 2-hour delay
    silently loses ~a third of the events to late filtering in batch
    2+). That delay-covers-skew contract is exactly what a production
    stream needs to resume mid-session."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.session import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    src = str(tmp_path / "events_split")
    # round-robin by event_id: each file holds a slice of EVERY session.
    # Three explicit appends (not repartition(3, _b): hash(0)%3 ==
    # hash(2)%3 collides two slices into one file) guarantee >= 3 files
    # and therefore >= 3 micro-batches under maxFilesPerTrigger=1.
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_files = len(list((tmp_path / "events_split").glob("*.parquet")))
    assert n_files >= 3

    def run(max_files: int | None, table: str):
        reader = spark.readStream.schema(events.schema)
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", max_files)
        stream = reader.parquet(src)
        agg = (
            stream.withWatermark("ts", "90 days")
            .groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("_w")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("_w.start").alias("session_start"),
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            tuple(r) for r in spark.table(table).collect()
        )

    multi = run(1, "_t_sess_multi")  # >= 3 micro-batches
    single = run(None, "_t_sess_single")  # one batch
    assert multi == single
    assert len(multi) > 0
