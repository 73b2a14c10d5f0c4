"""Structured Streaming tests: file-source streams driven with
``trigger(availableNow=True)`` into memory sinks, checked for parity with
the batch twins over identical data."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.bigram import bigram_counts
from hadoop_map_reduce_spark.streaming import (
    session_window_stats,
    streaming_bigram_counts,
    streaming_dedup,
    windowed_event_stats,
)


def _run_to_memory(df, name: str, mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_bigram_parity(spark, tmp_path):
    lines = [
        "the quick brown fox", "the quick dog", "lazy dog sleeps all day",
        "one", "", "the quick brown cat",
    ]
    src = tmp_path / "lines"
    src.mkdir()
    for i, chunk in enumerate([lines[:3], lines[3:]]):  # two micro-batches
        (src / f"part{i}.txt").write_text("\n".join(chunk))

    stream = spark.readStream.format("text").load(str(src))
    name = f"bg_{uuid.uuid4().hex[:8]}"
    _run_to_memory(streaming_bigram_counts(stream), name, "complete")
    got = {
        (r.bigram, r.cnt) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    batch = spark.createDataFrame([(l,) for l in lines], ["value"])
    want = {(r.bigram, r.cnt) for r in bigram_counts(batch, "value").collect()}
    assert got == want
    assert ("the+quick", 3) in got


@pytest.fixture(scope="module")
def event_stream_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("events")


def _write_events(spark, path):
    rows = [
        (1, "2024-01-01 00:05:00", 7, "click", 10.0),
        (2, "2024-01-01 00:20:00", 7, "click", 5.5),
        (3, "2024-01-01 01:10:00", 7, "view", 1.25),
        (4, "2024-01-01 00:40:00", 8, "click", 2.0),
        (5, "2024-01-01 02:30:00", 8, "purchase", 99.99),
        (5, "2024-01-01 02:30:00", 8, "purchase", 99.99),  # duplicate
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(path))
    return df


def test_windowed_event_stats(spark, tmp_path):
    batch = _write_events(spark, tmp_path / "ev")
    stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path / "ev"))
    name = f"win_{uuid.uuid4().hex[:8]}"
    _run_to_memory(windowed_event_stats(stream, "1 hour"), name, "complete")
    rows = {
        (str(r.window_start), r.event_type): (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert rows[("2024-01-01 00:00:00", "click")] == (3, 17.5)
    assert rows[("2024-01-01 02:00:00", "purchase")] == (2, 199.98)


def test_streaming_dedup(spark, tmp_path):
    batch = _write_events(spark, tmp_path / "ev2")
    stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path / "ev2"))
    name = f"dd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(streaming_dedup(stream, ["event_id"]), name, "append")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == 5  # 6 input rows, one exact duplicate suppressed
    assert len({r.event_id for r in rows}) == 5


def test_session_window_stats(spark, tmp_path):
    batch = _write_events(spark, tmp_path / "ev3")
    stream = spark.readStream.schema(batch.schema).parquet(str(tmp_path / "ev3"))
    name = f"sw_{uuid.uuid4().hex[:8]}"
    _run_to_memory(session_window_stats(stream, gap="30 minutes"), name, "complete")
    rows = sorted(
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    # user 7: events at 00:05 and 00:20 merge (gap < 30m); 01:10 separate.
    # user 8: 00:40 and 02:30(x2, dup both counted) separate sessions.
    assert rows == [
        (7, "2024-01-01 00:05:00", 2),
        (7, "2024-01-01 01:10:00", 1),
        (8, "2024-01-01 00:40:00", 1),
        (8, "2024-01-01 02:30:00", 2),
    ]
