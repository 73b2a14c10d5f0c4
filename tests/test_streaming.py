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
    rows_in = [
        (1, "2024-01-01 00:05:00", 7, "click", 10.0),
        (2, "2024-01-01 00:20:00", 7, "click", 5.5),
        (2, "2024-01-01 00:20:00", 7, "click", 5.5),   # exact duplicate
        (2, "2024-01-01 00:26:00", 7, "retry", 5.5),   # same id, later ts
        (3, "2024-01-01 01:10:00", 8, "view", 1.25),
    ]
    df = spark.createDataFrame(
        rows_in, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "ev2"))
    stream = spark.readStream.schema(df.schema).parquet(str(tmp_path / "ev2"))
    name = f"dd_{uuid.uuid4().hex[:8]}"
    _run_to_memory(streaming_dedup(stream, ["event_id"]), name, "append")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # Keyed dedup: both the exact duplicate AND the different-timestamp
    # duplicate of event_id 2 are suppressed within the watermark.
    assert len(rows) == 3
    assert {r.event_id for r in rows} == {1, 2, 3}


def test_stream_stream_interval_join(spark, tmp_path):
    from hadoop_map_reduce_spark.streaming import stream_stream_interval_join

    clicks = [
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 12:00:00", 7),
    ]
    views = [
        (11, "2024-01-01 09:30:00", 7),  # within 1h before click 1 only
        (12, "2024-01-01 11:59:00", 7),  # within 1h before click 2 only
        (13, "2024-01-01 05:00:00", 7),  # too old for both
        (14, "2024-01-01 09:40:00", 8),  # wrong user
    ]
    cdf = spark.createDataFrame(
        clicks, "click_id bigint, cts string, user_id bigint"
    ).withColumn("cts", F.to_timestamp("cts"))
    vdf = spark.createDataFrame(
        views, "view_id bigint, vts string, user_id bigint"
    ).withColumn("vts", F.to_timestamp("vts"))
    cdf.write.mode("overwrite").parquet(str(tmp_path / "clicks"))
    vdf.write.mode("overwrite").parquet(str(tmp_path / "views"))

    cs = spark.readStream.schema(cdf.schema).parquet(str(tmp_path / "clicks"))
    vs = spark.readStream.schema(vdf.schema).parquet(str(tmp_path / "views"))
    joined = stream_stream_interval_join(
        cs, vs, key="user_id", left_ts="cts", right_ts="vts", lookback="1 hour",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.selectExpr("click_id", "view_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.view_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got == {(1, 11), (2, 12)}
    # The output keeps exactly one key column (right side dropped) —
    # name-based references must not be ambiguous.
    assert joined.columns.count("user_id") == 1
    joined.select("user_id")  # raises AMBIGUOUS_REFERENCE if duplicated


def test_foreach_batch_to_reference_sink(spark, tmp_path):
    """Streaming results land in the reference's output format: each
    micro-batch flows through write_kv_text via foreachBatch."""
    from hadoop_map_reduce_spark.sinks import write_kv_text
    from hadoop_map_reduce_spark.streaming import streaming_bigram_counts

    src = tmp_path / "lines"
    src.mkdir()
    (src / "a.txt").write_text("the quick fox\nthe quick dog")
    out = tmp_path / "kv_out"

    def sink_batch(batch_df, batch_id):
        write_kv_text(
            batch_df, str(out / f"batch_{batch_id}"), "bigram", "cnt",
            num_partitions=4, hadoop_layout=True,
        )

    stream = spark.readStream.format("text").load(str(src))
    q = (
        streaming_bigram_counts(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(sink_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_dirs = sorted(out.glob("batch_*"))
    assert batch_dirs, "no batches written"
    lines = []
    for p in sorted(batch_dirs[-1].glob("part-*")):
        lines += p.read_text().splitlines()
    got = dict(line.split("\t") for line in lines)
    assert got == {"the+quick": "2", "quick+fox": "1", "quick+dog": "1"}
    assert (batch_dirs[-1] / "_SUCCESS").exists()


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
