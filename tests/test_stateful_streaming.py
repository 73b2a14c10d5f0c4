"""applyInPandasWithState: state must survive across micro-batches."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.streaming.stateful import running_user_stats


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    schema = "event_id bigint, user_id bigint, value double"
    batches = [
        [(1, 7, 10.0), (2, 7, 5.5), (3, 8, 1.0)],
        [(4, 7, 4.5), (5, 8, 2.0), (6, 9, 100.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(src / "b*"))
    )
    name = f"rs_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # memory sink in update mode appends each emitted update; the LAST
    # update per user is the final running state.
    rows = spark.sql(
        f"SELECT * FROM {name}"
    ).collect()
    final: dict[int, tuple] = {}
    for r in rows:  # later rows overwrite earlier updates
        final[r.user_id] = (r.n_events, r.total_value_cents, r.max_value)
    # user 7 spans both batches: state carried across micro-batches.
    assert final[7] == (3, 2000, 10.0)
    assert final[8] == (2, 300, 2.0)
    assert final[9] == (1, 10000, 100.0)
    # user 7 must have emitted at least two updates (one per batch).
    assert sum(1 for r in rows if r.user_id == 7) >= 2


def test_stream_ewma_matches_batch_bit_exact(spark, sf_dir):
    """The streaming recurrence (state across micro-batches) must emit
    the SAME doubles as the batch applyInPandas operator — same float
    expression, same fold order, no tolerance."""
    from hadoop_map_reduce_spark.plans import REGISTRY

    batch = {
        (r["user_id"], r["event_id"]): (r["rn"], r["ewma_c"])
        for r in REGISTRY["timeseries_ewma"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r["user_id"], r["event_id"]): (r["rn"], r["ewma_c"])
        for r in REGISTRY["stream_ewma"].fn(spark, sf_dir).collect()
    }
    assert batch == stream and len(batch) > 0
