"""Streaming CDC apply: foreachBatch + merge into a versioned parquet
target must converge to the same state as applying the batches in batch
mode, and the pointer protocol must never expose a partial version."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.relational import merge_upsert
from hadoop_map_reduce_spark.session import load_table
from hadoop_map_reduce_spark.streaming.cdc_sink import (
    apply_cdc_stream,
    init_target,
    read_target,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdc_stream_matches_batch_merge(spark, sf_dir, tmp_path):
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    target_dir = str(tmp_path / "orders_table")
    os.makedirs(target_dir)
    init_target(base, target_dir)

    # Two deterministic change batches: updates for keys %10==0, inserts
    # with shifted keys — written as one parquet file each so
    # maxFilesPerTrigger=1 yields two micro-batches.
    b1 = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("price_cents") + 500).alias("price_cents"),
    )
    b2 = base.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "price_cents",
    )
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    b1.toPandas().to_parquet(changes_dir / "b1.parquet", index=False)
    b2.toPandas().to_parquet(changes_dir / "b2.parquet", index=False)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(changes_dir))
    )
    apply_cdc_stream(stream, target_dir, ["o_orderkey"])

    got = read_target(spark, target_dir)
    want = merge_upsert(merge_upsert(base, b1, on=["o_orderkey"]), b2, on=["o_orderkey"])
    assert _rows(got) == _rows(want)

    # The pointer advanced past v=0 and every committed version dir is
    # complete (has a _SUCCESS marker).
    with open(os.path.join(target_dir, "_LATEST")) as f:
        version = f.read().strip()
    assert version != "v=0"
    for v in os.listdir(target_dir):
        if v.startswith("v="):
            assert os.path.exists(os.path.join(target_dir, v, "_SUCCESS")), v


def test_cdc_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running the same availableNow stream from a fresh checkpointless
    query replays the batches; the target must not change (same keys,
    same values — merge is a pure function of (state, batch))."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    target_dir = str(tmp_path / "t")
    os.makedirs(target_dir)
    init_target(base, target_dir)

    upd = base.limit(50).select(
        "o_orderkey", F.lit("Z").alias("o_orderstatus")
    )
    changes_dir = tmp_path / "chg"
    changes_dir.mkdir()
    upd.toPandas().to_parquet(changes_dir / "c.parquet", index=False)

    stream_fn = lambda: (
        spark.readStream.schema(base.schema).parquet(str(changes_dir))
    )
    apply_cdc_stream(stream_fn(), target_dir, ["o_orderkey"])
    first = _rows(read_target(spark, target_dir))
    apply_cdc_stream(stream_fn(), target_dir, ["o_orderkey"])
    second = _rows(read_target(spark, target_dir))
    assert first == second


def test_time_travel_and_vacuum(spark, sf_dir, tmp_path):
    from hadoop_map_reduce_spark.streaming.cdc_sink import list_versions, vacuum

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    target_dir = str(tmp_path / "tt")
    os.makedirs(target_dir)
    init_target(base, target_dir)

    changes_dir = tmp_path / "chg"
    changes_dir.mkdir()
    b1 = base.limit(10).select("o_orderkey", F.lit("A").alias("o_orderstatus"))
    b2 = base.limit(20).select("o_orderkey", F.lit("B").alias("o_orderstatus"))
    b1.toPandas().to_parquet(changes_dir / "b1.parquet", index=False)
    b2.toPandas().to_parquet(changes_dir / "b2.parquet", index=False)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(changes_dir))
    )
    apply_cdc_stream(stream, target_dir, ["o_orderkey"])

    assert list_versions(target_dir) == [0, 1, 2]
    # Time travel: v=0 is the pristine base.
    assert _rows(read_target(spark, target_dir, version=0)) == _rows(base)
    # Vacuum keeps the newest two, current pointer survives.
    removed = vacuum(target_dir, keep=2)
    assert removed == [0]
    assert list_versions(target_dir) == [1, 2]
    assert _rows(read_target(spark, target_dir)) == _rows(
        read_target(spark, target_dir, version=2)
    )
