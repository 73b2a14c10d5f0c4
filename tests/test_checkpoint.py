"""Tracked localCheckpoint: release() must actually free block-manager
storage (DataFrame.unpersist does not — it only uncaches cache-manager
entries), and the iterative operators built on it must not accumulate
one persisted RDD per iteration."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.checkpoint import _persisted_ids, local_checkpoint


def _n_persisted(spark) -> int:
    return len(_persisted_ids(spark.sparkContext))


def test_release_frees_blocks_and_successor_survives(spark):
    base = _n_persisted(spark)
    df = spark.range(100).withColumn("y", F.col("id") * 2)
    cp1, release1 = local_checkpoint(df)
    assert _n_persisted(spark) == base + 1
    cp2, release2 = local_checkpoint(cp1.withColumn("y", F.col("y") + 1))
    assert _n_persisted(spark) == base + 2
    release1()
    assert _n_persisted(spark) == base + 1
    # The successor checkpoint materialized before the release, so it
    # must still be fully usable.
    assert cp2.count() == 100
    release1()  # idempotent
    release2()
    assert _n_persisted(spark) == base


def test_bpe_train_leaves_no_persisted_rdds(spark):
    from hadoop_map_reduce_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    base = _n_persisted(spark)
    merges = bpe_train(docs, n_merges=6)
    assert len(merges) == 6
    assert _n_persisted(spark) == base


def test_connected_components_leaves_one_persisted_rdd(spark):
    """Only the FINAL label checkpoint (backing the returned DataFrame)
    may remain; intermediate iterations must be freed."""
    from hadoop_map_reduce_spark.operators.clustering import (
        connected_components,
    )

    # A chain 0-1-2-...-9 needs several propagation iterations.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    base = _n_persisted(spark)
    comp = connected_components(pairs)
    rows = {(r.node, r.component) for r in comp.collect()}
    assert rows == {(i, 0) for i in range(10)}
    assert _n_persisted(spark) <= base + 1
