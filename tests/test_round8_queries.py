"""Round-8 additions: oracle differentials plus the semantic pins the
oracle can't express (ADVICE-r7 contracts, sink manifests, hybrid
triangle reconciliation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name",
    [
        "pack_write_shards",
    ],
)
def test_oracle_differential(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_shard_write_roundtrip(spark, sf_dir, tmp_path):
    """The sink's committed artifact is self-consistent: every doc comes
    back exactly once through read_training_shards, each shard file's
    decompressed bytes hash to the manifest's content_md5 and measure
    its n_bytes, and _SUCCESS exists."""
    import gzip
    import hashlib
    import os

    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.sinks.shards import (
        read_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "text",
            "source",
            F.size(tokenize(sanitize(F.col("text"))))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    manifest = write_training_shards(
        docs, out, max_tokens_per_shard=4096
    ).collect()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # per-shard file bytes match the manifest checksum and byte count
    for m in manifest:
        raw = gzip.decompress(
            open(os.path.join(out, m["file"]), "rb").read()
        )
        assert hashlib.md5(raw).hexdigest() == m["content_md5"]
        assert len(raw) == m["n_bytes"]
        assert raw.decode("utf-8").count("\n") == m["n_docs"]
    # roundtrip: every doc exactly once, text byte-identical
    back = {
        r["doc_id"]: r["text"]
        for r in read_training_shards(spark, out).collect()
    }
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert back == orig
    assert sum(m["n_docs"] for m in manifest) == len(orig)


def test_shard_writer_rejects_unframeable_text(spark, tmp_path):
    """TAB/CR/LF in text would break the line framing — the writer must
    refuse loudly, never emit a misframed shard."""
    from hadoop_map_reduce_spark.sinks.shards import write_training_shards

    docs = spark.createDataFrame(
        [(1, "ok text", "web", 2), (2, "bad\ttext", "web", 2)],
        "doc_id LONG, text STRING, source STRING, n_tokens LONG",
    )
    with pytest.raises(Exception, match="TAB/CR/LF"):
        write_training_shards(
            docs, str(tmp_path / "bad"), max_tokens_per_shard=10
        )


def test_cluster_retention_keeps_unscored_members(spark):
    """ADVICE r7 #2 contract: members missing a quality row are kept in
    the output and rank after every scored member; an all-unscored
    cluster still emits exactly one keep row (lowest id)."""
    from hadoop_map_reduce_spark.operators.clustering import (
        cluster_retention,
    )

    reps = spark.createDataFrame(
        [
            # cluster 1: ids 1 (scored), 2 (unscored), 3 (scored, best)
            (1, 1),
            (2, 1),
            (3, 1),
            # cluster 10: every member unscored
            (10, 10),
            (11, 10),
        ],
        "doc_id INT, representative INT",
    )
    quality = spark.createDataFrame(
        [(1, 5), (3, 9)], "doc_id INT, quality INT"
    )
    rows = {
        r["doc_id"]: r
        for r in cluster_retention(reps, quality).collect()
    }
    assert set(rows) == {1, 2, 3, 10, 11}, "unscored members dropped"
    assert rows[3]["action"] == "keep"
    assert rows[1]["action"] == "remove"
    assert rows[2]["action"] == "remove"  # unscored ranks last
    assert all(rows[i]["kept_id"] == 3 for i in (1, 2, 3))
    # all-unscored cluster: one keep row, lowest id wins
    assert rows[10]["action"] == "keep"
    assert rows[11]["action"] == "remove"
    assert rows[11]["kept_id"] == 10
