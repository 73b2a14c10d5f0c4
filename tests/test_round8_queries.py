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
        "stream_crawl_extract",
        "graph_triangles_hybrid",
        "q4_order_priority",
        "q13_custdist",
        "q14_promo_share",
        "q17_small_quantity",
        "q18_large_volume",
        "q22_global_sales",
        "graph_cc_bounded",
        "events_rfm_segments",
        "events_cohort_ltv",
        "tokenizer_oov_census",
        "layout_compaction_plan",
        "mrl_prefix_recall_bound",
        "events_pattern_strict_seq",
        "layout_zonemap_prune",
        "graph_kcore_bounded",
        "multimodal_scene_cuts",
    ],
)
def test_oracle_differential(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_triangles_hybrid_reconciles_and_is_accurate(spark, sf_dir):
    """The hybrid's arithmetic contract (n_total_est = n_light +
    n_heavy_est, n_heavy_est a multiple of the 1/p^2 = 16 scale-up)
    plus the accuracy contract vs the exact count: measured rel. err
    is 1.05%/2.01%/0.76% at sf0.001/0.01/0.1 (deterministic md5
    sample), pinned here at <= 5%."""
    from hadoop_map_reduce_spark.plans.graph_queries import (
        _copurchase_edges,
        _spark_tri_count,
    )

    row = REGISTRY["graph_triangles_hybrid"].fn(spark, sf_dir).collect()[0]
    assert row["n_heavy_est"] % 16 == 0
    assert row["n_total_est"] == row["n_light"] + row["n_heavy_est"]
    exact = _spark_tri_count(_copurchase_edges(spark, sf_dir)).collect()[
        0
    ][0]
    assert abs(row["n_total_est"] - exact) <= 0.05 * exact


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


def _warc_docs(spark, a, b):
    return spark.range(a, b).select(
        F.concat(F.lit("urn:doc:"), F.col("id").cast("string")).alias(
            "record_id"
        ),
        F.lit("response").alias("warc_type"),
        F.concat(F.lit("https://x.local/"), F.col("id").cast("string")).alias(
            "target_uri"
        ),
        F.lit("text/html").alias("content_type"),
        F.concat(
            F.lit("<html><body>doc "),
            F.col("id").cast("string"),
            F.lit("</body></html>"),
        )
        .cast("binary")
        .alias("content"),
    )


def test_warc_stream_incremental_replay(spark, tmp_path):
    """Replay idempotence of the WARC stream source: a second
    availableNow run from the same checkpoint processes ONLY archives
    that arrived after the first run — nothing is re-emitted, nothing
    is missed."""
    import os

    from hadoop_map_reduce_spark.sources.warc import (
        register_warc_datasource,
    )

    register_warc_datasource(spark)
    warc_dir = str(tmp_path / "crawl")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    _warc_docs(spark, 0, 20).repartition(4).write.format(
        "warcrecords"
    ).mode("overwrite").save(warc_dir)

    def drain():
        stream = spark.readStream.format("warcrecords").load(
            os.path.join(warc_dir, "*.warc.gz")
        )
        q = (
            stream.select("record_id", "target_uri", "size")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 20
    _warc_docs(spark, 20, 30).repartition(2).write.format(
        "warcrecords"
    ).mode("append").save(warc_dir)
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 30
    assert out.select("record_id").distinct().count() == 30
    # a third run with no new archives is a no-op
    drain()
    assert spark.read.parquet(sink).count() == 30


def test_warc_stream_admission_cap(tmp_path):
    """maxFilesPerTrigger admission control at the offset level: the
    first latestOffset of an instance is UNCAPPED (offsets must be a
    superset of anything previously committed — a capped first offset
    on a restarted reader would regress the checkpoint and re-emit
    committed archives); subsequent calls admit at most N new files in
    lexicographic order."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(5):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    opts = {
        "path": str(tmp_path / "*.warc.gz"),
        "maxfilespertrigger": "2",
    }
    r = WarcStreamReader(opts)
    assert r.initialOffset() == {"files": []}
    # first call: full backlog, cap not applied
    o1 = r.latestOffset()
    assert len(o1["files"]) == 5
    # steady state: cap applies to NEW arrivals only
    for i in range(5, 9):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    o2 = r.latestOffset()
    assert len(o2["files"]) == 7
    parts = r.partitions(o1, o2)
    assert sorted(p.path.rsplit("/", 1)[1] for p in parts) == [
        "part-5.warc.gz",
        "part-6.warc.gz",
    ]
    # restart: a FRESH reader's first offset covers everything on disk,
    # so it can never regress below the committed offset o2; the diff
    # vs the checkpoint is exactly the unprocessed archives.
    r2 = WarcStreamReader(opts)
    o3 = r2.latestOffset()
    assert set(o3["files"]) >= set(o2["files"])
    new = sorted(
        p.path.rsplit("/", 1)[1] for p in r2.partitions(o2, o3)
    )
    assert new == ["part-7.warc.gz", "part-8.warc.gz"]


def test_global_rank_and_ntile_match_window(spark):
    """The distributed ranking operator must equal the single-partition
    Window definition exactly, including the SQL NTILE remainder rule
    (first N mod k buckets get the extra row) — checked at several N to
    cover N % k = 0, 1, k-1 and N < k."""
    from pyspark.sql import Window

    from hadoop_map_reduce_spark.operators.ranking import (
        with_global_ntile,
        with_global_rank,
    )

    for n_rows in (3, 100, 101, 104, 105):
        df = (
            spark.range(n_rows)
            .select(
                F.col("id"),
                (F.xxhash64(F.col("id")) % 97).alias("metric"),
            )
        )
        order = [F.col("metric").asc(), F.col("id").asc()]
        w = Window.orderBy(*order)
        want = df.select(
            "id",
            F.row_number().over(w).alias("rank"),
            F.ntile(5).over(w).cast("long").alias("bucket"),
        ).collect()
        got_rank = {
            r["id"]: r["global_rank"]
            for r in with_global_rank(df, order).collect()
        }
        got_tile = {
            r["id"]: r["b"]
            for r in with_global_ntile(df, order, 5, "b").collect()
        }
        for row in want:
            assert got_rank[row["id"]] == row["rank"], n_rows
            assert got_tile[row["id"]] == row["bucket"], n_rows


def test_shard_overwrite_clears_stale_files(spark, tmp_path):
    """Rerunning the sink over a smaller corpus must not leave phantom
    shards from the previous run behind the new _SUCCESS (r8 review
    finding: the WARC writer's overwrite discipline, applied here)."""
    from hadoop_map_reduce_spark.sinks.shards import (
        read_training_shards,
        write_training_shards,
    )

    out = str(tmp_path / "shards")

    def mkdocs(n, source):
        return spark.range(n).selectExpr(
            "id AS doc_id",
            "concat('doc ', id) AS text",
            f"'{source}' AS source",
            "CAST(2 AS LONG) AS n_tokens",
        )

    write_training_shards(mkdocs(40, "a"), out, max_tokens_per_shard=4)
    write_training_shards(mkdocs(4, "b"), out, max_tokens_per_shard=4)
    back = read_training_shards(spark, out)
    assert back.count() == 4
    assert [r["source"] for r in back.select("source").distinct().collect()] == ["b"]
