"""Round-9 additions: oracle differentials plus the semantic pins the
oracle can't express (log-round CC vs the min-label baseline, shard-sink
commit-marker invalidation, integer NTILE arithmetic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans import REGISTRY
from hadoop_map_reduce_spark.session import load_table
from hadoop_map_reduce_spark.streaming.neardup import NearDupAdmitter
from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name",
    [
        "graph_cc_loground",
        "ivfpq_code_census",
        "ivfpq_recall_bound",
        "dedup_clusters_loground",
        "pack_curriculum_order",
        "embedding_gram_census",
    ],
)
def test_oracle_differential(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_loground_cc_matches_minlabel_baseline(spark):
    """Large-star/small-star must produce the identical (node,
    component) mapping as the converged min-label loop on graphs with
    cycles, multi-edges, and isolated nodes — seeded, deterministic."""
    import random

    from hadoop_map_reduce_spark.operators.clustering import (
        connected_components,
        connected_components_loground,
    )

    rng = random.Random(11)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(220)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.range(n).select(F.col("id").alias("node"))
    labels, rounds = connected_components_loground(pairs, nodes=nodes)
    got = {r["node"]: r["component"] for r in labels.collect()}
    want = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    for k in range(n):
        want.setdefault(k, k)  # isolated nodes are their own component
    assert got == want
    assert rounds < 20  # log-round on a 300-node random graph


def test_loground_cc_beats_diameter_on_long_path(spark):
    """The round count on a 1,000-node path must be logarithmic, not
    linear — the entire reason the operator exists (hash-min label
    propagation needs ~1,000 rounds here; Kiveris et al. SoCC'14)."""
    from hadoop_map_reduce_spark.operators.clustering import (
        connected_components_loground,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    labels, rounds = connected_components_loground(pairs)
    assert rounds <= 16, f"expected O(log n) rounds, got {rounds}"
    comp = labels.groupBy("component").count().collect()
    assert [(r["component"], r["count"]) for r in comp] == [(0, 1000)]


def test_shard_sink_invalidates_success_marker(spark, tmp_path):
    """ADVICE r8 #1, simulated end-to-end: a rerun that CRASHES
    mid-write (deterministic shard names overwrite committed bytes in
    place) must not leave the previous run's _SUCCESS live — the
    marker is invalidated before the first shard byte, so the failed
    directory reads as uncommitted; a subsequent good run re-commits."""
    import os

    from hadoop_map_reduce_spark.sinks.shards import (
        write_training_shards,
    )

    good = spark.createDataFrame(
        [(1, "alpha", "web", 3), (2, "beta", "web", 3)],
        "doc_id long, text string, source string, n_tokens long",
    )
    out = str(tmp_path / "shards")
    marker = os.path.join(out, "_SUCCESS")
    write_training_shards(good, out, max_tokens_per_shard=100)
    assert os.path.exists(marker)

    bad = spark.createDataFrame(
        [(1, "tab\there", "web", 3)],
        "doc_id long, text string, source string, n_tokens long",
    )
    with pytest.raises(Exception, match="TAB/CR/LF"):
        write_training_shards(bad, out, max_tokens_per_shard=100)
    assert not os.path.exists(marker), (
        "_SUCCESS survived a crashed rerun — the corrupt-committed "
        "state ADVICE r8 #1 describes"
    )

    write_training_shards(good, out, max_tokens_per_shard=100)
    assert os.path.exists(marker)


def test_shard_sink_refuses_unlistable_out_dir(spark, tmp_path, monkeypatch):
    """If the sweep cannot run (driver does not see out_dir), the sink
    must raise instead of committing an unswept directory."""
    import os

    from hadoop_map_reduce_spark.sinks import shards as shards_mod

    docs = spark.createDataFrame(
        [(1, "alpha", "web", 3)],
        "doc_id long, text string, source string, n_tokens long",
    )
    out = str(tmp_path / "phantom")

    real_isdir = os.path.isdir
    monkeypatch.setattr(
        shards_mod.os.path,
        "isdir",
        lambda p: False if p == out else real_isdir(p),
    )
    with pytest.raises(OSError, match="not listable"):
        shards_mod.write_training_shards(
            docs, out, max_tokens_per_shard=100
        )
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_global_ntile_integer_arithmetic(spark):
    """ADVICE r8 #2 regression pin: bucket boundaries must match SQL
    NTILE exactly (integer div path), including the N < n and
    remainder-heavy cases."""
    from pyspark.sql import Window

    from hadoop_map_reduce_spark.operators.ranking import (
        with_global_ntile,
    )

    for n_rows, n_buckets in [(7, 3), (3, 5), (32, 4), (10, 10)]:
        df = spark.range(n_rows).select(F.col("id").alias("k"))
        got = {
            r["k"]: r["b"]
            for r in with_global_ntile(
                df, [F.col("k")], n_buckets, "b"
            ).collect()
        }
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k",
                F.ntile(n_buckets)
                .over(Window.orderBy("k"))
                .cast("long")
                .alias("b"),
            ).collect()
        }
        assert got == want, (n_rows, n_buckets)


def test_warc_stream_admission_log_throttles_restart(tmp_path):
    """ADVICE r8 #3: with .option('admissionLog', path) the cap
    decision is persisted, so a RESTARTED reader throttles from its
    very first trigger while staying offset-monotonic; without the
    log the first call stays uncapped (the documented fallback)."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(6):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    log = tmp_path / "admissions.jsonl"
    opts = {
        "path": str(tmp_path / "*.warc.gz"),
        "maxfilespertrigger": "2",
        "admissionlog": str(log),
    }
    # brand-new stream: no log yet -> first call uncapped (fallback)
    r1 = WarcStreamReader(opts)
    o1 = r1.latestOffset()
    assert len(o1["files"]) == 6
    assert log.exists()

    # restart against a 4-archive backlog: log primes the high-water
    # mark, so the first trigger is CAPPED and still a superset of o1
    for i in range(6, 10):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    r2 = WarcStreamReader(opts)
    o2 = r2.latestOffset()
    assert set(o2["files"]) >= set(o1["files"])
    assert len(o2["files"]) == 8  # 6 known + 2 admitted, not 10
    newly = sorted(
        p.path.rsplit("/", 1)[1] for p in r2.partitions(o1, o2)
    )
    assert newly == ["part-6.warc.gz", "part-7.warc.gz"]
    # drain the rest in capped steps
    o3 = r2.latestOffset()
    assert len(o3["files"]) == 10

    # a third instance replays the log (both lines) and sees all 10
    r3 = WarcStreamReader(opts)
    o4 = r3.latestOffset()
    assert len(o4["files"]) == 10


def test_warc_stream_uncommitted_replay_throttles_next_trigger(tmp_path):
    """Without a log, a restart that REPLAYS an uncommitted batch
    (partitions() called with the checkpointed start before any
    latestOffset) learns the committed offset there, so its next
    trigger is capped — only the all-committed restart path keeps the
    uncapped first call."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(8):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    opts = {
        "path": str(tmp_path / "*.warc.gz"),
        "maxfilespertrigger": "2",
    }
    committed = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(3)
        )
    }
    logged_end = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(4)
        )
    }
    r = WarcStreamReader(opts)
    parts = r.partitions(committed, logged_end)  # engine replays b(n)
    assert [p.path.rsplit("/", 1)[1] for p in parts] == [
        "part-3.warc.gz"
    ]
    nxt = r.latestOffset()
    assert len(nxt["files"]) == 6  # 4 known + 2 admitted, capped


def test_bench_pins_cover_headline_set_exactly():
    """VERDICT r8 #1 done-bar: every headline query carries a pin (no
    'unpinned' leftovers in BENCH_r09) and no pin is stale (naming a
    query that left the headline set)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    headline = {n for n, q in REGISTRY.items() if q.headline}
    assert set(bench.PINS) == headline


def test_warc_admission_log_covers_checkpoint_learned_files(tmp_path):
    """Review finding: files learned via partitions() (checkpoint
    replay) must be appended to the admission log too, or a later
    instance priming from the log could return a non-superset offset
    and re-emit committed archives."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(6):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    log = tmp_path / "admissions.jsonl"
    opts = {
        "path": str(tmp_path / "*.warc.gz"),
        "maxfilespertrigger": "2",
        "admissionlog": str(log),
    }
    committed = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(3)
        )
    }
    logged_end = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(4)
        )
    }
    # instance 1: log absent, learns A..D only via partitions(), then
    # admits E,F capped — and crashes (we just drop it)
    r1 = WarcStreamReader(opts)
    r1.partitions(committed, logged_end)
    o1 = r1.latestOffset()
    assert len(o1["files"]) == 6
    # instance 2 primes from the log alone: must cover the COMMITTED
    # files (A..D), not just instance 1's own admissions
    r2 = WarcStreamReader(opts)
    o2 = r2.latestOffset()
    assert set(o2["files"]) >= set(logged_end["files"])
    assert set(o2["files"]) >= set(o1["files"])


def test_warc_admission_log_torn_line_falls_back_uncapped(tmp_path):
    """Review finding: a crash mid-append leaves a torn JSON line; the
    reader must fall back to the uncapped first call instead of
    raising forever."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(5):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    log = tmp_path / "admissions.jsonl"
    log.write_text('["/gone/a.warc.gz"]\n["/torn/b.w')
    r = WarcStreamReader(
        {
            "path": str(tmp_path / "*.warc.gz"),
            "maxfilespertrigger": "2",
            "admissionlog": str(log),
        }
    )
    o = r.latestOffset()  # uncapped fallback: full glob + parsed prefix
    assert len(o["files"]) == 6  # 5 on disk + the parsed-prefix entry


def test_compact_store_post_swap_crash_drops_subsumed_dirs(
    spark, sf_dir, tmp_path
):
    """Review finding: a crash AFTER the seed swap but before the
    merged b* dirs are deleted must not leave their rows readable
    twice — the marker-driven heal removes them on the next read."""
    import shutil

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    admitter = NearDupAdmitter(str(tmp_path / "store"), threshold=0.5)
    admitter.seed(docs.filter(F.col("doc_id") % 3 == 2))
    for i in range(2):
        admitter.apply_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    clean = sorted(map(tuple, admitter.read_store(spark).collect()))

    # simulate: swap landed (marker inside seed), b* dirs survived
    assert admitter.compact_store(spark, through_batch=1) == 2
    compacted = sorted(map(tuple, admitter.read_store(spark).collect()))
    assert compacted == clean
    # resurrect a subsumed increment + the marker, as the crash leaves it
    shutil.copytree(tmp_path / "store" / "seed", tmp_path / "store" / "b0")
    (tmp_path / "store" / "seed" / "_THROUGH_BATCH").write_text("1")
    # duplicated rows would now be visible without the heal
    healed = sorted(map(tuple, admitter.read_store(spark).collect()))
    assert healed == clean
    assert not (tmp_path / "store" / "b0").exists()
    assert not (
        tmp_path / "store" / "seed" / "_THROUGH_BATCH"
    ).exists()


def test_ivfpq_train_rejects_wide_ksub(spark, sf_dir):
    """Review finding: ksub > 16 would silently corrupt the nibble
    packing in ivfpq_encode; training must refuse it like
    pq_train_codebooks does."""
    from hadoop_map_reduce_spark.operators.pq import (
        ivfpq_coarse_centroids,
        ivfpq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivfpq_coarse_centroids(emb, n_cells=4)
    with pytest.raises(ValueError, match="ksub"):
        ivfpq_train_codebooks(emb, cents, m=8, ksub=32)
