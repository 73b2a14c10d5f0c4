"""Round-10 additions: the ADVICE r9 hardening pins (shard-reader
commit check, warc regressed-offset refusal, PQ sample guards, bench
advisory field) plus the round's new operator families (persisted ANN
index, filtered ANN, converged PageRank, index-probing admission —
their oracle differentials and semantic pins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans import REGISTRY
from hadoop_map_reduce_spark.session import load_table
from tests.oracle_utils import compare_query


# ---------------------------------------------------------------------------
# ADVICE r9 #1: read_training_shards refuses uncommitted directories
# ---------------------------------------------------------------------------


def test_read_training_shards_refuses_uncommitted_dir(spark, tmp_path):
    import os

    from hadoop_map_reduce_spark.sinks.shards import (
        read_training_shards,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", "web", 2), (2, "gamma delta", "web", 2)],
        "doc_id long, text string, source string, n_tokens long",
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, max_tokens_per_shard=4)
    # committed: reads fine
    assert read_training_shards(spark, out).count() == 2
    # mid-rewrite state: marker invalidated, shard files still present
    os.remove(os.path.join(out, "_SUCCESS"))
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        read_training_shards(spark, out)


# ---------------------------------------------------------------------------
# ADVICE r9 #2: warc streaming reader — committed archives are never
# re-emitted, even through a regressed offset (admission-log contract
# breach scenario)
# ---------------------------------------------------------------------------


def test_warc_regressed_offset_cannot_reemit_committed(tmp_path):
    """Simulates the log-gap failure: a committed offset contains
    archives the admission log never saw; the primed instance's capped
    offset regresses below it, and the NEXT batch's end-minus-start
    difference would re-emit the committed archives — partitions()
    must drop them."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(6):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    log = tmp_path / "admissions.jsonl"
    # Log knows only part-0 (a batch ran with the log disabled and
    # admitted part-1..3, which were then committed).
    log.write_text(
        '["%s"]\n' % str(tmp_path / "part-0.warc.gz")
    )
    r = WarcStreamReader(
        {
            "path": str(tmp_path / "*.warc.gz"),
            "maxfilespertrigger": "1",
            "admissionlog": str(log),
        }
    )
    committed = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(4)
        )
    }
    # Primed + capped first call: admits ONE unknown file — a
    # non-superset of the committed offset (the contract-breach gap).
    end1 = r.latestOffset()
    assert len(end1["files"]) == 2  # part-0 from log + 1 admitted
    # Batch 1: engine hands (committed, end1); nothing new to emit and
    # the committed files must be learned, not re-emitted.
    parts1 = r.partitions(committed, end1)
    emitted1 = {p.path for p in parts1}
    assert emitted1 <= set(end1["files"]) - set(committed["files"])
    # Batch 2: end2 is a superset again (learned committed files) —
    # the committed archives appear in end2 - end1 but must NOT be
    # re-emitted as partitions.
    end2 = r.latestOffset()
    assert set(end2["files"]) >= set(committed["files"])
    parts2 = r.partitions(end1, end2)
    emitted2 = {p.path for p in parts2}
    assert emitted2.isdisjoint(set(committed["files"]))


def test_warc_partitions_replay_still_reemits_same_batch(tmp_path):
    """The committed-file filter must not break legitimate replay: a
    replayed (start, end) batch re-emits exactly its own files (they
    were never in any start offset)."""
    from hadoop_map_reduce_spark.sources.warc import WarcStreamReader

    for i in range(4):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(b"")
    r = WarcStreamReader({"path": str(tmp_path / "*.warc.gz")})
    start = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(2)
        )
    }
    end = {
        "files": sorted(
            str(tmp_path / f"part-{i}.warc.gz") for i in range(4)
        )
    }
    first = sorted(p.path for p in r.partitions(start, end))
    replay = sorted(p.path for p in r.partitions(start, end))
    assert first == replay
    assert len(first) == 2


# ---------------------------------------------------------------------------
# ADVICE r9 #4: PQ / IVF-PQ training-sample size guards
# ---------------------------------------------------------------------------


def test_pq_train_rejects_sample_smaller_than_ksub(spark):
    from hadoop_map_reduce_spark.operators.pq import (
        ivfpq_train_codebooks,
        pq_train_codebooks,
    )

    tiny = spark.createDataFrame(
        [(i, [float(i)] * 16) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ksub"):
        pq_train_codebooks(tiny, m=2, ksub=16, dim=16)
    with pytest.raises(ValueError, match="ksub"):
        ivfpq_train_codebooks(
            tiny, [[0.0] * 16, [1.0] * 16], m=2, ksub=16
        )


# ---------------------------------------------------------------------------
# ADVICE r9 #3: bench advisory field present in the emitted JSON schema
# ---------------------------------------------------------------------------


def test_bench_emits_median_advisory_and_mint_guard():
    """Static shape check (running the bench is the driver's job):
    bench.py must emit regressions_median on every run and refuse
    --mint-pins above the idle line."""
    from pathlib import Path

    src = (
        Path(__file__).resolve().parent.parent / "bench.py"
    ).read_text()
    assert '"regressions_median": regressions_median' in src
    assert "mint_refused" in src
    assert "--mint-pins" in src


# ---------------------------------------------------------------------------
# Persisted ANN index (VERDICT r9 #3): oracle differentials + the
# semantic pins the oracle can't express (replay idempotence, frozen
# codebooks, pointer protocol, vacuum)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "ann_index_store_census",
        "ann_index_recall_bound",
    ],
)
def test_oracle_differential(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def _census(df):
    rows = df.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pq_codes").alias("s"),
        F.sum("pq_id").alias("i"),
    )
    return sorted(tuple(r) for r in rows.collect())


def test_ann_index_append_replay_idempotent(spark, sf_dir, tmp_path):
    """Appending the same batch twice must converge to identical stored
    content (the foreachBatch replay contract), with a new version each
    time and the pointer always naming a complete version."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_codes,
        ann_index_meta,
        ann_index_vacuum,
    )
    from hadoop_map_reduce_spark.session import load_table
    from hadoop_map_reduce_spark.streaming import cdc_sink

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "idx")
    meta = ann_index_build(
        emb.filter(F.col("vec_id") % 3 != 0), idx, n_cells=8
    )
    base = _census(ann_index_codes(spark, idx))
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    v1 = ann_index_append(spark, idx, batch)
    after1 = _census(ann_index_codes(spark, idx))
    v2 = ann_index_append(spark, idx, batch)  # replay
    after2 = _census(ann_index_codes(spark, idx))
    assert v2 == v1 + 1
    assert after1 == after2 != base
    # frozen quantizers: append must not have retrained anything
    assert ann_index_meta(idx) == meta
    # time travel to the build version still reads the pre-append state
    assert _census(ann_index_codes(spark, idx, version=0)) == base
    # vacuum keeps the pointer target readable
    removed = ann_index_vacuum(idx, keep=1)
    assert 0 in removed
    assert _census(ann_index_codes(spark, idx)) == after2


def test_ann_index_append_upserts_on_id_collision(spark, tmp_path):
    """A re-embedded id replaces its code row (new wins), never
    duplicates it."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_codes,
    )

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    dim = 16
    corpus = vecs([(i, [float(i % 5)] * dim) for i in range(40)])
    idx = str(tmp_path / "idx")
    ann_index_build(corpus, idx, n_cells=4, m=2, ksub=4)
    moved = vecs([(7, [99.0] * dim)])
    ann_index_append(spark, idx, moved)
    stored = ann_index_codes(spark, idx)
    assert stored.count() == 40
    assert stored.filter(F.col("pq_id") == 7).count() == 1


def test_ann_index_search_matches_inline_ivfpq(spark, sf_dir, tmp_path):
    """Serving from disk must return exactly what the inline IVF-PQ
    pipeline returns with the same quantizers — persistence adds no
    approximation."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from hadoop_map_reduce_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk_adc,
    )
    from hadoop_map_reduce_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "idx")
    meta = ann_index_build(emb, idx, n_cells=8)
    served = ann_index_search(
        spark, idx, emb, queries, k=3, n_probe=3, refine=4
    )
    inline = ivfpq_topk_adc(
        ivfpq_encode(emb, meta["centroids"], meta["codebooks"]),
        emb,
        queries,
        meta["centroids"],
        meta["codebooks"],
        k=3,
        n_probe=3,
        refine=4,
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )


# ---------------------------------------------------------------------------
# Metadata-filtered ANN (VERDICT r9 #4): oracle differentials + the
# exactness, strategy-crossover, and plan pins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "ann_filtered_cell_census",
        "ann_filtered_recall_bound",
    ],
)
def test_filtered_ann_oracle_differential(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_filtered_ivf_exact_at_full_probe(spark, sf_dir):
    """Both strategies equal brute force on the filtered subset when
    every cell is probed — persistence of the predicate through either
    path adds no approximation beyond the probe cut."""
    from hadoop_map_reduce_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_filtered,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pred = F.col("label") % 2 == 0
    brute = sorted(
        map(tuple, cosine_topk(emb.filter(pred), queries, k=4).collect())
    )
    for strategy in ("pre", "post"):
        got = sorted(
            map(
                tuple,
                ivf_topk_filtered(
                    emb, queries, k=4, predicate=pred,
                    n_cells=8, n_probe=8, strategy=strategy,
                ).collect(),
            )
        )
        assert got == brute, strategy


def test_filtered_ivf_results_satisfy_predicate(spark, sf_dir):
    """No neighbor outside the filtered subset may ever surface, at any
    probe budget, under either strategy."""
    from hadoop_map_reduce_spark.operators.similarity import (
        ivf_topk_filtered,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    allowed = {
        r[0]
        for r in emb.filter(F.col("label") % 2 == 0)
        .select("vec_id")
        .collect()
    }
    for strategy in ("pre", "post"):
        got = ivf_topk_filtered(
            emb, queries, k=5, predicate=F.col("label") % 2 == 0,
            n_cells=8, n_probe=2, strategy=strategy,
        )
        neigh = {r["neighbor_id"] for r in got.collect()}
        assert neigh <= allowed, strategy


def test_filtered_ann_census_plan_prunes_before_probe(spark, sf_dir):
    """The pre-filter predicate must reach the parquet scan (pushed
    filter on label), not run after the assignment/probe machinery."""
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, sf_dir, "ann_filtered_cell_census")
    assert "PushedFilters" in plan
    assert "label" in plan.split("PushedFilters", 1)[1][:200]


def test_filtered_ivf_pre_plan_pushes_predicate(spark, sf_dir):
    from hadoop_map_reduce_spark.operators.similarity import (
        ivf_topk_filtered,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = ivf_topk_filtered(
        emb, queries, k=3, predicate=F.col("label") % 2 == 0,
        n_cells=4, n_probe=2, strategy="pre",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus scan carries the label predicate below the cell join
    assert "PushedFilters" in plan
    assert "label" in plan.split("PushedFilters", 1)[1][:200]


# ---------------------------------------------------------------------------
# PageRank to convergence (VERDICT r9 #5)
# ---------------------------------------------------------------------------


def test_pagerank_converged_oracle_differential(spark, sf_dir):
    compare_query(spark, sf_dir, "graph_pagerank_converged")


def test_pagerank_converged_matches_pure_python_fixpoint(spark, sf_dir):
    """Bit-exact recomputation of the Kleene integer fixpoint in pure
    Python over the same graph — pins the engine's arithmetic (floor
    div placement, damping split, from-zero start) independently of
    the SQL oracle."""
    from hadoop_map_reduce_spark.plans.graph_queries import (
        _PR_SCALE,
        _edges,
    )

    edges = [
        (r["src"], r["dst"]) for r in _edges(spark, sf_dir).collect()
    ]
    outdeg: dict[int, int] = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = sorted(outdeg)
    n = len(nodes)
    base15 = (15 * (_PR_SCALE // n)) // 100
    r = {v: 0 for v in nodes}
    for _ in range(200):
        acc = {v: 0 for v in nodes}
        for s, d in edges:
            acc[d] += r[s] // outdeg[s]
        nxt = {v: base15 + (85 * acc[v]) // 100 for v in nodes}
        if nxt == r:
            break
        r = nxt
    else:
        raise AssertionError("python replay did not converge")
    got = {
        row["node"]: row["rank_e9"]
        for row in REGISTRY["graph_pagerank_converged"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == r


# ---------------------------------------------------------------------------
# Streaming admission against the persisted index (VERDICT r9 #7)
# ---------------------------------------------------------------------------


def test_stream_ann_index_admission_oracle_differential(spark, sf_dir):
    compare_query(spark, sf_dir, "stream_ann_index_admission")


def test_ann_admitter_restart_reloads_frozen_quantizers(spark, sf_dir, tmp_path):
    """A NEW admitter instance over the same store must reload the
    frozen quantizers from meta.json (never retrain) and block exactly
    the same ids for the same batch."""
    from hadoop_map_reduce_spark.streaming.neardup import AnnIndexAdmitter

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    store = str(tmp_path / "store")
    a1 = AnnIndexAdmitter(store, threshold=0.4, n_cells=8, n_probe=4)
    a1.seed(emb.filter((F.col("vec_id") % 4).isin(2, 3)))
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    b1 = {
        r["vec_id"]
        for r in a1._blocked(
            a1._sig(batch), a1.read_store(spark)
        ).collect()
    }
    a2 = AnnIndexAdmitter(store, threshold=0.4, n_cells=8, n_probe=4)
    assert a2._load_meta() == a1._meta
    b2 = {
        r["vec_id"]
        for r in a2._blocked(
            a2._sig(batch), a2.read_store(spark)
        ).collect()
    }
    assert b1 == b2


def test_ann_admitter_replay_safe_against_compacted_store(spark, sf_dir, tmp_path):
    """The inherited compaction keeps AS-OF-batch replay semantics for
    the index-probing admitter too: after compacting through batch 0, a
    replay of batch 1 still sees exactly seed+b0 and admits the same
    set; the manifest converges."""
    from hadoop_map_reduce_spark.streaming.neardup import AnnIndexAdmitter

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    store = str(tmp_path / "store")
    adm = AnnIndexAdmitter(store, threshold=0.4, n_cells=8, n_probe=4)
    adm.seed(emb.filter((F.col("vec_id") % 4).isin(2, 3)))
    b0 = emb.filter(F.col("vec_id") % 4 == 0)
    b1 = emb.filter(F.col("vec_id") % 4 == 1)
    adm.apply_batch(b0, 0)
    adm.apply_batch(b1, 1)
    before = sorted(
        tuple(r) for r in adm.result(spark).collect()
    )
    merged = adm.compact_store(spark, through_batch=0)
    assert merged >= 1
    adm.apply_batch(b1, 1)  # replay batch 1 against the compacted store
    after = sorted(tuple(r) for r in adm.result(spark).collect())
    assert before == after


def test_ann_index_rebuild_is_crash_consistent(spark, tmp_path):
    """r10 review finding: every committed version must pair with the
    quantizers that encoded it. A re-build writes a NEW version (never
    overwriting the pointed-at one), an unflipped orphan version is
    invisible, and time-traveled reads decode with their own meta."""
    import os

    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_codes,
        ann_index_meta,
    )

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    dim = 16
    corpus = vecs([(i, [float(i % 7)] * dim) for i in range(40)])
    idx = str(tmp_path / "idx")
    m1 = ann_index_build(corpus, idx, n_cells=4, m=2, ksub=4)
    # re-build with DIFFERENT quantizer geometry -> new version
    m2 = ann_index_build(corpus, idx, n_cells=8, m=2, ksub=4)
    assert m2["n_cells"] == 8 and m1["n_cells"] == 4
    # pointer version carries the new meta; the old version still
    # carries ITS meta (time travel stays self-consistent)
    assert ann_index_meta(idx) == m2
    assert ann_index_meta(idx, version=0) == m1
    assert ann_index_codes(spark, idx, version=0).count() == 40
    # simulate a crash mid-rebuild: a durable but UNPOINTED version
    # (parquet + meta written, pointer not flipped) must stay invisible
    codes_dir = os.path.join(idx, "codes")
    v_new = os.path.join(codes_dir, "v=9")
    ann_index_codes(spark, idx).write.mode("overwrite").parquet(v_new)
    with open(os.path.join(v_new, "_meta.json"), "w") as fh:
        fh.write('{"torn": true}')
    assert ann_index_meta(idx) == m2  # pointer still -> v=1
    assert ann_index_codes(spark, idx).count() == 40
