"""Persisted IVF-PQ vector index: build ONCE, serve from disk, append
increments against frozen codebooks.

Every ANN rung in ``operators/similarity.py`` / ``operators/pq.py``
re-derives its centroids/codebooks per run and re-encodes the corpus
inline — correct, but a production vector store amortizes that work:
the index (coarse centroids + shared residual codebooks + packed
~20-byte code rows) is built once, queries are answered from the STORED
codes with no retraining, and new vectors are encoded against the
FROZEN codebooks and appended (the standard IVFADC serving layout —
Jégou et al., TPAMI 2011; FAISS's on-disk IVF indexes follow the same
freeze-then-append discipline).

Layout under ``index_dir``::

    codes/                       # versioned packed-code table
        v=0/ …parquet + _meta.json  # build output + ITS quantizers
        v=1/ …parquet + _meta.json  # after first append (meta copied)
        _LATEST                  # one-line pointer file

The codes table reuses the ``streaming/cdc_sink.py`` version-directory
protocol (write new version, flip pointer; readers resolve the pointer
first, so they always see a complete version; ``vacuum`` drops
history). The quantizer ``_meta.json`` lives INSIDE each version
directory (tmp+rename), so the pointer flip commits the (meta, codes)
pair atomically: a crashed re-build can never pair new quantizers with
old code bytes — every committed version decodes with exactly the
quantizers that encoded it, including time-traveled reads.

Scale shape: build = one bounded training collect + one shuffle-free
Arrow encode scan + one parquet write; search = the ``ivfpq_topk_adc``
probe plan over the stored codes (cost independent of build — nothing
is retrained or re-encoded); append = encode ONLY the new batch + one
anti-join against the current version on the id (map-side broadcast
when the batch is small) + rewrite. At 100 TB the rewrite becomes a
partition-scoped rewrite exactly as cdc_sink documents; the pointer
protocol is unchanged.

Reference scope note: the reference engine (SURVEY.md §0) has no vector
search; this module is part of the demanded LLM-pipeline
generalization (similarity-search pillar, VERDICT r9 next-round #3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.pq import (
    ivfpq_coarse_centroids,
    ivfpq_encode,
    ivfpq_topk_adc,
    ivfpq_train_codebooks,
)
from hadoop_map_reduce_spark.streaming import cdc_sink

# Underscore prefix: Hadoop/Spark file listings treat _-prefixed names
# as metadata and skip them, so the quantizer JSON can live INSIDE a
# parquet version directory without tripping the footer reader.
_META = "_meta.json"

# Auto-scaled coarse quantizer (round-11, VERDICT r10 #5): cells are
# derived from a cheap corpus count as n // CELL_TARGET_ROWS (floored at
# CELL_MIN), holding per-cell occupancy ~constant — the cells ∝ corpus
# deployment rule BASELINE.md measured linear for the admission
# workload (in-cell candidate pairs grow ~n²/n_cells at a FROZEN cell
# count; re-measured 16.9x -> 8.9x at x10 once cells scaled with the
# corpus). Mirrors SemDeDup's auto-k (n/k invariant,
# plans/llm_queries3.dedup_semantic). Fixed-cell callers (the
# oracle-determinism censuses) pass n_cells explicitly.
CELL_TARGET_ROWS = 128
CELL_MIN = 4


def auto_n_cells(corpus_rows: int) -> int:
    """cells ∝ corpus: ``max(CELL_MIN, corpus_rows //
    CELL_TARGET_ROWS)``. Derived from whatever corpus the quantizer is
    TRAINED on — for a seed-once store expected to grow far past its
    seed, size for the expected corpus by passing an explicit
    ``n_cells`` (the quantizer is frozen; cells cannot be added
    later)."""
    return max(CELL_MIN, corpus_rows // CELL_TARGET_ROWS)


def _codes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "codes")


def ann_index_build(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int | None = None,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 3,
    train_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    metadata_cols: tuple[str, ...] = (),
) -> dict:
    """Train (or accept) the quantizers, encode ``corpus``, persist both.

    ``centroids``/``codebooks`` may be supplied pre-trained (the integer
    census path crafts them; a re-build against known quantizers does
    too) — otherwise the deterministic samplers/trainers from
    ``operators.pq`` run. Returns the metadata dict.

    ``metadata_cols`` (round-11, VERDICT r10 #1) names FILTERABLE
    corpus columns (``lang``, ``split``, ``label``, …) to store BESIDE
    the code rows: they ride the encode scan as passthrough columns, so
    a predicate over them prunes candidates at the stored-codes parquet
    scan itself during :func:`ann_index_search` — without them, a
    filtered search against the stored index cannot prune and must
    post-filter unfiltered probe candidates (the recall-degrading
    "post" shape ``similarity.ivf_topk_filtered`` documents). The
    column list is recorded in the quantizer meta; appends re-apply it
    so every version carries the same schema.

    Crash consistency (r10 review): the quantizers are persisted INSIDE
    the version directory they encoded, and the pointer flip is the one
    commit point for the (meta, codes) PAIR. A re-build over an
    existing committed index therefore writes a NEW version (never
    overwrites the pointed-at one), and a crash anywhere before the
    flip leaves the old pair fully consistent — a top-level meta file
    updated before the codes would otherwise pair new quantizers with
    old code bytes and decode garbage silently. An interrupted build
    leaves an uncommitted claim directory that fails the next commit
    fast (:class:`ConcurrentWriteError`, round-11 claim protocol);
    ``ann_index_vacuum`` removes it, after which the retry commits the
    same deterministic bytes.
    """
    if centroids is None:
        if n_cells is None:
            # cells ∝ corpus (one cheap count; the classic fixed-cell
            # footgun is a quantizer whose cells silently hold 10x the
            # rows they were sized for after the corpus grows)
            n_cells = auto_n_cells(corpus.count())
        centroids = ivfpq_coarse_centroids(
            corpus, n_cells=n_cells, vec_col=vec_col, id_col=id_col
        )
    if codebooks is None:
        codebooks = ivfpq_train_codebooks(
            corpus,
            centroids,
            m=m,
            ksub=ksub,
            n_iter=n_iter,
            train_rows=train_rows,
            vec_col=vec_col,
            id_col=id_col,
        )
    meta = {
        "dim": len(centroids[0]),
        "n_cells": len(centroids),
        "m": len(codebooks),
        "ksub": len(codebooks[0]),
        "centroids": centroids,
        "codebooks": codebooks,
        "metadata_cols": list(metadata_cols),
    }
    codes = ivfpq_encode(
        corpus,
        centroids,
        codebooks,
        vec_col=vec_col,
        id_col=id_col,
        passthrough=tuple(metadata_cols),
    )
    _commit_version(codes, _codes_dir(index_dir), meta)
    return meta


class ConcurrentWriteError(RuntimeError):
    """Two writers raced the single-writer version store: a lost update
    was DETECTED (not silently absorbed). The caller should re-read the
    committed state and retry its append against the new base."""


def _commit_version(codes: DataFrame, codes_dir: str, meta: dict) -> int:
    """Write ``codes`` + its quantizer meta as the NEXT version and flip
    the pointer LAST — the single commit point for the (meta, codes)
    pair. Returns the committed version number.

    Single-writer contract + lost-update detection (VERDICT r10 #3):
    the store assumes ONE writer; this function DETECTS the two ways a
    concurrent writer would otherwise silently lose an increment and
    raises :class:`ConcurrentWriteError` instead:

    * version claim — both writers read latest=N and both target N+1.
      ``os.mkdir`` of the version directory is the claim (atomic on
      POSIX: exactly one creator); the loser raises before writing a
      byte. Spark's committer then writes INTO the claimed directory
      (``mode("append")`` on an empty claim — "overwrite" would delete
      and recreate the claim, reopening the race window).
    * post-write re-list — a writer that claimed N+1 while we wrote
      N+1 is impossible, but one that committed N+2 after reading OUR
      in-progress N+1 would be rolled back by our pointer flip; re-list
      before flipping and raise if any later version committed.

    Detection, not mutual exclusion: a crashed claimant leaves an
    uncommitted (no ``_SUCCESS``) orphan directory that blocks the next
    version number until vacuumed — fail-fast and visible, never a
    silently dropped commit. Multi-writer coordination proper belongs
    to a lock service / transactional catalog (cdc_sink module note).
    """
    os.makedirs(codes_dir, exist_ok=True)
    versions = cdc_sink.list_versions(codes_dir)
    version = versions[-1] + 1 if versions else 0
    vdir = os.path.join(codes_dir, f"v={version}")
    try:
        os.mkdir(vdir)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version directory {vdir} already exists: another writer "
            "claimed this version number (or a crashed claim was never "
            "vacuumed) — re-read the store and retry"
        ) from None
    codes.write.mode("append").parquet(vdir)
    write_index_meta(vdir, meta)
    committed = cdc_sink.list_versions(codes_dir)
    if committed and committed[-1] > version:
        raise ConcurrentWriteError(
            f"version v={committed[-1]} committed while v={version} was "
            "being written; flipping the pointer would roll it back — "
            "re-read the store and retry"
        )
    cdc_sink.write_pointer(codes_dir, f"v={version}")
    return version


def write_index_meta(index_dir: str, meta: dict) -> None:
    """Atomically persist frozen quantizers into ``index_dir`` (tmp +
    rename). Inside a codes version directory this is half of the
    version-commit protocol (see :func:`_commit_version`); as a
    top-level file it serves seed-once stores (the streaming admitter)
    whose quantizers are frozen exactly once and never rebuilt."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, f".{_META}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(index_dir, _META))


def ann_index_meta(index_dir: str, version: int | None = None) -> dict:
    """The quantizers of the committed pointer version (or a retained
    historical ``version`` — always the ones that encoded those code
    bytes). Falls back to a top-level ``_meta.json`` for flat seed-once
    stores (the streaming admitter layout)."""
    codes_dir = _codes_dir(index_dir)
    if os.path.isdir(codes_dir):
        if version is None:
            with open(os.path.join(codes_dir, cdc_sink.POINTER)) as fh:
                vdir = fh.read().strip()
        else:
            vdir = f"v={version}"
        vpath = os.path.join(codes_dir, vdir, _META)
        with open(vpath) as fh:
            return json.load(fh)
    with open(os.path.join(index_dir, _META)) as fh:
        return json.load(fh)


def ann_index_codes(
    spark: SparkSession, index_dir: str, version: int | None = None
) -> DataFrame:
    """The stored ``(pq_id, cell, pq_codes)`` table at the committed
    pointer (or a retained historical ``version`` — time travel)."""
    return cdc_sink.read_target(spark, _codes_dir(index_dir), version)


def ann_index_append(
    spark: SparkSession,
    index_dir: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Encode ``new_vectors`` against the FROZEN quantizers and commit a
    new codes version = current ∪ new (new wins on id collision — the
    upsert semantics a re-embedded document needs). Returns the new
    version number.

    Idempotent by content: appending the same batch twice produces a
    second version with identical rows (the anti-join drops nothing on
    the first replay only because new wins — a re-run replaces the same
    ids with the same codes). Only the batch is ever encoded; the
    current version is read, never re-encoded.
    """
    meta = ann_index_meta(index_dir)
    codes_dir = _codes_dir(index_dir)
    current = cdc_sink.read_target(spark, codes_dir)
    batch = ivfpq_encode(
        new_vectors,
        meta["centroids"],
        meta["codebooks"],
        vec_col=vec_col,
        id_col=id_col,
        # Stored filterable metadata (if the build declared any) rides
        # every append too, so all versions share one schema and a
        # filtered search works across the whole build/append history.
        passthrough=tuple(meta.get("metadata_cols", ())),
    )
    from hadoop_map_reduce_spark.operators.relational import merge_upsert

    merged = merge_upsert(current, batch, on=["pq_id"])
    # The frozen quantizers ride into the new version directory, so
    # every committed version stays a self-consistent (meta, codes)
    # pair whatever later rebuilds do.
    return _commit_version(merged, codes_dir, meta)


def ann_index_vacuum(index_dir: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` committed code versions (never
    the pointer target) — cdc_sink.vacuum over the codes table."""
    return cdc_sink.vacuum(_codes_dir(index_dir), keep=keep)


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    predicate: Column | None = None,
    strategy: str = "pre",
) -> DataFrame:
    """Top-k served from the STORED index: probe + ADC over the
    committed codes version, exact cosine re-rank of the ``k * refine``
    survivors against ``corpus`` (the float vectors live in the source
    table — the index stores only ~20-byte code rows). No training, no
    corpus encode: search cost is independent of build cost.

    ``predicate`` (round-11, VERDICT r10 #1 — the production retrieval
    shape: "lang = 'en' AND split = 'train'" against the STORED index):
    a Column over the ``metadata_cols`` the build stored beside the
    codes, restricting results to matching corpus rows. Strategies as
    in ``similarity.ivf_topk_filtered`` (same names, same crossover):

    * ``"pre"`` (default) — the predicate filters the stored code rows
      BEFORE the ADC probe join, so it is pushed down to the codes
      parquet scan (plan-pinned: PushedFilters on the ``v=N`` scan
      below the join) and the per-cell candidate budget is spent
      entirely on rows the filter keeps — recall vs brute force ON THE
      FILTERED SUBSET is then predicate-independent.
    * ``"post"`` — probe unfiltered cells, discard non-matching
      candidates after the join (the layout that stored NO metadata
      would force; recall degrades with predicate selectivity). Kept
      for the crossover measurement; requires ``metadata_cols`` all
      the same (the predicate still evaluates against stored columns).
    """
    if strategy not in ("pre", "post"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    # Resolve the pointer ONCE and read meta + codes at that version,
    # so a concurrent rebuild between the two reads cannot hand us
    # mismatched quantizers and code bytes.
    with open(
        os.path.join(_codes_dir(index_dir), cdc_sink.POINTER)
    ) as fh:
        version = int(fh.read().strip().split("=", 1)[1])
    meta = ann_index_meta(index_dir, version=version)
    codes = ann_index_codes(spark, index_dir, version=version)
    keep_col = None
    if predicate is not None:
        if not meta.get("metadata_cols"):
            raise ValueError(
                "filtered search needs metadata_cols stored at build "
                "time (the index has no filterable columns to prune by)"
            )
        if strategy == "pre":
            codes = codes.filter(predicate)
        else:
            codes = codes.withColumn("_keep", predicate)
            keep_col = "_keep"
    return ivfpq_topk_adc(
        codes,
        corpus,
        queries,
        meta["centroids"],
        meta["codebooks"],
        k=k,
        n_probe=n_probe,
        refine=refine,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
        keep_col=keep_col,
    )
