"""Streaming near-duplicate admission in ``foreachBatch`` against an
append-only signature store — two similarity families behind one
harness: MinHash-LSH over text shingles (``NearDupAdmitter``) and
perceptual-hash Hamming blocking over media payloads
(``PhashAdmitter``).

Closes the loop between the batch incremental dedup
(``plans/curation_queries.py::dedup_incremental``) and the streaming CDC
sink (``streaming/cdc_sink.py``): arriving document micro-batches are
admitted iff they have no near-dup partner (exact trigram Jaccard >=
threshold, candidates from the same banded MinHash equi-join as
``operators.dedup.minhash_lsh_pairs``) in the signature STORE or earlier
(lower id) in their own batch — the greedy, non-recursive admission rule
an append-only ingestion pipeline applies per increment. Admitted
documents' signatures are appended to the store, so later batches are
deduped against everything admitted before them.

Store layout: one parquet subdirectory per increment
(``seed/``, ``b0/``, ``b1/`` …), read back as a glob — append-only
between compactions, no pointer. ``foreachBatch`` replays a failed
micro-batch with the same batch_id and the per-batch subdir is written
with mode=overwrite, so replay is idempotent (the ``cdc_sink``
exactly-once argument). ``compact_store`` periodically folds committed
increments back into ``seed`` (two-rename crash-safe swap), bounding
the directory count for a long-lived stream without changing what any
replayable batch can observe — see its docstring for the
replay-safety contract.

100-TB scale: signatures are computed ONCE per document ever (the store
is the asset); per-batch cost is the batch's shingle/signature pass plus
a band equi-join whose store side ships only slim ``(id, band, bhash)``
keys — proportional to the batch, never the corpus. State lives in the
store, not the streaming state store, so the stream itself is stateless
and restarts are cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.dedup import (
    lsh_blocked_ids,
    minhash_sig_table,
)


class IncrementalAdmitter:
    """Shared ``foreachBatch`` body + store bookkeeping for greedy
    streaming admission: subclasses define the per-document signature
    table (``_sig``) and the blocking rule over (batch, store)
    signature tables (``_blocked``); everything else — the append-only
    increment store, AS-OF-batch replay safety, the per-batch admitted
    manifest — is the same machinery whatever the similarity family.

    Admissions are written per batch as an idempotent parquet increment
    under ``<store_dir>/manifest/b<batch_id>`` — the same
    overwrite-on-replay discipline as the signature store, so nothing
    about the stream's admitted set ever lives in driver memory
    (round-3 carried an O(corpus) driver-side Python list here).
    ``result()`` reads the manifest back as a DataFrame.
    """

    def __init__(self, store_dir: str, id_col: str = "doc_id") -> None:
        self.store_dir = store_dir
        self.id_col = id_col
        self.manifest_dir = os.path.join(store_dir, "manifest")
        # Manifest id type: derived from the first seen batch/seed schema
        # so non-numeric (e.g. string) doc ids round-trip; "bigint" is
        # only the never-saw-data fallback for result()'s empty frame.
        self._id_type = "bigint"
        os.makedirs(store_dir, exist_ok=True)

    def _sig(self, docs: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _blocked(
        self, batch_sig: DataFrame, store_sig: DataFrame | None
    ) -> DataFrame:
        """Single-column DataFrame of blocked batch ids (named
        ``id_col``)."""
        raise NotImplementedError

    def _store_subdirs(self, before_batch: int | None = None) -> list[str]:
        """Committed store increments; with ``before_batch`` set, only
        the seed and increments of EARLIER batches. A replayed batch
        must see the store as it was before its first attempt — its own
        prior increment would otherwise (a) be overwritten while still
        being read and (b) block every previously admitted doc against
        itself at similarity 1.0."""
        out = []
        for d in os.listdir(self.store_dir):
            if d != "seed" and not (d.startswith("b") and d[1:].isdigit()):
                continue  # e.g. the manifest/ subtree
            if not os.path.exists(os.path.join(self.store_dir, d, "_SUCCESS")):
                continue
            if (
                before_batch is not None
                and d.startswith("b")
                and d[1:].isdigit()
                and int(d[1:]) >= before_batch
            ):
                continue
            out.append(os.path.join(self.store_dir, d))
        return sorted(out)

    def seed(self, docs: DataFrame) -> None:
        """Materialize the pre-existing corpus's signatures as the
        initial store increment (unconditionally — the seed corpus is
        taken as-is, like ``dedup_incremental``'s store side)."""
        self._id_type = docs.schema[self.id_col].dataType.simpleString()
        self._sig(docs).write.mode("overwrite").parquet(
            os.path.join(self.store_dir, "seed")
        )

    def read_store(
        self, spark: SparkSession, before_batch: int | None = None
    ) -> DataFrame | None:
        # Readers resolve crashed-compaction state too (cheap no-op in
        # the steady state): without this, a crash after the seed swap
        # would leave subsumed b* increments readable IN ADDITION to
        # the merged seed until the next compact_store call.
        self._heal_compaction()
        dirs = self._store_subdirs(before_batch)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Admit the micro-batch against store + itself, append admitted
        signatures as increment ``b<batch_id>`` and admitted ids as
        manifest increment ``manifest/b<batch_id>`` (both overwrite →
        idempotent replay). Nothing batch- or corpus-sized touches the
        driver: both outputs are executor-side parquet writes."""
        spark = batch_df.sparkSession
        batch_sig = self._sig(batch_df).persist()
        blocked = None
        try:
            # blocked feeds two anti-joins below; persist so the
            # store-vs-batch band join (whose store side scans every
            # prior increment) runs once per batch, not once per
            # consumer.
            blocked = self._blocked(
                batch_sig,
                self.read_store(spark, before_batch=int(batch_id)),
            ).persist()
            # Admission is decided over ALL batch ids: docs too short to
            # shingle have no signature, can never collide, and are
            # admitted (only their signatures — none — enter the store).
            admitted_ids = (
                batch_df.select(self.id_col).join(blocked, self.id_col, "left_anti")
            )
            admitted_sig = batch_sig.join(blocked, self.id_col, "left_anti")
            admitted_sig.write.mode("overwrite").parquet(
                os.path.join(self.store_dir, f"b{batch_id}")
            )
            # Manifest id keeps the batch's own id type (string doc ids
            # survive); recorded so result()'s empty case matches.
            self._id_type = batch_df.schema[self.id_col].dataType.simpleString()
            admitted_ids.select(
                F.col(self.id_col),
                F.lit(int(batch_id)).cast("long").alias("batch"),
            ).write.mode("overwrite").parquet(
                os.path.join(self.manifest_dir, f"b{batch_id}")
            )
        finally:
            # Release both cached frames even when a parquet write fails
            # mid-batch (mirrors bpe.py/clustering.py exception-safe
            # release discipline).
            if blocked is not None:
                blocked.unpersist()
            batch_sig.unpersist()

    def compact_store(
        self, spark: SparkSession, through_batch: int
    ) -> int:
        """Retention for the append-only signature store (VERDICT r8
        #6): merge ``seed`` + increments ``b0..b<through_batch>`` into
        one rewritten ``seed`` increment and delete the merged subdirs,
        so a long-lived stream's store stays O(corpus signatures), not
        O(corpus + one directory per micro-batch ever processed).

        Replay-safety contract: safe iff ``through_batch`` <= the
        stream's last CHECKPOINT-committed batch id. Structured
        Streaming replays only batches that were NOT committed, so no
        future ``read_store(before_batch=B)`` call with
        ``B <= through_batch`` can occur; for every possible replay
        (``B > through_batch``) the compacted seed holds exactly the
        increments that batch must see (seed + all earlier batches),
        bit-for-bit the same signature set as before compaction — the
        AS-OF-batch semantics are preserved by construction, and the
        replay test pins it against a compacted store.

        Crash safety (extends the ``storage.compact`` two-rename
        protocol to ALSO cover the post-swap window, r9 review
        finding; single-writer precondition as everywhere in this
        module): the merged increment is written to ``.seed_compact``
        together with a ``_THROUGH_BATCH`` marker file recording which
        increments it subsumes, then ``seed`` -> ``.seed_old``, tmp ->
        ``seed``, merged ``b*`` dirs deleted, backup deleted, marker
        removed LAST. Every call first heals any in-flight state:
        a durable tmp (has ``_SUCCESS`` + marker) is COMPLETED, a torn
        tmp is discarded, a stranded ``.seed_old`` is restored, and a
        marker still inside ``seed`` means the swap landed but the
        subsumed ``b*`` dirs may survive — they are deleted by the
        recorded bound, so a crash can never leave merged rows
        readable twice. Dot-prefixed names never match
        ``_store_subdirs``'s pattern, so in-flight state is invisible
        to readers.

        Returns the number of store increments merged away.
        """
        self._heal_compaction()
        tmp_dir = os.path.join(self.store_dir, ".seed_compact")
        merged = [
            d
            for d in self._store_subdirs()
            if os.path.basename(d) == "seed"
            or int(os.path.basename(d)[1:]) <= through_batch
        ]
        if len(merged) <= 1:
            return 0  # nothing to merge away
        spark.read.parquet(*merged).write.mode("overwrite").parquet(
            tmp_dir
        )
        # Marker written AFTER the parquet is durable: its presence is
        # the commit point — a tmp without it is torn and discarded.
        with open(os.path.join(tmp_dir, "_THROUGH_BATCH"), "w") as fh:
            fh.write(str(int(through_batch)))
        return self._finish_compaction()

    def _drop_merged(self, through_batch: int) -> int:
        import shutil

        n = 0
        for d in self._store_subdirs():
            name = os.path.basename(d)
            if name != "seed" and int(name[1:]) <= through_batch:
                shutil.rmtree(d)
                n += 1
        return n

    def _finish_compaction(self) -> int:
        """Complete a compaction whose durable artifact sits in
        ``.seed_compact``: swap it into place, drop the subsumed
        increments, clear the marker. Idempotent — callable from the
        heal path after a crash at any point past the commit point."""
        import shutil

        seed_dir = os.path.join(self.store_dir, "seed")
        old_dir = os.path.join(self.store_dir, ".seed_old")
        tmp_dir = os.path.join(self.store_dir, ".seed_compact")
        with open(os.path.join(tmp_dir, "_THROUGH_BATCH")) as fh:
            through_batch = int(fh.read().strip())
        if os.path.exists(seed_dir):
            if os.path.exists(old_dir):
                shutil.rmtree(old_dir)
            os.rename(seed_dir, old_dir)
        os.rename(tmp_dir, seed_dir)
        n = self._drop_merged(through_batch)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.remove(os.path.join(seed_dir, "_THROUGH_BATCH"))
        return n

    def _heal_compaction(self) -> None:
        """Resolve any crashed-compaction state before reading or
        compacting again. States, by surviving artifact:

        * durable ``.seed_compact`` (``_SUCCESS`` + marker): the
          compaction committed — complete it (idempotent);
        * torn ``.seed_compact`` (no marker): discard, originals are
          intact;
        * stranded ``.seed_old`` with no ``seed``: the pre-marker
          protocol's rename window — restore the backup;
        * marker inside ``seed``: the swap landed but cleanup was cut
          short — drop the subsumed ``b*`` dirs by the recorded bound
          (otherwise their rows would read DUPLICATED next to the
          merged seed) and clear the marker.
        """
        import shutil

        seed_dir = os.path.join(self.store_dir, "seed")
        old_dir = os.path.join(self.store_dir, ".seed_old")
        tmp_dir = os.path.join(self.store_dir, ".seed_compact")
        if os.path.isdir(tmp_dir):
            if os.path.exists(
                os.path.join(tmp_dir, "_SUCCESS")
            ) and os.path.exists(os.path.join(tmp_dir, "_THROUGH_BATCH")):
                self._finish_compaction()
                return
            shutil.rmtree(tmp_dir)
        if os.path.exists(old_dir):
            if not os.path.exists(seed_dir):
                os.rename(old_dir, seed_dir)
            else:
                shutil.rmtree(old_dir)
        marker = os.path.join(seed_dir, "_THROUGH_BATCH")
        if os.path.exists(marker):
            with open(marker) as fh:
                self._drop_merged(int(fh.read().strip()))
            os.remove(marker)

    def result(self, spark: SparkSession) -> DataFrame:
        """The admitted ``(id, batch)`` manifest, read back from the
        per-batch parquet increments (empty-schema DataFrame if no
        batch ever committed)."""
        dirs = sorted(
            os.path.join(self.manifest_dir, d)
            for d in (
                os.listdir(self.manifest_dir)
                if os.path.isdir(self.manifest_dir)
                else []
            )
            if os.path.exists(os.path.join(self.manifest_dir, d, "_SUCCESS"))
        )
        if not dirs:
            return spark.createDataFrame(
                [], f"{self.id_col} {self._id_type}, batch long"
            )
        return spark.read.parquet(*dirs)


class NearDupAdmitter(IncrementalAdmitter):
    """MinHash-LSH text admission: signatures are banded MinHash tables
    (``dedup.minhash_sig_table``), blocking is the banded candidate
    join + exact trigram-Jaccard verify (``dedup.lsh_blocked_ids``)."""

    def __init__(
        self,
        store_dir: str,
        threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 32,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        super().__init__(store_dir, id_col=id_col)
        self.threshold = threshold
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.text_col = text_col

    def _sig(self, docs: DataFrame) -> DataFrame:
        return minhash_sig_table(
            docs,
            n=self.n,
            num_hashes=self.num_hashes,
            text_col=self.text_col,
            id_col=self.id_col,
        )

    def _blocked(
        self, batch_sig: DataFrame, store_sig: DataFrame | None
    ) -> DataFrame:
        return lsh_blocked_ids(
            batch_sig,
            store_sig,
            self.threshold,
            bands=self.bands,
            num_hashes=self.num_hashes,
            id_col=self.id_col,
        )


class PhashAdmitter(IncrementalAdmitter):
    """Perceptual-hash media admission: signatures are 16-byte
    ``(id, phash)`` rows (``multimodal.perceptual_hash`` over the
    payload), blocking is the lossless pigeonhole band join + exact
    ``bit_count(xor)`` Hamming verify
    (``multimodal.phash_blocked_ids``) — so unlike the MinHash twin, NO
    recall assumption connects the engine to an exact-pair oracle: the
    banded candidates provably contain every pair within the
    threshold. The store is 4x slimmer than the MinHash signature
    store, which is the point at media-corpus scale."""

    def __init__(
        self,
        store_dir: str,
        max_hamming: int = 2,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        super().__init__(store_dir, id_col=id_col)
        self.max_hamming = max_hamming
        self.text_col = text_col

    def _sig(self, docs: DataFrame) -> DataFrame:
        from hadoop_map_reduce_spark.operators.multimodal import (
            perceptual_hash,
            with_binary_content,
        )

        media = with_binary_content(
            docs, text_col=self.text_col, id_col=self.id_col
        )
        return perceptual_hash(media).select(
            F.col("media_id").alias(self.id_col), "phash"
        )

    def _blocked(
        self, batch_sig: DataFrame, store_sig: DataFrame | None
    ) -> DataFrame:
        from hadoop_map_reduce_spark.operators.multimodal import (
            phash_blocked_ids,
        )

        as_media = lambda df: df.select(  # noqa: E731
            F.col(self.id_col).alias("media_id"), "phash"
        )
        return phash_blocked_ids(
            as_media(batch_sig),
            None if store_sig is None else as_media(store_sig),
            max_hamming=self.max_hamming,
        ).select(F.col("media_id").alias(self.id_col))


def run_neardup_stream(
    arrivals_dir: str,
    checkpoint_dir: str,
    admitter: IncrementalAdmitter,
    spark: SparkSession,
    schema,
) -> DataFrame:
    """Drive the admission stream to completion (availableNow, one file
    per trigger so increments process in arrival order) and return the
    admitted ``(doc_id, batch)`` manifest."""
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir)
        .writeStream.foreachBatch(admitter.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return admitter.result(spark)


class AnnIndexAdmitter(IncrementalAdmitter):
    """Embedding near-dup admission probing the persisted IVF-PQ index
    layout (round-10, VERDICT r9 #7): the signature store's rows ARE
    the ``operators/ann_index.py`` code rows — ``(vec_id, cell,
    pq_codes)`` encoded against quantizers FROZEN at seed time and
    persisted in the index's ``meta.json`` format — plus the float
    vector for the exact verify (a production deployment reads floats
    from the corpus table; carrying them in the store keeps the
    harness self-contained). Blocking is the IVF cut: an arriving
    vector probes its ``n_probe`` nearest cells and is exact-verified
    (round-6 cosine >= threshold) ONLY against store rows in those
    cells — per-batch cost ~n_probe/n_cells of the store, never the
    corpus, and the text/float payload of unprobed cells never joins.

    Unlike the MinHash twin, NO recall assumption connects engine to
    oracle: cell assignment and probe ranking run in exact 1e6
    micro-unit integer arithmetic (the ivf_cell_census device — d2
    terms <= (2.4e6)^2 * 64 ~ 3.7e14 << 2^53) on BOTH engines, and the
    oracle replays the probe rule itself, so the blocked set is
    bit-reproducible. Centroids are the md5-smallest ``n_cells`` SEED
    vectors (the cross-engine sampling device); codebooks train once
    at seed time and never retrain (the frozen-quantizer contract the
    persisted index serves under).
    """

    def __init__(
        self,
        store_dir: str,
        threshold: float = 0.4,
        n_cells: int | None = None,
        n_probe: int = 6,
        m: int = 8,
        ksub: int = 16,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        super().__init__(store_dir, id_col=id_col)
        self.threshold = threshold
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.m = m
        self.ksub = ksub
        self.vec_col = vec_col
        self._meta: dict | None = None

    # -- frozen quantizers -------------------------------------------------

    def _e6(self):
        return F.transform(
            F.col(self.vec_col).cast("array<double>"),
            lambda x: F.round(x * 1e6).cast("long"),
        )

    def _load_meta(self) -> dict:
        from hadoop_map_reduce_spark.operators.ann_index import (
            ann_index_meta,
        )

        if self._meta is None:
            self._meta = ann_index_meta(self.store_dir)
        return self._meta

    def seed(self, docs: DataFrame) -> None:
        """Freeze the quantizers on the seed corpus (md5-smallest
        ``n_cells`` e6 vectors as coarse centroids, driver-Lloyd
        residual codebooks), persist them as index metadata, then
        store the seed's encoded signatures — restarts reload the
        frozen quantizers from disk, never retrain."""
        from hadoop_map_reduce_spark.operators.ann_index import (
            auto_n_cells,
            write_index_meta,
        )
        from hadoop_map_reduce_spark.operators.pq import (
            ivfpq_train_codebooks,
        )

        if self.n_cells is None:
            # cells ∝ corpus (round-11, VERDICT r10 #5): the safe
            # behavior is now the DEFAULT behavior — the x10 audit
            # measured in-cell verify pairs super-linear (16.9x) at a
            # frozen 16-cell quantizer and linear (8.9x) with cells
            # scaled to the corpus. Sized from the SEED count; a
            # deployment expecting the admitted store to outgrow its
            # seed passes explicit cells for the EXPECTED corpus (the
            # frozen-quantizer contract — cells cannot be added later).
            self.n_cells = auto_n_cells(docs.count())
        e6d = self._e6().cast("array<double>")
        cent_rows = (
            docs.select(
                F.col(self.id_col).alias("_id"), e6d.alias("_v")
            )
            .orderBy(
                F.md5(F.col("_id").cast("string")), F.col("_id")
            )
            .limit(self.n_cells)
            .collect()
        )
        centroids = [list(r["_v"]) for r in cent_rows]
        books = ivfpq_train_codebooks(
            docs.select(F.col(self.id_col), e6d.alias("_e6d")),
            centroids,
            m=self.m,
            ksub=self.ksub,
            vec_col="_e6d",
            id_col=self.id_col,
        )
        self._meta = {
            "dim": len(centroids[0]),
            "n_cells": len(centroids),
            "m": self.m,
            "ksub": self.ksub,
            "centroids": centroids,
            "codebooks": books,
        }
        write_index_meta(self.store_dir, self._meta)
        super().seed(docs)

    # -- signature table: the persisted-index code row + the floats -------

    def _sig(self, docs: DataFrame) -> DataFrame:
        from hadoop_map_reduce_spark.operators.pq import ivfpq_encode

        meta = self._load_meta()
        # The raw float vector rides through the encode scan
        # (passthrough) — the exact verify needs it, and a join-back
        # onto the batch would pay one extra shuffle per micro-batch
        # for a column the same Arrow batch already held.
        enc = ivfpq_encode(
            docs.select(
                F.col(self.id_col),
                self._e6().cast("array<double>").alias("_e6d"),
                F.col(self.vec_col),
            ),
            meta["centroids"],
            meta["codebooks"],
            vec_col="_e6d",
            id_col=self.id_col,
            passthrough=(self.vec_col,),
        )
        return enc.select(
            F.col("pq_id").alias(self.id_col),
            "cell",
            "pq_codes",
            self.vec_col,
        )

    # -- blocking: probe the stored cells, exact-verify survivors ---------

    def _probes(self, docs_sig: DataFrame) -> DataFrame:
        """(id, probe_cell) — the n_probe nearest cells by exact
        integer e6 squared-L2, ties to the lower cell (one transform
        over the literal centroid array, the plan-size-safe argmin)."""
        meta = self._load_meta()
        cent_lit = F.array(
            *[
                F.array(*[F.lit(int(x)).cast("long") for x in c])
                for c in meta["centroids"]
            ]
        )
        e6 = self._e6()
        ranked = F.array_sort(
            F.transform(
                cent_lit,
                lambda cvec, i: F.struct(
                    F.aggregate(
                        F.zip_with(
                            e6, cvec, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    i.cast("int").alias("cell"),
                ),
            )
        )
        return docs_sig.select(
            F.col(self.id_col).alias("_bid"),
            F.col(self.vec_col).alias("_bvec"),
            F.explode(
                F.slice(ranked, 1, self.n_probe)["cell"]
            ).alias("cell"),
        )

    def _verify_blocked(self, cand: DataFrame) -> DataFrame:
        """Exact round-6 cosine verify of candidate pairs as ONE
        vectorized Arrow scan directly on the probe-join output (a map
        stage — no extra shuffle). The Column-HOF form evaluates
        interpreted at ~0.18 ms/pair, and in-cell candidate volume
        grows ~n²/n_cells — at a 20k-vector corpus that is ~19M pairs,
        an hour interpreted vs seconds vectorized (the r9 argmin rule's
        pairwise-scoring corollary). Summation-order ulp noise is
        absorbed by the proven round-6 device, same as the DuckDB
        oracle's own independent summation order."""
        import numpy as np

        threshold = self.threshold
        id_field = self.id_col

        def _verify(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                b = np.stack(pdf["_bvec"].to_numpy()).astype(np.float64)
                q = np.stack(pdf["_qvec"].to_numpy()).astype(np.float64)
                sims = np.round(
                    (b * q).sum(1)
                    / (
                        np.sqrt((b * b).sum(1))
                        * np.sqrt((q * q).sum(1))
                    ),
                    6,
                )
                out = pdf.loc[sims >= threshold, ["_bid"]]
                yield out.rename(columns={"_bid": id_field})

        id_type = cand.schema["_bid"].dataType.simpleString()
        return cand.select(
            F.col("_bid"),
            F.col("_bvec").cast("array<double>").alias("_bvec"),
            F.col("_qvec").cast("array<double>").alias("_qvec"),
        ).mapInPandas(_verify, schema=f"{id_field} {id_type}")

    def _blocked(
        self, batch_sig: DataFrame, store_sig: DataFrame | None
    ) -> DataFrame:
        probes = self._probes(batch_sig)
        sides = []
        if store_sig is not None:
            sides.append(
                store_sig.select(
                    F.col(self.id_col).alias("_qid"),
                    F.col("cell"),
                    F.col(self.vec_col).alias("_qvec"),
                )
            )
        # earlier (lower-id) rows of the batch itself block later ones
        sides.append(
            batch_sig.select(
                F.col(self.id_col).alias("_qid"),
                F.col("cell"),
                F.col(self.vec_col).alias("_qvec"),
            )
        )
        blocked = []
        for i, q in enumerate(sides):
            cond = (
                F.col("_qid") != F.col("_bid")
                if (store_sig is not None and i == 0)
                else F.col("_qid") < F.col("_bid")
            )
            cand = probes.join(q, "cell").filter(cond)
            blocked.append(self._verify_blocked(cand))
        out = blocked[0]
        for b in blocked[1:]:
            out = out.unionByName(b)
        return out.distinct()
