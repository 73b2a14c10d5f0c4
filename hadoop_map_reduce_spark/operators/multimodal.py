"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``modality`` tag and typed metadata, processed by Arrow-batched
``mapInPandas`` stages (the only place Python touches the data, and only
in vectorized batches).

The media DECODE step has two bodies behind one contract:
``use_real_decoder=True`` runs a real PIL decode (luminance-histogram
features, thumbnail resize) whenever PIL is importable and raises
``NotImplementedError`` when it is not (this container has no
PIL/ffmpeg/librosa); the default stub produces deterministic fake
features (a byte-value histogram) so the Spark-side contract — schema,
batching, partitioning, UDF signatures — is real and tested end-to-end
in any environment. The plan shape is identical either way;
``tests/test_multimodal.py`` exercises the real path under
``skipif(not _HAS_PIL)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders, if ever present in the image
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    PIL = None  # name always defined so tests can stub the decoder
    _HAS_PIL = False

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
    ]
)


def with_binary_content(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    modality: str = "image",
) -> DataFrame:
    """Stand-in media table: utf-8 bytes of ``text_col`` as the payload."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


def _histogram_features(payload: bytes, bins: int = 16) -> list[float]:
    """Deterministic fake 'decode': normalized byte-value histogram.

    STUB for a real image/audio feature extractor — replace with actual
    decode + embed when media libraries are available.
    """
    counts = [0] * bins
    for b in payload:
        counts[b % bins] += 1
    total = len(payload) or 1
    return [c / total for c in counts]


def _pil_image_features(payload: bytes, bins: int = 16) -> list[float]:
    """Real image decode path (only reachable when PIL is importable):
    decode the payload, convert to 8-bit luminance, and emit the
    normalized ``bins``-bucket luminance histogram — same schema and
    normalization as the byte stub, so downstream plans are identical
    whichever decoder ran. Undecodable payloads yield the all-zero
    vector (a real pipeline would route them to a quarantine sink)."""
    import io

    try:
        with PIL.Image.open(io.BytesIO(payload)) as img:
            lum = img.convert("L")
            hist256 = lum.histogram()  # 256 luminance buckets
    except Exception:
        return [0.0] * bins
    step = 256 // bins
    counts = [
        sum(hist256[i * step : (i + 1) * step]) for i in range(bins)
    ]
    total = sum(counts) or 1
    return [c / total for c in counts]


def extract_media_features(
    media: DataFrame, bins: int = 16, use_real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each Python call sees a whole Arrow batch; the
    per-row work is the decode itself, which is the irreducible Python
    part. Partitioning, schema, and batch flow are production-shaped.
    """
    if use_real_decoder and not _HAS_PIL:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "environment; use the deterministic stub (use_real_decoder=False)"
        )
    extract = (
        _pil_image_features if use_real_decoder else _histogram_features
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(
                        lambda b: extract(bytes(b), bins)
                    ),
                }
            )

    return media.mapInPandas(batches, MEDIA_FEATURE_SCHEMA)


def _real_dhash(b) -> int:
    """Classic image dHash of one payload (PIL path): grayscale-resize
    to an 8-wide x 9-tall grid, bit = left pixel < right neighbor,
    row-major. PIL's ``resize`` takes (width, height), so (8, 9) yields
    a (9, 8) array -> 9 rows x 7 adjacent-column comparisons = 63 bits,
    the same non-negative BIGINT domain as the byte-profile stub.
    Undecodable payloads hash to 0."""
    import io

    import numpy as np

    try:
        with PIL.Image.open(io.BytesIO(bytes(b))) as img:
            px = np.asarray(img.convert("L").resize((8, 9)), dtype=np.int64)
    except Exception:
        return 0
    bits = (px[:, :-1] < px[:, 1:]).astype(np.int64).ravel()
    return int((bits << np.arange(bits.size, dtype=np.int64)).sum())


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def perceptual_hash(
    media: DataFrame,
    buckets: int = 64,
    mult: int = 30,
    use_real_decoder: bool = False,
) -> DataFrame:
    """63-bit histogram-gradient perceptual hash over binary payloads —
    the aHash/dHash family applied to the payload's byte-bigram
    "intensity profile" instead of resized pixels (dHash itself is the
    gradient over a resized image's adjacent-pixel profile).

    ``use_real_decoder=True`` (requires PIL, raises
    ``NotImplementedError`` without it) runs the classic image dHash
    instead: decode, grayscale-resize to an 8-wide x 9-tall grid, bit =
    left pixel < right neighbor, row-major — 9 rows x 7 horizontal
    comparisons = 63 bits, the same non-negative BIGINT domain, schema,
    and plan as the byte-profile stub, so ``phash_near_dup`` composes
    with either. Undecodable payloads hash to 0 (route to quarantine in
    a real pipeline).

    Per payload: bucket every adjacent byte pair into
    ``(b[j]*mult + b[j+1]) % buckets``, count occurrences (NumPy
    ``bincount`` over the whole Arrow batch row — vectorized, no Python
    per-byte loop), then bit ``i`` (0..buckets-2) = 1 iff
    ``count[i] > count[i+1]``. The histogram is length-robust — a
    near-duplicate payload with a truncated or edited tail moves a few
    counts slightly, flipping only gradient bits whose neighbor counts
    were already close — unlike positional sampling, which scrambles
    under any length change. Result fits a non-negative BIGINT
    (63 gradient bits for the default 64 buckets).

    One straight ``mapInPandas`` scan: no shuffle, embarrassingly
    parallel — the 100-TB shape for fingerprinting a media corpus.
    Payloads under 2 bytes hash to 0 (no bigrams).
    """
    if buckets < 2 or buckets > 64:
        raise ValueError("buckets must be in [2, 64]")
    if use_real_decoder and not _HAS_PIL:
        raise NotImplementedError(
            "real image dHash requires PIL, not present in this "
            "environment; use the byte-profile hash (use_real_decoder="
            "False)"
        )

    import numpy as np

    shifts = np.arange(buckets - 1, dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def ph(b) -> int:
            if use_real_decoder:
                return _real_dhash(b)
            a = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
            if len(a) < 2:
                return 0
            k = (a[:-1] * mult + a[1:]) % buckets
            c = np.bincount(k, minlength=buckets)
            bits = (c[:-1] > c[1:]).astype(np.int64)
            return int((bits << shifts).sum())

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "phash": pd.Series(
                        [ph(b) for b in pdf["content"]], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(batches, PHASH_SCHEMA)


def _band_layout(max_hamming: int, hash_bits: int) -> tuple[list[int], list[int]]:
    """(widths, offsets) of the ``max_hamming + 1`` pigeonhole bands."""
    bands = max_hamming + 1
    if bands > hash_bits:
        raise ValueError("max_hamming + 1 bands need at least that many bits")
    base, extra = divmod(hash_bits, bands)
    widths = [base + (1 if i < extra else 0) for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]
    return widths, offsets


def _band_structs(max_hamming: int, hash_bits: int):
    """Column: array of (band_no, band_val) structs over ``phash`` —
    explode once per row instead of unioning per-band selects (a union
    re-executes the upstream hash scan per branch)."""
    widths, offsets = _band_layout(max_hamming, hash_bits)
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("band_no"),
                F.shiftright(F.col("phash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
                .alias("band_val"),
            )
            for i in range(len(widths))
        ]
    )


def _banded(hashes: DataFrame, max_hamming: int, hash_bits: int) -> DataFrame:
    return hashes.select(
        "media_id",
        "phash",
        F.explode(_band_structs(max_hamming, hash_bits)).alias("_b"),
    ).select("media_id", "phash", "_b.band_no", "_b.band_val")


def phash_blocked_ids(
    batch_hashes: DataFrame,
    store_hashes: DataFrame | None,
    max_hamming: int = 2,
    hash_bits: int = 63,
) -> DataFrame:
    """Batch ids BLOCKED by a perceptual-hash partner (Hamming <=
    ``max_hamming``) in the store, or by a lower-id partner within the
    batch — the greedy, non-recursive admission rule of the streaming
    near-dup admitters, factored over two ``(media_id, phash)`` tables.

    Unlike the MinHash twin (``dedup.lsh_blocked_ids``), the pigeonhole
    banding here is LOSSLESS for the threshold — no recall assumption
    connects the engine to an exact-pair oracle. Plan shape: band
    equi-joins batch x store plus a band self-join within the batch,
    ``bit_count(xor)`` exact verify on candidates only; the store side
    ships only 16-byte ``(id, hash)`` rows and cost is proportional to
    the BATCH — the per-increment property streaming admission needs
    against a 100-TB store."""
    bb = _banded(batch_hashes, max_hamming, hash_bits)
    hamming = F.bit_count(F.col("_hq").bitwiseXOR(F.col("_hb")))
    b_side = bb.select(
        F.col("media_id").alias("_blocked"),
        F.col("phash").alias("_hb"),
        "band_no",
        "band_val",
    )

    self_q = bb.select(
        F.col("media_id").alias("_q"),
        F.col("phash").alias("_hq"),
        "band_no",
        "band_val",
    )
    blocked = (
        b_side.join(self_q, ["band_no", "band_val"])
        .filter(F.col("_q") < F.col("_blocked"))
        .filter(hamming <= max_hamming)
        .select("_blocked")
    )
    if store_hashes is not None:
        sq = _banded(store_hashes, max_hamming, hash_bits).select(
            F.col("media_id").alias("_q"),
            F.col("phash").alias("_hq"),
            "band_no",
            "band_val",
        )
        blocked = blocked.unionAll(
            b_side.join(sq, ["band_no", "band_val"])
            .filter(hamming <= max_hamming)
            .select("_blocked")
        )
    return blocked.distinct().select(F.col("_blocked").alias("media_id"))


def phash_near_dup(
    hashes: DataFrame, max_hamming: int = 2, hash_bits: int = 63
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance,
    banded so no all-pairs product ever forms.

    Pigeonhole banding (the SimHash chunk argument): split the
    ``hash_bits`` into ``max_hamming + 1`` contiguous bands — two hashes
    within ``max_hamming`` differing bits MUST agree exactly on at least
    one band, so an equi-join on ``(band_no, band_val)`` yields a
    guaranteed superset of the answer; ``bit_count(xor)`` verifies the
    exact distance on candidates only. Band extraction is pure JVM
    column arithmetic (shift/mask); candidate volume scales with the
    per-band collision rate (~2^-21 for the default 3x21-bit bands on
    well-mixed bits), not with corpus². Skewed band values (a corpus of
    near-identical media) degrade toward the true duplicate-pair count,
    which is the output size anyway.

    Input: ``(media_id, phash)``. Output: ``(media_id_a, media_id_b,
    hamming)`` with ``media_id_a < media_id_b``, exact distance <=
    ``max_hamming``.
    """
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    # The hash table feeds both join sides — one-slot persist so the
    # upstream mapInPandas decode/hash scan runs ONCE, not once per
    # consumer branch (Catalyst never CSEs across branches; the
    # round-3 re-inlining trap, BASELINE.md). Banding is a single
    # explode over one struct array, not a per-band union of selects,
    # so the cached 16-byte rows fan out to band_count in-flight rows
    # without re-reading anything.
    hashes = cache_one_slot(
        hashes.select("media_id", "phash"), "phash_neardup_hashes"
    )
    banded = _banded(hashes, max_hamming, hash_bits)

    a = banded.select(
        F.col("media_id").alias("media_id_a"),
        F.col("phash").alias("_ha"),
        "band_no",
        "band_val",
    )
    b = banded.select(
        F.col("media_id").alias("media_id_b"),
        F.col("phash").alias("_hb"),
        "band_no",
        "band_val",
    )
    cands = (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select("media_id_a", "media_id_b", "_ha", "_hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cands.filter(hamming <= max_hamming)
        .select(
            "media_id_a",
            "media_id_b",
            hamming.cast("long").alias("hamming"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("target_px", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, target_px: int = 256, use_real_decoder: bool = False
) -> DataFrame:
    """'Resize' stage: downsample each payload to exactly ``target_px``
    bytes by deterministic stride sampling (stands in for
    decode→resize→re-encode; with PIL present, swap the per-batch body
    for ``Image.resize`` — the Arrow batch flow, schema, and typed
    target metadata stay identical).

    Payloads shorter than the target pass through unchanged — a real
    resizer would upsample, which the byte stub cannot fake honestly.
    Data-contraction contract, per path: the STUB caps each row at
    ``target_px`` bytes exactly; the REAL decoder path is bounded by the
    PNG encoding of a ``target_px``-boxed thumbnail (small-constant
    overhead on top of the pixel budget — a target_px=16 thumbnail emits
    ~100-byte PNGs, and payloads below that floor can expand slightly).
    Both paths make output size independent of input size, which is the
    property that makes running the stage early in a 100-TB media
    pipeline worthwhile; only the stub guarantees the literal byte cap.
    """
    if use_real_decoder and not _HAS_PIL:
        raise NotImplementedError(
            "real media resizing requires PIL, not present in this "
            "environment; use the deterministic stub (use_real_decoder=False)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def shrink(b) -> bytes:
            payload = bytes(b)
            if use_real_decoder:
                # Real path (PIL present): decode → thumbnail to a
                # target_px-wide bounding box → re-encode PNG. Same
                # contract as the stub: output bytes per row are
                # bounded, undecodable payloads pass through truncated.
                import io

                try:
                    with PIL.Image.open(io.BytesIO(payload)) as img:
                        img.thumbnail((target_px, target_px))
                        out = io.BytesIO()
                        img.save(out, format="PNG")
                        return out.getvalue()
                except Exception:
                    return payload[:target_px]
            if len(payload) <= target_px:
                return payload
            stride = len(payload) / target_px
            return bytes(
                payload[int(i * stride)] for i in range(target_px)
            )

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "target_px": pd.Series(
                        [target_px] * len(pdf), dtype="int64"
                    ),
                    "resized": pdf["content"].map(shrink),
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' stub: slice the payload every N bytes (stands in
    for video frame extraction; same fan-out shape: 1 row → M rows)."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(
            F.least(
                F.ceil(F.length("content") / every_n_bytes).cast("int") - 1,
                F.lit(max_frames - 1),
            ),
            F.lit(0),
        ),
    )
    exploded = media.select(
        "media_id", "modality", "content", F.explode(idx).alias("frame_no")
    )
    return exploded.select(
        "media_id",
        "modality",
        "frame_no",
        F.col("content")
        .substr(F.col("frame_no") * every_n_bytes + 1, F.lit(every_n_bytes))
        .alias("frame"),
    )


def _frame_phashes(
    media: DataFrame, every_n_bytes: int, max_frames: int
) -> DataFrame:
    """(_mid, _fno, phash) per sampled frame — the shared encode ->
    perceptual_hash -> decode ride used by frame_hash_matches and
    scene_cuts (r8 review: one copy of the id packing, not two).

    Synthetic per-frame id rides through perceptual_hash's
    (media_id, content) contract; decoded right back. pmod (not %,
    which keeps the dividend's sign) + exact long subtraction/div make
    the decode correct for negative media ids too; the only
    precondition is no long overflow in media_id * max_frames
    (|media_id| < 2^63 / max_frames — every real id scheme). Frames
    shorter than 2 bytes cannot carry a bigram profile and are
    excluded (their hash-0 would otherwise alias across media)."""
    frames = frame_sample(media, every_n_bytes, max_frames).filter(
        F.length("frame") >= 2
    )
    fr = frames.select(
        (F.col("media_id") * max_frames + F.col("frame_no")).alias(
            "media_id"
        ),
        "modality",
        F.col("frame").alias("content"),
    )
    # long `div`, not `/` (double division rounds above 2^53)
    return perceptual_hash(fr).select(
        F.expr(
            f"(media_id - pmod(media_id, {max_frames})) div {max_frames}"
        ).alias("_mid"),
        F.pmod(F.col("media_id"), F.lit(max_frames))
        .cast("long")
        .alias("_fno"),
        "phash",
    )


def frame_hash_matches(
    media: DataFrame,
    every_n_bytes: int = 128,
    max_frames: int = 8,
    hot_threshold: int = 50,
) -> DataFrame:
    """Video-style near-duplicate media pairs via frame fingerprints:
    sample frames (``frame_sample``), perceptual-hash each frame, then
    join media on IDENTICAL frame hashes through an inverted index —
    the production video-dedup shape (per-frame pHash postings), where
    two videos are near-dups when they share fingerprinted frames even
    if their containers/paddings differ.

    Scale discipline:
    - frames per media are bounded (``max_frames``), so the hash table
      is <= ``max_frames``x the media count at any corpus scale;
    - frame hashes seen in more than ``hot_threshold`` distinct media
      are dropped BEFORE the join (the stop-frame filter — black
      frames, title cards; here: boilerplate passages). This is the
      same hot-key discipline as tf-idf's df cut, and it bounds every
      posting list, so no join key explodes;
    - the hash table feeds three consumers (hot-count, both join
      sides): one-slot persisted, computed once.

    Output: ``(media_id_a, media_id_b, n_shared_frames)`` with
    ``media_id_a < media_id_b``; ``n_shared_frames`` counts matching
    frame PAIRS (a doc repeating a frame can contribute more than one
    pair per partner frame — the postings-join semantics).

    Frames shorter than 2 bytes cannot carry a bigram profile and are
    excluded (see _frame_phashes).
    """
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    h = cache_one_slot(
        _frame_phashes(media, every_n_bytes, max_frames),
        "frame_hash_matches",
    )
    hot = (
        h.groupBy("phash")
        .agg(F.countDistinct("_mid").alias("_nd"))
        .filter(F.col("_nd") > hot_threshold)
        .select("phash")
    )
    kept = h.join(F.broadcast(hot), "phash", "left_anti")
    a = kept.select(
        F.col("_mid").alias("media_id_a"), F.col("phash")
    )
    b = kept.select(
        F.col("_mid").alias("media_id_b"), F.col("phash")
    )
    return (
        a.join(b, "phash")
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .groupBy("media_id_a", "media_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_energy", LongType()),
    ]
)


WINDOW_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_no", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_window_energies(media: DataFrame, window: int = 256) -> DataFrame:
    """Per-window signal energy as ROWS (1 media row -> n_windows rows)
    — the fan-out twin of :func:`audio_energy`'s rollup, feeding
    downstream window-level analysis (activity segmentation, VAD-style
    gating). Same vectorized NumPy arithmetic (unsigned 8-bit PCM,
    center 128, ``add.reduceat`` per frame), all-integer, engine-exact;
    still a straight shuffle-free map — the fan-out happens inside the
    Arrow batch, bounded by payload size / window."""
    if window <= 0:
        raise ValueError("window must be positive")

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            wins: list[int] = []
            energies: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(
                    bytes(payload), dtype=np.uint8
                ).astype(np.int64)
                if not len(arr):
                    continue
                sq = (arr - 128) ** 2
                cuts = np.arange(0, len(sq), window)
                sums = np.add.reduceat(sq, cuts)
                ids.extend([int(mid)] * len(sums))
                wins.extend(range(len(sums)))
                energies.extend(int(s) for s in sums)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "win_no": pd.Series(wins, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, WINDOW_ENERGY_SCHEMA)


def audio_activity_segments(
    media: DataFrame, window: int = 256, threshold: int = 125_000
) -> DataFrame:
    """Activity segmentation over the windowed energy stream — the
    VAD-ish gaps-and-islands rollup: windows with ``energy >=
    threshold`` are active; consecutive active windows form a segment
    (``win_no - row_number`` per media is the island key, the standard
    O(1)-state formulation). Per media: window/active counts, segment
    count, and the longest active run. Every window is partitioned by
    ``media_id`` — bounded per media, never a global sort."""
    from pyspark.sql.window import Window as W

    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    # The energy table feeds two consumers (island rollup + window
    # totals) — one-slot persist so the mapInPandas scan runs once.
    e = cache_one_slot(
        audio_window_energies(media, window), "audio_activity_energies"
    )
    act = e.filter(F.col("energy") >= threshold)
    grp = act.withColumn(
        "_g",
        F.col("win_no")
        - F.row_number().over(
            W.partitionBy("media_id").orderBy("win_no")
        ),
    )
    seg = grp.groupBy("media_id", "_g").agg(
        F.count(F.lit(1)).alias("_run")
    )
    seg_stats = seg.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("_run").alias("longest_run"),
    )
    win_stats = e.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(
            F.when(F.col("energy") >= threshold, 1).otherwise(0)
        ).alias("n_active"),
    )
    return win_stats.join(seg_stats, "media_id", "left").select(
        "media_id",
        "n_windows",
        "n_active",
        F.coalesce(F.col("n_segments"), F.lit(0))
        .cast("long")
        .alias("n_segments"),
        F.coalesce(F.col("longest_run"), F.lit(0))
        .cast("long")
        .alias("longest_run"),
    )


def audio_energy(media: DataFrame, window: int = 256) -> DataFrame:
    """Windowed signal energy over binary payloads treated as unsigned
    8-bit PCM — REAL vectorized DSP, not a decode stub: NumPy
    ``frombuffer`` -> center at 128 -> square -> ``add.reduceat`` per
    ``window``-byte frame; all-integer, engine-exact. Per media row:
    window count, total energy, peak window energy.

    The frame loop never materializes per-window rows outside NumPy, so
    the operator is a straight map — no shuffle, embarrassingly
    parallel, the 100-TB shape for waveform featurization. A real codec
    would slot in before ``frombuffer`` without changing the plan.
    """
    if window <= 0:
        raise ValueError("window must be positive")

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stats(payload: bytes) -> tuple[int, int, int]:
            arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                np.int64
            )
            if not len(arr):
                return 0, 0, 0
            sq = (arr - 128) ** 2
            cuts = np.arange(0, len(sq), window)
            sums = np.add.reduceat(sq, cuts)
            return len(sums), int(sums.sum()), int(sums.max())

        for pdf in it:
            nw, te, pe = (
                zip(*(stats(b) for b in pdf["content"]))
                if len(pdf)
                else ((), (), ())
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_windows": pd.Series(nw, dtype="int64"),
                    "total_energy": pd.Series(te, dtype="int64"),
                    "peak_energy": pd.Series(pe, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, AUDIO_ENERGY_SCHEMA)


def scene_cuts(
    media: DataFrame,
    every_n_bytes: int = 128,
    max_frames: int = 8,
    max_hamming: int = 18,
) -> DataFrame:
    """Video scene segmentation over frame fingerprints: a scene
    boundary wherever consecutive frames' perceptual hashes differ by
    more than ``max_hamming`` bits (the standard shot-cut heuristic —
    adjacent frames within a shot share their hash neighborhood).

    Returns ``(media_id, n_frames, n_scenes, longest_scene)``. Same
    bounded fan-out as ``frame_hash_matches`` (frames per media capped
    by ``max_frames``; the same synthetic-id ride through
    ``perceptual_hash``); the segmentation itself is one media-
    partitioned window (lag + running cut-sum) and one aggregate —
    state never leaves the per-media partition, so the operator scales
    with the longest single video, not the corpus."""
    from pyspark.sql.window import Window

    h = _frame_phashes(media, every_n_bytes, max_frames)
    w = Window.partitionBy("_mid").orderBy("_fno")
    prev = F.lag("phash").over(w)
    is_cut = F.when(
        prev.isNull()
        | (F.bit_count(F.col("phash").bitwiseXOR(prev)) > max_hamming),
        F.lit(1),
    ).otherwise(F.lit(0))
    seg = h.select(
        "_mid",
        F.sum(is_cut).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("scene_id"),
    )
    per_scene = seg.groupBy("_mid", "scene_id").agg(
        F.count(F.lit(1)).alias("_sl")
    )
    return per_scene.groupBy(F.col("_mid").alias("media_id")).agg(
        F.sum("_sl").cast("long").alias("n_frames"),
        F.count(F.lit(1)).cast("long").alias("n_scenes"),
        F.max("_sl").cast("long").alias("longest_scene"),
    )
