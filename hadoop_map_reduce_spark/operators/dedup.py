"""Deduplication operators for large-scale corpus curation.

Four families, all shuffle-conscious:

- exact: hash group on the full text (one shuffle; at 100 TB, group on a
  fingerprint/md5 instead of raw text to keep shuffle rows narrow).
- n-gram Jaccard: exact pairwise similarity over shingle sets. The
  oracle-checkable reference semantics; quadratic, so only for modest
  candidate sets — at scale it is the VERIFY stage after LSH blocking.
- MinHash + LSH: the scale path. Signatures via k independent affine
  permutations of 64-bit shingle hashes; banding turns near-dup search
  into an equi-join on (band, band-signature) — no cross join anywhere.
- SimHash: 64-bit fingerprints whose Hamming distance tracks cosine
  similarity of token multisets; chunk-banding gives the candidate join.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.functions.text import ngrams, sanitize, tokenize

# Mersenne prime 2^31-1 for affine minhash permutations: keeps every
# intermediate product < 2^62, safe in int64 under ANSI overflow checking.
_MINHASH_PRIME = (1 << 31) - 1


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One representative (min id) per distinct text value."""
    return df.groupBy(text_col).agg(F.min(id_col).alias(id_col))


def shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of the sanitized text."""
    return F.array_distinct(ngrams(tokenize(sanitize(text_col)), n=n, sep=" "))


def jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All unordered pairs with shingle-Jaccard >= threshold (exact).

    Quadratic in the input: use directly on small/blocked inputs, or as
    the verification stage after :func:`minhash_lsh_pairs`.
    """
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), n=n).alias("_sh")
    ).filter(F.size("_sh") >= 1)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MINHASH_PRIME), rng.randrange(0, _MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signature(
    shingle_col: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """Array of ``num_hashes`` minhash values over the shingle array.

    Shingle → stable 64-bit hash (xxhash64) → k affine permutations
    ``(a*h + b) mod p`` → per-permutation min. All inside one JVM
    expression tree; no UDFs, no extra shuffle.
    """
    params = _minhash_params(num_hashes, seed)
    # pmod (not abs+%) so Long.MIN_VALUE from xxhash64 cannot overflow.
    h = F.transform(
        shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_PRIME))
    )
    return F.array(
        *[
            F.array_min(
                F.transform(
                    h, lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_PRIME)
                )
            )
            for a, b in params
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Plan shape (scale-first): signatures are computed in one pass; each doc
    explodes to ``bands`` rows keyed by (band index, hash of the band's
    signature slice); candidates come from an equi-join on that key (the
    only shuffle that grows with corpus size); candidate pairs are then
    verified with exact shingle Jaccard. With b=16, r=4 the S-curve
    midpoint is ~(1/16)^(1/4) ≈ 0.5 — recall is high for J >= 0.5 and the
    verify stage removes false positives, so precision is exact.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), n=n).alias("_sh")
    ).filter(F.size("_sh") >= 1)
    sig = sh.select(
        F.col(id_col),
        F.col("_sh"),
        minhash_signature(F.col("_sh"), num_hashes, seed).alias("_sig"),
    )
    banded = sig.select(
        F.col(id_col),
        F.col("_sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("_sig"), i * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(id_col, "_sh", "_b.band", "_b.bhash")

    left = banded.select(
        F.col("band"), F.col("bhash"),
        F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"),
    )
    right = banded.select(
        F.col("band"), F.col("bhash"),
        F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"),
    )
    cands = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        cands.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document over token hashes.

    For each bit position, sum +1/-1 across token hashes and take the
    sign. Implemented as 64 conditional aggregations over an exploded
    token stream — one shuffle on the doc id, all JVM-side.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokenize(sanitize(F.col(text_col)))).alias("_tok"),
    ).withColumn("_h", F.xxhash64("_tok"))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), b).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(64)
        ]
    )
    # Assemble the fingerprint: set bit b when the bit-sum is positive.
    # Bit 63 contributes the sign term so the result stays a valid int64.
    fingerprint = None
    for b in range(64):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = bit * F.lit(1 << b).cast("long") if b < 63 else bit * F.lit(-(1 << 63))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs whose SimHash Hamming distance <= k.

    Banding: split the 64-bit fingerprint into (k+1) chunks; any pair
    within distance k agrees on at least one chunk (pigeonhole), so the
    candidate join is an equi-join on (chunk index, chunk value).
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = simhash64(df, text_col, id_col)
    banded = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND((1 << width) - 1)
                        .alias("cval"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_c"),
    ).select(id_col, "simhash", "_c.chunk", "_c.cval")
    left = banded.select(
        "chunk", "cval", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")
    )
    right = banded.select(
        "chunk", "cval", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        left.join(right, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
