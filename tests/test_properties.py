"""Property-based tests (SURVEY.md §5.3): conservation laws and hash
invariants, driven by hypothesis over adversarial inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_map_reduce_spark.functions.hashing import (
    hadoop_partition,
    hadoop_text_hash,
)

# Pure-Python mirror of the engine's sanitize/tokenize semantics
# (ASCII regex classes, WordCountV2.java:76-83).


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"([^\s\w]|_)+", " ", text, flags=re.ASCII).lower().split()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_hadoop_hash_is_stable_int32(s):
    h = hadoop_text_hash(s)
    assert -(1 << 31) <= h < (1 << 31)
    assert hadoop_text_hash(s) == h  # deterministic


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100), st.integers(min_value=1, max_value=64))
def test_hadoop_partition_in_range(s, n):
    assert 0 <= hadoop_partition(s, n) < n


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=64))
def test_hadoop_hash_matches_java_semantics(s):
    """Independent recomputation: signed-byte polynomial, seed 1."""
    h = 1
    for b in s.encode("utf-8"):
        signed = b - 256 if b > 127 else b
        h = (h * 31 + signed) & 0xFFFFFFFF
    expected = h - (1 << 32) if h >= (1 << 31) else h
    assert hadoop_text_hash(s) == expected


# Spark-side conservation laws on a single materialized corpus (one Spark
# round-trip; hypothesis drives the pure-Python mirror above instead of
# spawning Spark jobs per example).

CORPUS = [
    "the quick brown fox",
    "hello,,, world___ again",
    "Zuñi bread-stuff recipé",
    "",
    "   ",
    "one",
    "a b c d e f g",
    "UPPER lower MiXeD",
    "digits 123 and 456x7",
    "tab\tseparated\tand  multi  space",
]


def test_bigram_count_conservation(spark):
    """Σ bigram counts == Σ per-record max(tokens-1, 0) (SURVEY §5.3)."""
    from hadoop_map_reduce_spark.operators.bigram import bigram_counts

    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    total = sum(
        r["cnt"] for r in bigram_counts(df).collect()
    )
    expected = sum(max(len(_py_tokens(t)) - 1, 0) for t in CORPUS)
    assert total == expected


def test_tokenize_matches_python_mirror(spark):
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = [
        r["toks"]
        for r in df.select(
            tokenize(sanitize(F.col("text"))).alias("toks")
        ).collect()
    ]
    assert got == [_py_tokens(t) for t in CORPUS]


def test_null_and_empty_text_flow_through(spark):
    """Nulls must flow, not throw: sanitize/tokenize/bigram/fingerprint."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.functions.text_analysis import fingerprint
    from hadoop_map_reduce_spark.operators.bigram import bigram_counts

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ok text here")], ["doc_id", "text"]
    )
    toks = df.select(
        "doc_id", tokenize(sanitize(F.col("text"))).alias("t"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in toks}
    assert by_id[1].t is None and by_id[1].fp is None
    assert by_id[2].t == [] and by_id[2].fp == 0
    assert by_id[3].t == ["ok", "text", "here"]

    counts = {r.bigram: r.cnt for r in bigram_counts(df).collect()}
    assert counts == {"ok+text": 1, "text+here": 1}


def test_null_embedding_cosine(spark):
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.functions.vectors import cosine_similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]),
         (2, None, [1.0, 0.0]),
         (3, [0.0, 0.0], [1.0, 0.0])],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r.id: r.sim
        for r in df.select(
            "id", cosine_similarity(F.col("a"), F.col("b")).alias("sim")
        ).collect()
    }
    assert rows[1] == 1.0
    assert rows[2] is None  # null vector -> null, not crash
    assert rows[3] is None  # zero vector -> null (guarded division)


# Skyline kernel: the incremental chunked frontier must equal the O(n²)
# dominance definition for any point multiset, any chunking.


def _brute_skyline(pts):
    import numpy as np

    M = np.array(pts, dtype=float)
    keep = []
    for i in range(len(M)):
        if not any(
            (M[j] <= M[i]).all() and (M[j] < M[i]).any()
            for j in range(len(M))
            if j != i
        ):
            keep.append(tuple(M[i]))
    return sorted(keep)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_skyline_kernel_matches_brute_force(pts, chunk):
    import numpy as np
    import pandas as pd

    from hadoop_map_reduce_spark.operators import skyline as sk

    kept, kept_m = None, None
    for lo in range(0, len(pts), chunk):
        part = pts[lo : lo + chunk]
        pdf = pd.DataFrame(part, columns=["x0", "x1"])
        m = pdf.to_numpy(dtype=np.float64)
        kept, kept_m = sk._frontier_update(kept, kept_m, pdf, m)
    got = sorted(
        (float(r.x0), float(r.x1)) for r in kept.itertuples()
    )
    # Duplicates: every copy of a frontier point survives, so compare
    # multisets of frontier members.
    expected_set = set(_brute_skyline(pts))
    expected = sorted(
        (float(a), float(b))
        for a, b in pts
        if (float(a), float(b)) in expected_set
    )
    assert got == expected


@settings(deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 63) - 1),
    st.sets(st.integers(min_value=0, max_value=62), max_size=2),
    st.integers(min_value=1, max_value=6),
)
def test_phash_band_layout_pigeonhole(h, flips, max_hamming):
    """The band layout must (a) partition all 63 bits disjointly and
    (b) satisfy the pigeonhole guarantee: any two hashes differing in
    <= max_hamming bits agree exactly on at least one band — the
    property phash_near_dup's candidate join is lossless BECAUSE of."""
    from hadoop_map_reduce_spark.operators.multimodal import _band_layout

    widths, offsets = _band_layout(max_hamming, 63)
    assert sum(widths) == 63
    assert offsets == sorted(offsets)
    covered = []
    for w, o in zip(widths, offsets):
        covered.extend(range(o, o + w))
    assert sorted(covered) == list(range(63))  # disjoint, complete

    if len(flips) > max_hamming:
        flips = set(list(flips)[:max_hamming])
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    bands_equal = [
        ((h >> o) & ((1 << w) - 1)) == ((h2 >> o) & ((1 << w) - 1))
        for w, o in zip(widths, offsets)
    ]
    assert any(bands_equal)


def test_interval_union_matches_python_sweep(spark):
    """interval_union_length == a pure-Python sweep-line union over 200
    seeded random intervals (overlaps, touches, nests, duplicates,
    empties, inversions) across 20 keys."""
    import random

    from hadoop_map_reduce_spark.operators.relational import (
        interval_union_length,
    )

    rng = random.Random(1306)
    rows = []
    for _ in range(200):
        k = f"k{rng.randrange(20)}"
        s = rng.randrange(-50, 50)
        e = s + rng.randrange(-3, 12)  # some empty/inverted on purpose
        rows.append((k, s, e))

    def sweep(iv):
        iv = sorted({(s, e) for s, e in iv if s < e})
        islands, cur_s, cur_e = [], None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append(cur_e - cur_s)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            islands.append(cur_e - cur_s)
        return (len(islands), sum(islands))

    by_key: dict[str, list[tuple[int, int]]] = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    want = {
        k: v
        for k, iv in by_key.items()
        for v in [sweep(iv)]
        if v[0] > 0
    }

    df = spark.createDataFrame(rows, ["k", "s", "e"])
    got = {
        r["k"]: (r["n_islands"], r["covered"])
        for r in interval_union_length(
            df, key_col="k", start_col="s", end_col="e"
        ).collect()
    }
    assert got == want


def test_bloom_parity_on_random_keysets(spark):
    """bloom_semi_join == plain left_semi over seeded random long keys
    including negatives and duplicates on both sides — the operator's
    exactness contract, independent of the TPC-H fixture."""
    import random

    from hadoop_map_reduce_spark.operators.bloom import bloom_semi_join

    rng = random.Random(99)
    probe = [(rng.randrange(-1000, 1000),) for _ in range(500)]
    build = [(rng.randrange(-1000, 1000),) for _ in range(80)]
    big = spark.createDataFrame(probe, "k: bigint")
    keys = spark.createDataFrame(build, "k: bigint")
    got = sorted(r["k"] for r in bloom_semi_join(
        big, keys, "k", n_bits=1 << 12, n_hashes=4
    ).collect())
    want = sorted(
        r["k"] for r in big.join(keys, "k", "left_semi").collect()
    )
    assert got == want and want


def test_byte_symbols_roundtrip_random_unicode(spark):
    """byte_symbols over 100 seeded random unicode strings: symbol
    count == UTF-8 byte length, and unhex-decode reproduces the
    string byte-for-byte."""
    import random

    import pyspark.sql.functions as F

    from hadoop_map_reduce_spark.operators.bpe import byte_symbols

    rng = random.Random(7)

    def rand_str():
        out = []
        for _ in range(rng.randrange(1, 24)):
            cp = rng.choice(
                [
                    rng.randrange(0x21, 0x7F),      # ASCII printable
                    rng.randrange(0xA1, 0x2FF),     # latin/IPA 2-byte
                    rng.randrange(0x4E00, 0x4FFF),  # CJK 3-byte
                    rng.randrange(0x1F300, 0x1F3FF),  # emoji 4-byte
                ]
            )
            out.append(chr(cp))
        return "".join(out)

    strs = [rand_str() for _ in range(100)]
    df = spark.createDataFrame([(s,) for s in strs], ["tok"])
    rows = df.select(
        "tok",
        F.size(byte_symbols(F.col("tok"))).alias("n_syms"),
        F.decode(
            F.unhex(F.concat_ws("", byte_symbols(F.col("tok")))), "UTF-8"
        ).alias("back"),
    ).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["n_syms"] == len(r["tok"].encode("utf-8"))
        assert r["back"] == r["tok"]
