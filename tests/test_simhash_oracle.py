"""Independent pure-Python recomputation of the SimHash operator.

``dedup_simhash`` has no SQL oracle (DuckDB has no xxhash64), so the
driver only rows-checks it. This file is the compensating hard check: a
from-scratch Python implementation of XXH64 (public algorithm; Spark's
``xxhash64`` is XXH64 with seed 42 over the UTF-8 bytes) feeds a
from-scratch SimHash, and both the per-document fingerprints and the
banded candidate pairs must match the Spark operator exactly.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.dedup import (
    simhash64,
    simhash_neardup_pairs,
)
from hadoop_map_reduce_spark.session import load_table

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(acc: int, v: int) -> int:
    acc ^= _round(0, v)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (Cyan4973's public spec), returned as unsigned 64-bit."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _py_tokens(text: str) -> list[str]:
    # Mirror functions.text: ASCII \w (Java dialect), runs of non-word or
    # '_' collapse to one space, lowercase, whitespace split, drop empties.
    s = re.sub(r"([^\s\w]|_)+", " ", text, flags=re.ASCII).lower()
    return [t for t in re.split(r"\s+", s, flags=re.ASCII) if t != ""]


def _py_simhash(text: str) -> int:
    sums = [0] * 64
    for tok in _py_tokens(text):
        h = xxh64(tok.encode("utf-8"))
        for b in range(64):
            sums[b] += 1 if (h >> b) & 1 else -1
    u = 0
    for b in range(64):
        if sums[b] > 0:
            u |= 1 << b
    return _signed(u)


def test_python_xxh64_matches_spark(spark):
    toks = ["the", "quick", "brown", "ñ", "a" * 40, "", "12345678", "x" * 31]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["h"]
        for r in df.select("tok", F.xxhash64("tok").alias("h")).collect()
    }
    for t in toks:
        assert got[t] == _signed(xxh64(t.encode("utf-8"))), t


def test_simhash_fingerprints_match_pure_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    rows = docs.select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()
    }
    # Docs with zero tokens produce no exploded rows and drop out of the
    # Spark aggregate; mirror that.
    expected = {
        r["doc_id"]: _py_simhash(r["text"])
        for r in rows
        if _py_tokens(r["text"])
    }
    assert got == expected
    assert len(expected) > 0


def test_simhash_pairs_match_pure_python_banding(spark, sf_dir):
    max_hamming = 3
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs, max_hamming=max_hamming).collect()
    )
    fps = {
        r["doc_id"]: _py_simhash(r["text"])
        for r in docs.select("doc_id", "text").collect()
        if _py_tokens(r["text"])
    }
    chunks, width = max_hamming + 1, 64 // (max_hamming + 1)
    expected = []
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ua, ub = fps[a] & _MASK, fps[b] & _MASK
            shares_chunk = any(
                (ua >> (c * width)) & ((1 << width) - 1)
                == (ub >> (c * width)) & ((1 << width) - 1)
                for c in range(chunks)
            )
            ham = bin(ua ^ ub).count("1")
            if shares_chunk and ham <= max_hamming:
                expected.append((a, b, ham))
    assert got == sorted(expected)
