"""Round-12 exactness pin for the hashed prefix-filter dedup family
(ADVICE r11 #1): the candidate stage keys on a 64-bit hash of each
shingle, and a within-document collision between two shingles BOTH
shared with the partner doc shrinks the hashed overlap — the round-11
bounds (stated on hashed sizes) could then prune a true pair before the
exact verify. The round-12 bounds budget for the per-doc merge count
``c = |A| - |H(A)|`` and must therefore be exact for ANY hash function.

These tests substitute a deliberately LOSSY hash (64-value range, so
almost every doc has many within-doc collisions) through the
``_cand_hash`` hook and compare the operators bit-for-bit against a
pure-Python all-pairs recomputation over the TRUE shingle sets. With
xxhash64 such collisions are astronomically unlikely at test scale —
which is exactly why exactness must be pinned with a hash where they
are the common case, not the impossible one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators import dedup
from hadoop_map_reduce_spark.operators.dedup import (
    containment_pairs_prefix,
    ngram_jaccard_pairs_prefix,
    with_shingles,
)
from hadoop_map_reduce_spark.session import load_table


@pytest.fixture()
def lossy_hash(monkeypatch):
    """Map every shingle into a 64-value universe: heavy within-doc AND
    cross-doc collisions by construction."""
    monkeypatch.setattr(
        dedup, "_cand_hash", lambda s: F.pmod(F.xxhash64(s), F.lit(64))
    )


@pytest.fixture(scope="module")
def docs_and_shingles(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(150)
        .cache()
    )
    sh = {
        r.doc_id: frozenset(r._sh) for r in with_shingles(docs).collect()
    }
    return docs, sh


def test_jaccard_prefix_exact_under_lossy_hash(
    spark, docs_and_shingles, lossy_hash
):
    docs, sh = docs_and_shingles
    t = 0.5
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_prefix(docs, t).collect()
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            jac = inter / len(sh[a] | sh[b])
            if round(jac, 6) >= t:
                want[(a, b)] = round(jac, 6)
    assert got == want
    assert len(want) > 0  # the corpus must actually exercise the path


def test_containment_prefix_exact_under_lossy_hash(
    spark, docs_and_shingles, lossy_hash
):
    docs, sh = docs_and_shingles
    t = 0.5
    got = {
        (r.id_small, r.id_big): (r.n_small, r.n_shared, r.containment)
        for r in containment_pairs_prefix(docs, t).collect()
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            small, big = (a, b) if len(sh[a]) <= len(sh[b]) else (b, a)
            ss, sg = sh[small], sh[big]
            inter = len(ss & sg)
            if inter / len(ss) >= t:
                want[(small, big)] = (
                    len(ss), inter, round(inter / len(ss), 6)
                )
    assert got == want
    assert len(want) > 0


def test_lossy_hash_fixture_actually_collides(docs_and_shingles):
    """Guard the guard: the corpus must contain docs with more than 64
    distinct shingles — by pigeonhole every such doc has within-doc
    merges under the 64-value hash, so the two tests above genuinely
    exercise the collision path (not just the injective case)."""
    _, sh = docs_and_shingles
    assert sum(1 for s in sh.values() if len(s) > 64) > 0
