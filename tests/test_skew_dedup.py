"""Hot-key robustness: dedup operators on a corpus where ONE text is
massively duplicated — the boilerplate-header scenario that makes naive
postings joins quadratic and skews any text-keyed shuffle.

Assertions are pure correctness (expected pair/cluster/representative
counts computed in closed form); the scale claim — that the prefix
filter keeps the hot shingle off the join keys — is pinned separately by
the plan/disposition notes in BASELINE.md.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.clustering import connected_components
from hadoop_map_reduce_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs_prefix,
)
from hadoop_map_reduce_spark.session import load_table

N_COPIES = 120


@pytest.fixture(scope="module")
def skewed_docs(spark, sf_dir):
    """Distinct base docs + N_COPIES verbatim copies of one document,
    with fresh ids above the base range."""
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 50)
        .limit(200)
    )
    hot_text = base.orderBy("doc_id").first()["text"]
    max_id = base.agg(F.max("doc_id")).first()[0]
    copies = spark.range(1, N_COPIES + 1).select(
        (F.col("id") + max_id).alias("doc_id"), F.lit(hot_text).alias("text")
    )
    df = base.unionByName(copies).cache()
    df.count()
    return df, hot_text


def test_exact_dedup_collapses_hot_text(spark, skewed_docs):
    df, hot_text = skewed_docs
    n_texts = df.select("text").distinct().count()
    reps = exact_dedup(df)
    assert reps.count() == n_texts
    # The hot text's representative is its minimum id (the base doc).
    hot_rep = reps.filter(F.col("text") == hot_text).first()
    assert hot_rep["doc_id"] == df.filter(F.col("text") == hot_text).agg(
        F.min("doc_id")
    ).first()[0]


def test_prefix_jaccard_finds_all_hot_pairs(spark, skewed_docs):
    df, hot_text = skewed_docs
    n_hot = df.filter(F.col("text") == hot_text).count()
    pairs = ngram_jaccard_pairs_prefix(df, threshold=0.95).cache()
    # Identical texts have Jaccard 1.0: all C(n_hot, 2) pairs must
    # surface even though every one shares every (hot) shingle.
    hot_ids = {
        r["doc_id"] for r in df.filter(F.col("text") == hot_text).collect()
    }
    hot_pairs = pairs.filter(
        F.col("id_a").isin(hot_ids) & F.col("id_b").isin(hot_ids)
    ).count()
    assert hot_pairs == n_hot * (n_hot - 1) // 2


def test_minhash_and_components_resolve_one_hot_cluster(spark, skewed_docs):
    df, hot_text = skewed_docs
    hot_ids = {
        r["doc_id"] for r in df.filter(F.col("text") == hot_text).collect()
    }
    pairs = minhash_lsh_pairs(df, threshold=0.9)
    comp = connected_components(pairs).cache()
    hot_comps = {
        r["component"]
        for r in comp.filter(F.col("node").isin(hot_ids)).collect()
    }
    # Every copy lands in ONE component, rooted no higher than the
    # minimum hot id (pre-existing near-dups of the hot text may join
    # the cluster and can even provide a smaller root — the synthetic
    # corpus contains organic near-duplicates).
    assert len(hot_comps) == 1
    root = hot_comps.pop()
    assert root <= min(hot_ids)
    members = comp.filter(F.col("component") == root).count()
    assert members >= len(hot_ids)
