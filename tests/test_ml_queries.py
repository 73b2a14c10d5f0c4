"""k-means: pure-Python recomputation oracle (exact, like the SimHash and
Hadoop-hash golden tests) plus the centroid query's DuckDB oracle."""

from __future__ import annotations

import math

import pytest

from hadoop_map_reduce_spark.plans import REGISTRY
from tests.oracle_utils import compare_query


def test_centroid_by_label_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, "embedding_centroid_by_label")


def _py_round_half_up(v: float) -> int:
    """Spark's ROUND on doubles: half away from zero (not banker's)."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _py_kmeans(rows, k=8, n_iter=5, scale=1_000_000):
    """Replay operators.ml.kmeans_lloyd exactly: same seed choice, same
    left-to-right distance fold, same first-occurrence argmin, same
    exact-integer centroid mean."""
    rows = sorted(rows, key=lambda r: r[0])
    centroids = [list(map(float, rows[i][1])) for i in range(k)]
    assign = {}
    for _ in range(n_iter):
        sums = [[0] * len(centroids[0]) for _ in range(k)]
        counts = [0] * k
        for vid, vec in rows:
            dists = []
            for c in centroids:
                acc = 0.0
                for x, y in zip(vec, c):
                    acc = acc + (float(x) - y) * (float(x) - y)
                dists.append(acc)
            ci = dists.index(min(dists))
            assign[vid] = ci
            counts[ci] += 1
            for p, x in enumerate(vec):
                sums[ci][p] += _py_round_half_up(float(x) * scale)
        for ci in range(k):
            if counts[ci]:
                for p in range(len(sums[ci])):
                    centroids[ci][p] = sums[ci][p] / counts[ci] / scale
    # final assignment with updated centroids
    for vid, vec in rows:
        dists = []
        for c in centroids:
            acc = 0.0
            for x, y in zip(vec, c):
                acc = acc + (float(x) - y) * (float(x) - y)
            dists.append(acc)
        assign[vid] = dists.index(min(dists))
    return assign, centroids


def test_kmeans_matches_pure_python_recomputation(spark, sf_dir):
    from hadoop_map_reduce_spark.operators.ml import kmeans_lloyd
    from hadoop_map_reduce_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_lloyd(emb, k=8, n_iter=5)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assigned.select("vec_id", "cluster").collect()
    }

    rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    want_assign, want_centroids = _py_kmeans(rows)

    assert got == want_assign
    for c_spark, c_py in zip(centroids, want_centroids):
        assert c_spark == pytest.approx(c_py, rel=0, abs=0)  # exact


def test_kmeans_query_shape(spark, sf_dir):
    df = REGISTRY["kmeans_embeddings"].fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["cluster", "n_vecs", "centroid_norm"]
    assert 1 <= len(rows) <= 8
    assert sum(r["n_vecs"] for r in rows) > 0
    assert all(r["centroid_norm"] is not None for r in rows)


def test_blas_assignment_matches_fold(spark, sf_dir):
    """The vectorized assignment twin must agree with the exact Catalyst
    fold on real data (they can differ only on exact distance ties)."""
    from hadoop_map_reduce_spark.operators.ml import (
        assign_clusters,
        assign_clusters_blas,
        kmeans_lloyd,
    )
    from hadoop_map_reduce_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, centroids = kmeans_lloyd(emb, k=8, n_iter=2)
    fold = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, centroids).select("vec_id", "cluster").collect()
    }
    blas = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_blas(emb, centroids)
        .select("vec_id", "cluster")
        .collect()
    }
    assert fold == blas
