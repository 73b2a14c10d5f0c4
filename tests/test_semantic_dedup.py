"""SemDeDup-style semantic dedup: exactness within blocks pinned against
the engine's oracle-verified exact pair operator restricted to the
pure-Python-recomputed k-means blocking (same standing as the k-means
recomputation test)."""

from __future__ import annotations

from hadoop_map_reduce_spark.operators.similarity import cosine_neardup_pairs
from hadoop_map_reduce_spark.plans import REGISTRY
from hadoop_map_reduce_spark.session import load_table
from tests.test_ml_queries import _py_kmeans


def test_pairs_are_exact_within_python_recomputed_clusters(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = REGISTRY["dedup_semantic"].fn(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b): (r.cluster, r.sim) for r in out}
    assert len(got) == len(out)  # pairs unique

    exact = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_neardup_pairs(emb, 0.4).collect()
    }
    rows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    # Mirror the registered query's auto-k (n/k held constant).
    from hadoop_map_reduce_spark.operators.similarity import (
        SEMANTIC_TARGET_CLUSTER_SIZE,
    )

    k = max(8, len(rows) // SEMANTIC_TARGET_CLUSTER_SIZE)
    assign, _ = _py_kmeans(rows, k=k)  # proven == kmeans_lloyd bit-for-bit
    want = {
        pair: sim
        for pair, sim in exact.items()
        if assign[pair[0]] == assign[pair[1]]
    }
    assert {p: s for p, (_, s) in got.items()} == want  # sims bit-equal
    for (id_a, _id_b), (cluster, _) in got.items():
        assert cluster == assign[id_a]
    assert len(want) > 0


def test_blocking_is_equi_join(spark, sf_dir):
    df = REGISTRY["dedup_semantic"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
