"""Empty-input robustness: every operator family must return an empty
(not crashed, not null-schema'd) result when its input has no rows —
the guarantee that lets a scheduled 100 TB pipeline run on a day with
no new data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.session import load_table


@pytest.fixture(scope="module")
def empty_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(F.lit(False))


def test_exact_dedup_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import exact_dedup

    assert exact_dedup(empty_docs).count() == 0


def test_minhash_pairs_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import minhash_lsh_pairs

    assert minhash_lsh_pairs(empty_docs, threshold=0.5).count() == 0


def test_prefix_jaccard_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    assert ngram_jaccard_pairs_prefix(empty_docs, threshold=0.5).count() == 0


def test_cosine_topk_empty_corpus(spark, sf_dir):
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    empty = emb.filter(F.lit(False))
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert cosine_topk(empty, queries, k=5).count() == 0


def test_asof_join_empty_left(spark, sf_dir):
    from hadoop_map_reduce_spark.operators.relational import asof_join_backward

    events = load_table(spark, sf_dir, "events").filter(F.lit(False))
    orders = load_table(spark, sf_dir, "orders")
    out = asof_join_backward(
        events.select("event_id", "user_id", "ts"),
        orders.select("o_custkey", "o_orderdate", "o_orderkey"),
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey"],
    )
    assert out.count() == 0


def test_audit_empty_table_reports_zero_violations(spark, sf_dir):
    from hadoop_map_reduce_spark.operators.dq import audit

    orders = load_table(spark, sf_dir, "orders").filter(F.lit(False))
    out = audit(
        orders,
        {"null_key": F.col("o_orderkey").isNull()},
        unique_keys={"dup_key": ["o_orderkey"]},
    ).collect()
    assert {r.rule: r.n_violations for r in out} == {
        "null_key": 0,
        "dup_key": 0,
    }


def test_containment_prefix_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    assert containment_pairs_prefix(empty_docs, threshold=0.7).count() == 0


def test_lsh_blocked_ids_empty_batch_and_store(spark, empty_docs, sf_dir):
    from hadoop_map_reduce_spark.operators.dedup import (
        lsh_blocked_ids,
        minhash_sig_table,
    )

    empty_sig = minhash_sig_table(empty_docs)
    docs = load_table(spark, sf_dir, "documents").limit(20)
    full_sig = minhash_sig_table(docs)
    # Empty batch vs real store, real batch vs no store, empty vs empty.
    assert lsh_blocked_ids(empty_sig, full_sig, 0.5).count() == 0
    assert lsh_blocked_ids(empty_sig, None, 0.5).count() == 0
    assert lsh_blocked_ids(full_sig, empty_sig, 0.5).count() >= 0


def test_neardup_admitter_empty_batch(spark, empty_docs, sf_dir, tmp_path):
    """A micro-batch with no rows must admit nothing, write an (empty)
    idempotent increment, and leave the store readable."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.streaming.neardup import NearDupAdmitter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    admitter = NearDupAdmitter(str(tmp_path / "store"), threshold=0.5)
    admitter.seed(docs.filter((F.col("doc_id") % 4).isin(2, 3)).limit(50))
    admitter.apply_batch(empty_docs.select("doc_id", "text"), 0)
    assert admitter.result(spark).count() == 0
    assert admitter.read_store(spark).count() > 0  # seed intact


def test_winnow_pairs_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import winnow_pairs

    assert winnow_pairs(empty_docs, k=4, w=3, min_shared=1).count() == 0


def test_pair_attr_matrix_empty_pairs(spark, empty_docs):
    from hadoop_map_reduce_spark.operators.dedup import pair_attr_matrix

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert (
        pair_attr_matrix(
            pairs, empty_docs.select("doc_id", "source"), "source",
            "a", "b",
        ).count()
        == 0
    )


def test_salted_join_empty_sides(spark, sf_dir):
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.operators.relational import (
        salted_equi_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    assert (
        salted_equi_join(
            li.filter(F.lit(False)), part, "l_partkey", salts=4,
            salt_by="l_orderkey",
        ).count()
        == 0
    )
    assert (
        salted_equi_join(
            li, part.filter(F.lit(False)), "l_partkey", salts=4,
            salt_by="l_orderkey",
        ).count()
        == 0
    )


def test_funnel_agg_empty(spark, empty_docs):
    from hadoop_map_reduce_spark.plans.curation_queries import funnel_agg

    row = funnel_agg(empty_docs).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0)


def test_ivf_cell_census_empty_corpus_raises_clearly(spark):
    import pytest

    from hadoop_map_reduce_spark.operators.similarity import (
        ivf_cell_census,
    )

    empty = spark.createDataFrame(
        [], "vec_id: bigint, embedding: array<float>"
    )
    with pytest.raises(ValueError, match="no rows to sample"):
        ivf_cell_census(empty, n_cells=4)
