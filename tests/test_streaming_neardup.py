"""Streaming near-dup admission (streaming/neardup.py): foreachBatch
replay idempotency, store bookkeeping, and blocking-plan shape. The
end-to-end stream-vs-SQL-oracle check rides the streaming tag in
test_streaming_oracle.py; these tests pin the parts a green oracle
can't see."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.dedup import (
    lsh_blocked_ids,
    minhash_sig_table,
)
from hadoop_map_reduce_spark.session import load_table
from hadoop_map_reduce_spark.streaming.neardup import NearDupAdmitter


def test_apply_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Structured Streaming replays a failed micro-batch with the SAME
    batch_id; the admitter must converge to identical admissions and a
    store without duplicated increments."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    admitter = NearDupAdmitter(str(tmp_path / "store"), threshold=0.5)
    admitter.seed(docs.filter((F.col("doc_id") % 4).isin(2, 3)))
    batch0 = docs.filter(F.col("doc_id") % 4 == 0)

    admitter.apply_batch(batch0, 0)
    first = sorted(admitter.admitted)
    store_rows = admitter.read_store(spark).count()

    admitter.apply_batch(batch0, 0)  # replay
    assert sorted(admitter.admitted) == first
    assert admitter.read_store(spark).count() == store_rows
    assert sorted(os.listdir(tmp_path / "store")) == ["b0", "seed"]


def test_store_grows_only_with_admitted(spark, sf_dir, tmp_path):
    """Store increments contain exactly the admitted docs' signatures
    (short docs with no shingles are admitted but contribute none)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    admitter = NearDupAdmitter(str(tmp_path / "store"), threshold=0.5)
    admitter.seed(docs.filter((F.col("doc_id") % 4).isin(2, 3)))
    batch0 = docs.filter(F.col("doc_id") % 4 == 0)
    admitter.apply_batch(batch0, 0)

    admitted_ids = {i for i, b in admitter.admitted if b == 0}
    b0 = spark.read.parquet(str(tmp_path / "store" / "b0"))
    stored_ids = {r.doc_id for r in b0.select("doc_id").collect()}
    assert stored_ids <= admitted_ids
    # Every admitted doc long enough to shingle is stored.
    sig_ids = {
        r.doc_id
        for r in minhash_sig_table(batch0).select("doc_id").collect()
    }
    assert stored_ids == admitted_ids & sig_ids


def test_blocking_plan_has_no_cartesian(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch_sig = minhash_sig_table(docs.filter(F.col("doc_id") % 4 == 0))
    store_sig = minhash_sig_table(docs.filter(F.col("doc_id") % 4 != 0))
    blocked = lsh_blocked_ids(batch_sig, store_sig, 0.5)
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
