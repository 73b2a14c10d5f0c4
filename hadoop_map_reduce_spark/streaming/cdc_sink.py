"""Streaming CDC-apply sink: foreachBatch + MERGE into a versioned
parquet target.

Spark's file sinks are append-only; applying a change stream (upserts)
to a keyed table needs ``foreachBatch`` plus a target that can be
atomically replaced per micro-batch. Without a transactional table
format this module implements the minimal version-directory scheme the
big table formats build on: each micro-batch merges into a NEW
``v=<batch_id>`` directory (via ``operators.relational.merge_upsert`` —
broadcast-anti-join + union, map-only over the big target) and then
flips a one-line ``_LATEST`` pointer file. Readers resolve the pointer
first, so they always see a complete version; a torn write can at worst
leave an orphan directory, never a half-visible table.

Exactly-once: Structured Streaming replays a failed micro-batch with the
SAME batch_id, and the merge + rewrite of ``v=<batch_id>`` is a pure
function of (previous version, batch), so replay converges to the same
bytes — idempotent apply, the same contract ``foreachBatch`` docs ask
sinks to provide.

At 100 TB you would swap the full-rewrite for a partition-scoped rewrite
(only partitions containing merged keys) — the pointer-flip protocol is
unchanged; this module keeps the protocol honest and the rewrite simple.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

POINTER = "_LATEST"


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, POINTER)


def init_target(df: DataFrame, table_dir: str) -> None:
    """Materialize the initial table state as version v=0."""
    df.write.mode("overwrite").parquet(os.path.join(table_dir, "v=0"))
    with open(_pointer_path(table_dir), "w") as f:
        f.write("v=0")


def read_target(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the currently-committed version (pointer indirection), or —
    time travel — any still-retained historical ``version`` number."""
    if version is None:
        with open(_pointer_path(table_dir)) as f:
            vdir = f.read().strip()
    else:
        vdir = f"v={version}"
    return spark.read.parquet(os.path.join(table_dir, vdir))


def list_versions(table_dir: str) -> list[int]:
    """Committed (complete) version numbers, ascending."""
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("v=")
        and os.path.exists(os.path.join(table_dir, d, "_SUCCESS"))
    )


def vacuum(table_dir: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` committed versions (never the
    pointer target). Returns the removed version numbers. The pointer is
    resolved before deleting so a concurrent reader of a retained
    version is never invalidated; readers of vacuumed history fail fast
    on a missing directory, the same contract table formats document."""
    import shutil

    with open(_pointer_path(table_dir)) as f:
        current = int(f.read().strip().split("=", 1)[1])
    versions = list_versions(table_dir)
    victims = [v for v in versions[:-keep] if v != current] if keep else [
        v for v in versions if v != current
    ]
    for v in victims:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"))
    return victims


def apply_cdc_stream(
    changes: DataFrame,
    table_dir: str,
    key_cols: list[str],
    trigger: dict | None = None,
):
    """Run the change stream to completion against the target table.

    ``changes`` is a streaming DataFrame of upsert rows (same schema as
    the target; rows with new keys insert, existing keys replace).
    Returns the StreamingQuery (already awaited for availableNow
    triggers).
    """
    from hadoop_map_reduce_spark.operators.relational import merge_upsert

    def _pre_state(spark: SparkSession, batch_id: int) -> DataFrame:
        """The state batch ``batch_id`` must apply onto: the largest
        COMMITTED version <= batch_id. Not the pointer — on replay the
        pointer may already be past this batch (flipped by a prior
        attempt), and reading it would both apply the batch twice and
        overwrite the directory being read. Orphan versions > batch_id
        from failed attempts are ignored and simply rewritten."""
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(table_dir)
            if d.startswith("v=")
            and os.path.exists(os.path.join(table_dir, d, "_SUCCESS"))
        )
        latest = max(v for v in versions if v <= batch_id)
        return spark.read.parquet(os.path.join(table_dir, f"v={latest}"))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        target = _pre_state(spark, batch_id)
        # Late-arriving duplicate keys within one batch: keep the last
        # occurrence is not well-defined on unordered batches, so merge
        # semantics require the batch itself to be key-unique.
        merged = merge_upsert(target, batch, on=key_cols)
        vdir = f"v={batch_id + 1}"
        merged.write.mode("overwrite").parquet(os.path.join(table_dir, vdir))
        with open(_pointer_path(table_dir), "w") as f:
            f.write(vdir)

    trigger = trigger or {"availableNow": True}
    q = changes.writeStream.foreachBatch(_apply).trigger(**trigger).start()
    if trigger.get("availableNow"):
        q.awaitTermination()
    return q
