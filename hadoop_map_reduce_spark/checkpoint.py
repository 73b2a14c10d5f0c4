"""Tracked eager localCheckpoint with an explicit release handle.

Iterative operators (BPE training, connected components, Lloyd k-means)
truncate their growing lineage with an eager ``localCheckpoint`` every
iteration. The checkpoint blocks are RDD-level persists, and
``DataFrame.unpersist()`` does NOT free them (it only uncaches
cache-manager entries — verified empirically on Spark 4: the persistent
RDD count is unchanged after ``df.unpersist()``). Without an explicit
release, n_iterations copies of the working set accumulate in
block-manager storage for the life of the session — on a 1000-executor
cluster iterating over a 100 TB working set, that is an executor-memory
leak, not a nicety.

The only reliable handle on the checkpoint blocks is the persisted RDD
registered in ``SparkContext.getPersistentRDDs`` during the checkpoint
call, so :func:`local_checkpoint` snapshots the persisted-id set around
the call and returns a ``release()`` closure that unpersists exactly the
ids the checkpoint created. After ``release()``, the checkpointed
DataFrame itself is unusable (its lineage was truncated) — callers must
only release iteration N's checkpoint after iteration N+1's checkpoint
has materialized (``eager=True`` guarantees that on return).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _persisted_ids(sc) -> set[int]:
    it = sc._jsc.sc().getPersistentRDDs().toList().iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _unpersist_ids(sc, ids: set[int]) -> None:
    if getattr(sc, "_jsc", None) is None:
        return  # context already stopped; its blocks died with it
    m = sc._jsc.sc().getPersistentRDDs()
    for rid in ids:
        if m.contains(rid):
            m.apply(rid).unpersist(False)


def local_checkpoint(df: DataFrame) -> tuple[DataFrame, Callable[[], None]]:
    """Eagerly localCheckpoint ``df``; return ``(checkpointed, release)``.

    ``release()`` frees the checkpoint's block-manager storage. It is
    idempotent and safe to call after the session has moved on, but the
    checkpointed DataFrame (and anything built on it that has not itself
    been materialized) must not be executed afterwards.
    """
    sc = df.sparkSession.sparkContext
    before = _persisted_ids(sc)
    cp = df.localCheckpoint(eager=True)
    created = _persisted_ids(sc) - before

    def release() -> None:
        _unpersist_ids(sc, created)

    return cp, release
