"""Distributed exact total-order ranking — no single-partition sort.

``Window.orderBy`` with no partition key is the classic 100-TB scale
killer (the whole input sorts on ONE task); this operator computes the
same exact global row rank with the standard distributed recipe:

1. ``repartitionByRange(P, *order)`` — range-partition on the total
   order (P fixed; an explicit partition count also keeps AQE from
   re-coalescing, though contiguous coalescing would stay correct).
2. local ``row_number`` within each range partition,
3. per-partition row counts (≤ P rows) joined into prefix-sum offsets
   with a tiny non-equi self-join (build side ≤ P rows, broadcast),
4. global rank = partition offset + local rank; NTILE from the rank by
   the standard first-(N mod k)-buckets-get-one-extra rule.

Correctness requires a TOTAL order (include a unique tie-break column):
with distinct sort keys, every range split yields the same global ranks
regardless of where the boundaries land, so the result is invariant to
scan-split sizing and shuffle layout — pinned by the invariance sweep.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANGE_PARTS = 32


def with_global_rank(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "global_rank",
) -> DataFrame:
    """``df`` plus an exact 1-based global rank over ``order`` (which
    must be a total order — add a unique tie-break), computed without
    any single-partition exchange.

    The partition-id'd rows are eagerly ``localCheckpoint``ed before
    fanning out to the offsets subtree and the probe subtree:
    ``repartitionByRange`` samples its boundaries with a seed that
    involves the materialization's RDD id, so if the two consumers
    ever materialized the exchange independently (exchange reuse
    disabled, or a future plan divergence), their ``_pid`` assignments
    could disagree and the offsets would silently misalign. The
    barrier pins ONE partition assignment for both consumers —
    correctness by construction, not by optimizer courtesy. The
    checkpointed set is the ranking input (e.g. a per-user table), not
    the raw fact table."""
    ranked, _ = _ranked_with_counts(df, order, out)
    return ranked


def _ranked_with_counts(
    df: DataFrame, order: Sequence[Column], out: str
) -> tuple[DataFrame, DataFrame]:
    """(ranked rows, ≤P-row per-partition counts) — the counts are
    exposed so NTILE's total comes from a bounded aggregate instead of
    re-counting the ranked stream."""
    cols = list(df.columns)
    rp = df.repartitionByRange(_RANGE_PARTS, *order)
    local = (
        rp.select(*cols, F.spark_partition_id().alias("_pid"))
        .withColumn(
            "_lrank",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(*order)
            ),
        )
        .localCheckpoint(eager=True)
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(
            F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left"
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off")
        )
    )
    ranked = local.join(F.broadcast(offsets), "_pid").select(
        *cols, (F.col("_off") + F.col("_lrank")).alias(out)
    )
    return ranked, counts


def with_global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    n: int,
    out: str,
) -> DataFrame:
    """``df`` plus the exact SQL ``NTILE(n) OVER (ORDER BY order)``
    bucket (1-based), via :func:`with_global_rank` plus a broadcast
    1-row total. Bucket rule matches the SQL standard: with N rows the
    first ``N mod n`` buckets hold ``ceil(N/n)`` rows, the rest
    ``floor(N/n)``."""
    cols = list(df.columns)
    ranked, counts = _ranked_with_counts(df, order, "_grank")
    # Long `div`, not `/` — double division rounds above 2^53 rows,
    # which would misbucket on a 100-TB input (the _frame_phashes
    # discipline; r8 review finding).
    total = counts.groupBy().agg(F.sum("_cnt").alias("_n")).select(
        F.expr(f"_n div {n}").alias("_q"),
        (F.col("_n") % n).alias("_r"),
    )
    rank = F.col("_grank")
    big = (F.col("_q") + 1) * F.col("_r")  # rows in ceil-sized buckets
    bucket = F.when(
        rank <= big, F.expr("(_grank - 1) div (_q + 1)") + 1
    ).otherwise(
        F.col("_r")
        + 1
        + F.expr("(_grank - (_q + 1) * _r - 1) div greatest(_q, 1L)")
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        *cols, bucket.cast("long").alias(out)
    )
