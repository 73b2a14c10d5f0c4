"""Relational operators Spark lacks as single primitives, composed
scale-first from DataFrame ops (no Python UDFs, no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    right_on: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` for the same key.

    ``tolerance`` (an SQL interval literal, e.g. ``"INTERVAL 7 DAY"``)
    additionally requires ``right_time >= left_time - tolerance``: stale
    matches beyond the window come back as nulls, exactly like pandas
    ``merge_asof(tolerance=...)``. The bound is applied to the carried
    match AFTER the merge scan — interval arithmetic on the original
    timestamps, no epoch truncation — so the plan shape (one shuffle,
    linear) is unchanged.

    Scale-first design: instead of the naive inequality join (which
    explodes to |left| × |matching right| before aggregating), union the
    two streams tagged, sort within key by (time, tag), and carry the last
    seen payload forward with ``last(..., ignorenulls=True)`` — one shuffle
    on the key, linear work, no row explosion. This is the merge-join
    formulation of as-of.

    Ties: a right row at exactly ``left_time`` matches; among right rows
    with equal time the one with the greatest payload tuple (by the order
    of ``payload_cols``) wins, deterministically.

    Payload columns travel as ONE struct through a single
    ``last(ignorenulls=True)`` — carrying them independently would stitch
    fields from different right rows whenever the latest row holds a null
    in one payload column.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # __rt (the matched right row's time) rides first in the payload
    # struct for the tolerance check; equal-time right rows have equal
    # __rt, so the struct sort still tie-breaks on the payload columns.
    payload_type = (
        "struct<"
        + ",".join(
            [f"__rt:{rtypes[right_time]}"]
            + [f"{c}:{rtypes[c]}" for c in payload_cols]
        )
        + ">"
    )
    tagged_r = right.select(
        F.col(right_on or on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # Order right rows before left rows at the same instant (<= semantics);
    # among equal-time right rows the later payload overwrites the earlier,
    # so sort the payload struct ascending for a deterministic
    # "greatest wins".
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc(), F.col("_tag").asc(), F.col("_p").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).select(
        "*", F.last(F.col("_p"), ignorenulls=True).over(w).alias("_asof")
    )
    if tolerance is None:
        in_window = F.lit(True)
    else:
        in_window = F.col("_asof.__rt") >= F.col("_t") - F.expr(tolerance)
    out = merged.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(in_window, F.col(f"_asof.{c}")).alias(c)
            for c in payload_cols
        ],
    )
    return out


def sessionize(
    events: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (0-based per key). Classic lag → gap flag → running sum; two window
    passes over one key-partitioned sort, no state loops.
    """
    order = [F.col(time_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(time_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(time_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_flag = events.withColumn("_new_session", is_new)
    running = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_flag.withColumn(
        "session_id", (F.sum("_new_session").over(running) - 1).cast("long")
    ).drop("_new_session")


def top_k(df: DataFrame, k: int, *order_cols: Column) -> DataFrame:
    """Global top-k with a total order (caller supplies tie-breaking
    columns). Spark plans this as TakeOrderedAndProject — per-partition
    heaps then a k-row merge, no full sort of the data."""
    return df.orderBy(*order_cols).limit(k)


def merge_upsert(
    target: DataFrame, source: DataFrame, on: list[str]
) -> DataFrame:
    """MERGE/upsert semantics (WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED THEN INSERT *): source rows win on key collision, target rows
    survive otherwise. The engine-level operator behind CDC apply — Spark
    SQL's MERGE INTO statement needs a v2 catalog table (Delta/Iceberg),
    so the engine provides the same semantics over any DataFrame.

    Plan shape: one LEFT ANTI equi-join (target minus source keys) + a
    union — cheaper than the naive full-outer-join-plus-per-column-
    coalesce, which shuffles both sides AND evaluates width(columns)
    conditionals. The anti join broadcasts when the CDC batch is small
    (the common case: daily updates ≪ accumulated table), making the
    merge a map-only pass over the big target.

    Requires identical schemas (positional `unionByName`); dedupe the
    source on `on` first if a CDC batch can carry multiple versions of
    one key.
    """
    cond = None
    for k in on:
        clause = target[k].eqNullSafe(source[k])
        cond = clause if cond is None else cond & clause
    survivors = target.join(source, cond, "left_anti")
    return source.unionByName(survivors)


def apply_cdc(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Full CDC apply — :func:`merge_upsert` plus delete semantics.

    ``source`` carries an operation column (insert/update rows with any
    value, deletes marked ``delete_op``). Every target row whose key
    appears in the batch drops via one LEFT ANTI equi-join (only the
    batch's key columns are shipped — the broadcast stays slim no matter
    how wide the change rows are); non-delete batch rows are appended
    with ``op_col`` removed. Same map-only shape over the big target as
    merge_upsert; this is the GDPR-deletion / tombstone-apply path a
    long-lived 100-TB corpus store needs.

    Requires at most one source row per key (dedupe the batch to its
    latest version first, as any CDC consumer must). A NULL ``op_col``
    is applied as an upsert, never a delete — the null-safe filter below
    keeps malformed rows visible in the output instead of silently
    dropping the key (a plain ``!=`` would evaluate NULL and turn a
    missing op into a hard delete).
    """
    keys = source.select(*on).distinct()
    cond = None
    for k in on:
        clause = target[k].eqNullSafe(keys[k])
        cond = clause if cond is None else cond & clause
    survivors = target.join(keys, cond, "left_anti")
    upserts = source.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)
    return upserts.unionByName(survivors)
