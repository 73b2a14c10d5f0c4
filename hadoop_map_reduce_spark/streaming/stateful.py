"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in streaming aggregations can't express —
cross-batch running state with arbitrary Python update logic — Spark's
``applyInPandasWithState`` gives per-key state with Arrow-batched user
code. State lives in the state store partitioned by key (RocksDB-backed in
production), so this scales with keys across executors like any keyed
aggregation; the Python hop is per key-batch, not per row.

Spark 4's successor API (``transformWithStateInPandas``: typed
ValueState/ListState/MapState + timers) was evaluated and is
environment-blocked here: its driver-side state server requires the
``google.protobuf`` Python package, absent from this container
(verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The
operators below express the same cross-batch semantics on the stable
API; porting to transformWithState is mechanical once protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value_cents", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("maxv", DoubleType()),
    ]
)


def _update_running_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows for this key into persistent state and
    emit the updated running totals."""
    n, cents, maxv = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(pdf["value"].sum() * 100))
        if len(pdf):
            maxv = max(maxv, float(pdf["value"].max()))
    state.update((n, cents, maxv))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
            "max_value": [maxv],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-cents total, max) across batches.

    The custom-stateful-operator pattern: any cross-batch accumulator
    (session models, CUSUM detectors, dedup-with-TTL) slots into the same
    shape — swap the fold in ``_update_running_stats``.
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_running_stats,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("rn", LongType()),
        StructField("ewma_c", DoubleType()),
    ]
)

_EWMA_STATE = StructType(
    [
        StructField("y", DoubleType()),
        StructField("rn", LongType()),
    ]
)


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Continue the EWMA recurrence (alpha=1/2, y1=x1) across
    micro-batches: state carries (last y, rows seen); each batch's rows
    are folded in (ts, event_id) order with the same ``0.5*y + 0.5*x``
    float expression as the batch operator, so batch and stream emit
    bit-identical doubles. Correct only when batches arrive per-key
    time-ordered (true for the availableNow file-source harness; a
    production deployment buffers by watermark first).

    The batch's rows arrive as MULTIPLE Arrow chunks (split at
    arrow.maxRecordsPerBatch); a per-chunk sort would fold across the
    chunk boundary out of order, so the whole group is concatenated and
    sorted ONCE — mirroring the batch operator's group-wide sort."""
    y, rn = state.get if state.exists else (None, 0)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        out_y = []
        for x in pdf["value_c"].astype("float64"):
            y = x if y is None else 0.5 * y + 0.5 * x
            rn += 1
            out_y.append(y)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "rn": range(rn - len(out_y) + 1, rn + 1),
                "ewma_c": out_y,
            }
        )
    if y is not None:
        state.update((float(y), int(rn)))


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``timeseries_ewma`` recurrence."""
    return (
        events.select("user_id", "event_id", "ts", "value_c")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=EWMA_OUTPUT,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
