"""Streaming operators (Structured Streaming).

The reference is batch-only (``job.waitForCompletion``,
WordCountV2.java:60); these generalize its pipeline — and the engine's
event analytics — to unbounded input. Each transform is the SAME Column
pipeline as its batch twin (streaming/batch parity is tested by running
both over identical data), plus streaming-only state semantics:
watermarks bound state for late data, ``dropDuplicates`` keeps a keyed
state store, ``session_window`` implements gap-based sessions natively.

At scale: state is partitioned by the grouping key across executors
(RocksDB-backed state store in production deployments); watermark delay
is the knob trading late-data tolerance against state size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.functions.text import bigrams, sanitize, tokenize


def streaming_bigram_counts(
    lines: DataFrame, text_col: str = "value"
) -> DataFrame:
    """Unbounded twin of operators.bigram.bigram_counts (update mode).

    Same one-shuffle plan; the final HashAggregate becomes a stateful
    streaming aggregation keyed by bigram.
    """
    toks = tokenize(sanitize(F.col(text_col)))
    return (
        lines.select(toks.alias("_toks"))
        .filter(F.size("_toks") >= 2)
        .select(F.explode(bigrams(F.col("_toks"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window event counts/sums with a watermark for late data.

    Rows later than ``watermark_delay`` behind the max seen event time are
    dropped and their windows finalized — bounding state at O(active
    windows), not O(stream length).
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            (F.col("value_cents") / F.lit(100.0)).alias("total_value"),
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful keyed dedup over a stream: first occurrence of each key
    wins, even when later duplicates carry different timestamps.

    ``dropDuplicatesWithinWatermark`` evicts each key's state once the
    watermark passes it — duplicates farther apart than the delay are not
    suppressed (the batch exact-dedup operator is the exhaustive
    complement in a lambda/kappa layout).
    """
    return events.withWatermark(
        ts_col, watermark_delay
    ).dropDuplicatesWithinWatermark(key_cols)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows within ``lookback`` BEFORE
    each left row, same key.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's state store retains only the watermark+
    lookback window — the requirement for an unbounded-input join to run
    with bounded state.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    # Keep a single, unambiguous key column (the left one).
    return lw.join(rw, cond, "inner").drop(rw[key])


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions over a stream via native session windows.

    The streaming twin of operators.relational.sessionize: windows merge
    as events arrive and close once the watermark passes the gap.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
