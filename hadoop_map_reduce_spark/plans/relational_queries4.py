"""Fourth relational batch: RANGE window frames (time-based sliding
aggregates), interval/date arithmetic, and the cogrouped-pandas surface."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "window_range_frame",
    tags=("relational", "window"),
    description=(
        "Time-based sliding window: RANGE frame over event-time seconds "
        "(value total in the preceding hour per user)."
    ),
    oracle="""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY epoch(ts)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ) / 1e2 AS hour_total
        FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return events.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("hour_total"),
    )


@register(
    "scalar_interval_funcs",
    tags=("relational", "scalar"),
    description=(
        "Interval arithmetic and day differences (DataFrame API; the "
        "oracle mirrors semantics, not syntax — datediff argument order "
        "differs between engines)."
    ),
    oracle="""
        SELECT o.o_orderkey,
               o.o_orderdate + INTERVAL 3 MONTH AS due_date,
               o.o_orderdate - INTERVAL 7 DAY AS week_before,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS ship_lag_days
        FROM orders o JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 1
    """,
)
def scalar_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    joined = orders.join(li, li.l_orderkey == orders.o_orderkey)
    return joined.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAY")).alias("week_before"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("ship_lag_days"),
    )


@register(
    "array_posexplode",
    tags=("relational", "complex"),
    description="posexplode: array to (id, position, value) rows.",
    oracle="""
        SELECT e.vec_id,
               CAST(u.i - 1 AS INT) AS pos,
               ROUND(CAST(e.embedding[u.i] AS DOUBLE), 6) AS val
        FROM embeddings e, UNNEST(range(1, len(e.embedding) + 1)) AS u(i)
        WHERE e.vec_id < 50
    """,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "_v"),
    ).select("vec_id", "pos", F.round("_v", 6).alias("val"))


@register(
    "agg_collect_sorted",
    tags=("relational", "aggregation", "complex"),
    description=(
        "Array-building aggregates with deterministic (sorted) contents: "
        "collect_set/list are order-nondeterministic, so sort before "
        "comparing — the discipline any reproducible pipeline needs. The "
        "sorted set is emitted joined to a string so the result column is "
        "hashable (array cells break pandas-based canonicalization)."
    ),
    oracle="""
        SELECT l_returnflag,
               array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
                   AS statuses,
               CAST(len(list(DISTINCT l_suppkey)) AS INT) AS n_supps
        FROM lineitem GROUP BY 1
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.size(F.collect_set("l_suppkey")).alias("n_supps"),
    )


_COGROUP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_orders", LongType()),
    ]
)


def _summarize(key: tuple, events: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    """Arrow-batched cogroup fold: both sides of one key in pandas."""
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [len(events)],
            "n_orders": [len(orders)],
        }
    )


@register(
    "cogrouped_user_summary",
    tags=("llm", "udf"),
    description=(
        "cogroup.applyInPandas: per-key pandas fold over two tables "
        "(events x orders), oracle-checked against the join-of-aggregates "
        "equivalent. This is the UDF-surface demo, NOT the production "
        "path (the oracle's full-outer-join-of-aggregates is): a per-key "
        "Python fold over every user is a scale-killer at 100 TB, so the "
        "input is capped to a deterministic 1/16 user sample "
        "(user_id % 16 = 0) to keep the demo from being mistaken for a "
        "pipeline stage."
    ),
    oracle="""
        WITH e AS (SELECT user_id, COUNT(*) AS n_events
                   FROM events WHERE user_id % 16 = 0 GROUP BY 1),
             o AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
                   FROM orders WHERE o_custkey % 16 = 0 GROUP BY 1)
        SELECT COALESCE(e.user_id, o.user_id) AS user_id,
               COALESCE(e.n_events, 0) AS n_events,
               COALESCE(o.n_orders, 0) AS n_orders
        FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
)
def cogrouped_user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 16 == 0)
        .select("user_id", "event_id")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 16 == 0)
        .select(F.col("o_custkey").alias("user_id"), "o_orderkey")
    )
    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(_summarize, schema=_COGROUP_SCHEMA)
    )
