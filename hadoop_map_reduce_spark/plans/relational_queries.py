"""Generalized relational surface (SURVEY.md §7.3 M4): joins of every
flavor, aggregations (distinct / rollup / cube / grouping sets), SQL
windows, sort/limit/top-k, set ops, scalar function families, JSON,
sessionization — each as a DataFrame plan plus a DuckDB oracle.

Float discipline: cross-engine double aggregation differs in the last ulp
because partial-sum order differs. Per-row arithmetic over identical
doubles IS bit-identical, so every money aggregate goes through
round(expr * 10^k) → bigint → exact integer SUM → one final division.
Both sides use the same expression shape; results are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.operators.relational import (
    asof_join_backward,
    sessionize,
    top_k,
)
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


def _cents(expr: Column, scale: int) -> Column:
    """Per-row exact integer scaling of a fixed-decimal double."""
    return F.round(expr * scale, 0).cast("long")


def exact_sum(expr: Column, name: str, scale: int = 100) -> Column:
    """SUM of a k-decimal double, exact and engine-independent."""
    return (F.sum(_cents(expr, scale)) / F.lit(float(scale))).alias(name)


def exact_avg(expr: Column, name: str, scale: int = 100) -> Column:
    return (
        F.sum(_cents(expr, scale)) / F.lit(float(scale)) / F.count(F.lit(1))
    ).alias(name)


def _sql_sum(expr: str, name: str, scale: int = 100) -> str:
    return f"SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) / {scale}.0 AS {name}"


def _sql_avg(expr: str, name: str, scale: int = 100) -> str:
    return (
        f"SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) / {scale}.0 / COUNT(*)"
        f" AS {name}"
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    headline=True,
    tags=("relational", "aggregation"),
    description="TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates.",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               {_sql_sum('l_extendedprice', 'sum_base_price')},
               {_sql_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 10000)},
               {_sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 1000000)},
               {_sql_avg('l_quantity', 'avg_qty', 1)},
               {_sql_avg('l_extendedprice', 'avg_price')},
               {_sql_avg('l_discount', 'avg_disc')},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"), 1)).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            exact_sum(disc_price, "sum_disc_price", 10000),
            exact_sum(charge, "sum_charge", 1000000),
            exact_avg(F.col("l_quantity"), "avg_qty", 1),
            exact_avg(F.col("l_extendedprice"), "avg_price"),
            exact_avg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    headline=True,
    tags=("relational", "join", "topk"),
    description=(
        "TPC-H Q3 shape: 3-way join (broadcast dim), grouped revenue, "
        "deterministic top-10."
    ),
    oracle=f"""
        SELECT l.l_orderkey AS o_orderkey, o.o_orderdate, o.o_orderpriority,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 10000)}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(cust, orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy(
        F.col("l_orderkey").alias("o_orderkey"), "o_orderdate", "o_orderpriority"
    ).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 10000)
    )
    return top_k(agg, 10, F.col("revenue").desc(), F.col("o_orderkey").asc())


@register(
    "q5_local_supplier",
    headline=True,
    tags=("relational", "join"),
    description="TPC-H Q5 shape: 6-way star join with co-located key filter.",
    oracle=f"""
        SELECT n.n_name,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 10000)}
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 10000)
    )


@register(
    "q6_forecast_revenue",
    tags=("relational", "aggregation"),
    description="TPC-H Q6 shape: multi-predicate scan, single global agg.",
    oracle=f"""
        SELECT {_sql_sum('l_extendedprice * l_discount', 'revenue', 10000)}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 10
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 10)
        ).agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 10000))
    )


# ---------------------------------------------------------------------------
# Join flavors
# ---------------------------------------------------------------------------


@register(
    "join_semi",
    tags=("relational", "join"),
    description="Left-semi join: customers holding at least one open order.",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    tags=("relational", "join"),
    description="Left-anti join: customers holding no 'P'-status order.",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    p_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return cust.join(
        p_orders, cust.c_custkey == p_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer",
    tags=("relational", "join"),
    description="Full outer join with null-producing sides.",
    oracle="""
        SELECT n.n_name, s.s_name
        FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return nation.join(
        supp, supp.s_nationkey == nation.n_nationkey, "full_outer"
    ).select("n_name", "s_name")


@register(
    "join_cross",
    tags=("relational", "join"),
    description="Cross join (cartesian) over two small inputs.",
    oracle="""
        SELECT r1.r_name AS a, r2.r_name AS b
        FROM region r1 CROSS JOIN region r2
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    return r.select(F.col("r_name").alias("a")).crossJoin(
        r.select(F.col("r_name").alias("b"))
    )


@register(
    "join_range_bucket",
    tags=("relational", "join"),
    description="Non-equi (range/theta) join against broadcast bucket bounds.",
    oracle="""
        WITH buckets(bucket, lo, hi) AS (
            VALUES ('low', 0, 10), ('mid', 10, 25), ('high', 25, 100)
        )
        SELECT b.bucket, COUNT(*) AS cnt
        FROM lineitem l JOIN buckets b
          ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        GROUP BY 1
    """,
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    buckets = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 25), ("high", 25, 100)],
        ["bucket", "lo", "hi"],
    )
    return (
        li.join(
            F.broadcast(buckets),
            (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "join_asof",
    headline=True,
    tags=("relational", "join", "asof"),
    description=(
        "Backward as-of join (merge formulation, one shuffle): each event "
        "matched to the user's latest order at-or-before the event."
    ),
    oracle="""
        WITH m AS (
            SELECT e.event_id, e.user_id, e.ts, MAX(o.o_orderdate) AS o_orderdate
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY 1, 2, 3
        )
        SELECT m.event_id, m.user_id, m.ts, m.o_orderdate,
               MAX(o.o_orderkey) AS o_orderkey
        FROM m LEFT JOIN orders o
          ON o.o_custkey = m.user_id AND o.o_orderdate = m.o_orderdate
        GROUP BY 1, 2, 3, 4
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    return asof_join_backward(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderdate", "o_orderkey"],
    ).select("event_id", "user_id", "ts", "o_orderdate", "o_orderkey")


# ---------------------------------------------------------------------------
# Aggregation flavors
# ---------------------------------------------------------------------------


@register(
    "agg_distinct",
    tags=("relational", "aggregation"),
    description="COUNT(DISTINCT) per group.",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    tags=("relational", "aggregation"),
    description="ROLLUP over the region→nation hierarchy.",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               COUNT(*) AS n_customers,
               {_sql_sum('c.c_acctbal', 'total_acctbal')}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        exact_sum(F.col("c_acctbal"), "total_acctbal"),
    )


@register(
    "agg_cube",
    tags=("relational", "aggregation"),
    description="CUBE over two independent dimensions.",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {_sql_sum('o_totalprice', 'total_price')}
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "agg_grouping_sets",
    tags=("relational", "aggregation"),
    description="Explicit GROUPING SETS (Spark SQL surface).",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "having_brand_counts",
    tags=("relational", "aggregation"),
    description="Post-aggregation HAVING filter.",
    oracle="""
        SELECT p_brand, COUNT(*) AS cnt FROM part
        GROUP BY 1 HAVING COUNT(*) >= 5
    """,
)
def having_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@register(
    "distinct_rows",
    tags=("relational",),
    description="DISTINCT projection.",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    tags=("relational", "window"),
    description="row_number / rank / dense_rank per partition.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(ROW_NUMBER() OVER w1 AS BIGINT) AS rn,
               CAST(RANK() OVER w2 AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w2 AS BIGINT) AS drnk
        FROM orders
        WINDOW w1 AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC),
               w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w2 = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w1).cast("long").alias("rn"),
        F.rank().over(w2).cast("long").alias("rnk"),
        F.dense_rank().over(w2).cast("long").alias("drnk"),
    )


@register(
    "window_running_total",
    tags=("relational", "window"),
    description="Cumulative sum per key (exact integer-cents window sum).",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0 AS running_total
        FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(_cents(F.col("o_totalprice"), 100)).over(w) / F.lit(100.0)).alias(
            "running_total"
        ),
    )


@register(
    "window_lag_lead",
    tags=("relational", "window"),
    description="lag/lead navigation within ordered per-user event streams.",
    oracle="""
        SELECT event_id, user_id,
               LAG(value) OVER w AS prev_value,
               LEAD(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return events.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_moving_avg",
    tags=("relational", "window"),
    description="Sliding 3-row moving average (exact-cents formulation).",
    oracle="""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w / 100.0
                   / COUNT(*) OVER w AS moving_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(_cents(F.col("value"), 100)).over(w)
            / F.lit(100.0)
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@register(
    "sessionization",
    headline=True,
    tags=("relational", "window", "state"),
    description=(
        "Gap-based sessionization (30 min) via lag → flag → running sum; "
        "sessions and bounds per user."
    ),
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1 AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM sessions GROUP BY 1, 2
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sess = sessionize(
        events, key="user_id", time_col="ts", gap_seconds=1800,
        order_tiebreak="event_id",
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k / set ops
# ---------------------------------------------------------------------------


@register(
    "topk_lineitems",
    tags=("relational", "topk"),
    description="Global top-20 with total tie-break order (TakeOrdered plan).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 20
    """,
)
def topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return top_k(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        20,
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )


@register(
    "topk_offset",
    tags=("relational", "topk"),
    description="ORDER BY ... LIMIT with OFFSET (pagination).",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10 OFFSET 5
    """,
)
def topk_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(5)
        .limit(10)
    )


@register(
    "set_union",
    tags=("relational", "setop"),
    description="UNION (distinct) of two key sets.",
    oracle="""
        SELECT c_nationkey AS key FROM customer
        UNION
        SELECT s_nationkey AS key FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key")
    )
    return c.union(s).distinct()


@register(
    "set_intersect",
    tags=("relational", "setop"),
    description="INTERSECT of two key sets.",
    oracle="""
        SELECT c_nationkey AS key FROM customer
        INTERSECT
        SELECT s_nationkey AS key FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key")
    )
    return c.intersect(s)


@register(
    "set_except",
    tags=("relational", "setop"),
    description="EXCEPT: customers with 'P' orders but no 'O' orders.",
    oracle="""
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'P'
        EXCEPT
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("key")
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    return p.subtract(o)  # EXCEPT DISTINCT semantics


@register(
    "set_union_all_counts",
    tags=("relational", "setop"),
    description="UNION ALL preserved as a multiset, then counted.",
    oracle="""
        SELECT key, COUNT(*) AS cnt FROM (
            SELECT c_nationkey AS key FROM customer
            UNION ALL
            SELECT s_nationkey AS key FROM supplier
        ) GROUP BY 1
    """,
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("key")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("key")
    )
    return c.union(s).groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    tags=("relational", "scalar"),
    description="String function family: case, substr, length, pad, regex.",
    oracle=r"""
        SELECT p_partkey,
               UPPER(p_name) AS up_name,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               SUBSTR(p_name, 1, 4) AS pfx,
               REPLACE(p_name, ' ', '_') AS snake,
               p_brand || ':' || p_type AS brand_type,
               LPAD(p_brand, 12, '*') AS padded,
               REVERSE(p_name) AS rev,
               (p_name LIKE '%gold%') AS has_gold,
               REGEXP_EXTRACT(p_brand, '(\d+)', 1) AS brand_num
        FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 4).alias("pfx"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.reverse("p_name").alias("rev"),
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
    )


@register(
    "scalar_date_funcs",
    tags=("relational", "scalar"),
    description="Date/time function family: extract, trunc, diff, last_day.",
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
               CAST(MONTH(o_orderdate) AS BIGINT) AS mth,
               CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
               CAST(DAY(o_orderdate) AS BIGINT) AS dom,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(o_orderdate AS DATE) AS odate,
               LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@register(
    "scalar_math_funcs",
    tags=("relational", "scalar"),
    description="Math function family: abs/ceil/floor/sqrt/power/mod.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ABS(l_discount - 0.05) AS abs_disc,
               CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_ceil,
               CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_floor,
               SQRT(l_quantity) AS qty_sqrt,
               POWER(l_quantity, 2) AS qty_sq,
               l_orderkey % 7 AS key_mod
        FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "scalar_json_funcs",
    tags=("relational", "scalar", "json"),
    description="JSON path extraction from the events.props payload.",
    oracle="""
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k_val
        FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "scalar_case_when",
    tags=("relational", "scalar"),
    description="CASE WHEN bucketing feeding an aggregate.",
    oracle=f"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'mid'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS cnt,
               {_sql_sum('o_totalprice', 'total')}
        FROM orders GROUP BY 1
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("large")
    )
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        exact_sum(F.col("o_totalprice"), "total"),
    )


@register(
    "scalar_null_funcs",
    tags=("relational", "scalar"),
    description="NULL handling: nullif / coalesce / boolean projection.",
    oracle="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
               (c_acctbal < 0) AS is_negative
        FROM customer
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg"),
        (F.col("c_acctbal") < 0).alias("is_negative"),
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot / time bucketing
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    tags=("relational", "pivot"),
    description="Pivot event types to columns (counts per user).",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY 1
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "unpivot_metrics",
    tags=("relational", "pivot"),
    description="Unpivot (melt) wide metric columns to long form.",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS val
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 100
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@register(
    "events_hourly",
    tags=("relational", "time"),
    description="Tumbling-hour time bucketing with exact-cents value sums.",
    oracle=f"""
        SELECT DATE_TRUNC('hour', ts) AS hour,
               COUNT(*) AS n_events,
               {_sql_sum('value', 'total_value')}
        FROM events GROUP BY 1
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value"), "total_value"),
    )


@register(
    "join_salted_skew",
    tags=("relational", "join", "skew"),
    description=(
        "Skew-safe salted equi-join: lineitem x part with the big side "
        "salted by its PK and the part side replicated 8x, joined on "
        "(key, salt) — row-identical to the plain join, but a hot "
        "partkey's rows spread over 8 reducers instead of one."
    ),
    oracle="""
        SELECT p.p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: operators/relational.salted_equi_join — the manual fallback
    for join skew AQE cannot split (one key too hot for a single task on
    both sort-merge stages). Salt from xxhash64(l_orderkey) spreads each
    hot l_partkey across 8 (key, salt) reducer groups; part replicates
    8x via one explode(sequence). At this SF Catalyst may still pick a
    broadcast join (part is tiny) — the answer is identical either way;
    the technique targets the medium-dim regime above the broadcast
    threshold. Exact-cents aggregation keeps the parity bit-exact.
    """
    from hadoop_map_reduce_spark.operators.relational import (
        salted_equi_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    return (
        salted_equi_join(li, part, on="l_partkey", salts=8,
                         salt_by="l_orderkey")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
    )
