"""Second relational batch: returned-item reporting (Q10 shape),
disjunctive multi-predicate scans (Q19 shape), and the remaining window
navigation family (ntile / percent_rank / cume_dist / first / last)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.plans.relational_queries import _sql_sum, exact_sum
from hadoop_map_reduce_spark.session import load_table


@register(
    "q10_returned_items",
    tags=("relational", "join", "topk"),
    description="TPC-H Q10 shape: revenue lost to returns, top-20 customers.",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 10000)}
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 10000
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


@register(
    "q19_disjunctive",
    tags=("relational", "scalar"),
    description=(
        "TPC-H Q19 shape: OR-of-ANDs predicate across joined tables — the "
        "optimizer must push the common conjuncts and keep the disjunction."
    ),
    oracle=f"""
        SELECT {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 10000)}
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 5)
           OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 AND l.l_quantity >= 10)
           OR (p.p_type = 'PROMO' AND l.l_quantity >= 25)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return joined.filter(cond).agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 10000
        )
    )


@register(
    "window_distribution",
    tags=("relational", "window"),
    description="ntile / percent_rank / cume_dist / first_value / last_value.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(NTILE(4) OVER w1 AS BIGINT) AS quartile,
               ROUND(PERCENT_RANK() OVER w2, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w2, 6) AS cume,
               FIRST_VALUE(o_orderkey) OVER w1 AS first_key,
               LAST_VALUE(o_orderkey) OVER
                   (PARTITION BY o_custkey ORDER BY o_totalprice ASC,
                    o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_key
        FROM orders
        WINDOW w1 AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice ASC, o_orderkey ASC),
               w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w2 = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").asc())
    w_full = w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w1).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w2), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w2), 6).alias("cume"),
        F.first("o_orderkey").over(w1).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )
