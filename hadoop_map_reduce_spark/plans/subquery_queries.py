"""Subquery-shaped relational coverage: correlated scalar subqueries,
EXISTS/IN predicates, aggregate-of-aggregate distributions, conditional
revenue ratios. Expressed through the engine's SQL surface (temp views +
``spark.sql``) — Catalyst decorrelates these into the same join plans the
DataFrame API produces.

Float discipline matches relational_queries: any aggregate that feeds a
comparison or a ratio goes through exact integer cents on both engines,
so predicate boundaries cannot flip between Spark and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import register_views as _views


# Both engines compute the per-brand average as exact-cents-sum / count —
# identical doubles, so the correlated comparison is boundary-safe.
_Q_BELOW_BRAND_AVG = """
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice <
        (SELECT SUM(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT)) / 1e2
                / COUNT(*)
         FROM part p2
         WHERE p2.p_brand = p.p_brand)
"""


@register(
    "subq_below_brand_avg",
    tags=("relational", "subquery"),
    description="Correlated scalar subquery: parts cheaper than their brand average.",
    oracle=_Q_BELOW_BRAND_AVG,
)
def subq_below_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(_Q_BELOW_BRAND_AVG)


_Q_PRIORITY_EXISTS = """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
"""


@register(
    "subq_priority_exists",
    tags=("relational", "subquery"),
    description="TPC-H Q4 shape: EXISTS predicate feeding a grouped count.",
    oracle=_Q_PRIORITY_EXISTS,
)
def subq_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q_PRIORITY_EXISTS)


_Q_LARGE_ORDERS = """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
"""


@register(
    "subq_large_orders",
    headline=True,
    tags=("relational", "subquery"),
    description="TPC-H Q18 shape: IN over a grouped-HAVING subquery.",
    oracle=_Q_LARGE_ORDERS,
)
def subq_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q_LARGE_ORDERS)


_Q_CUST_DISTRIBUTION = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""


@register(
    "subq_cust_distribution",
    tags=("relational", "subquery"),
    description="TPC-H Q13 shape: aggregate of an outer-join aggregate.",
    oracle=_Q_CUST_DISTRIBUTION,
)
def subq_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q_CUST_DISTRIBUTION)


_Q_PROMO_SHARE = """
    SELECT 1e2 * (
             SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                      * 1e4) AS BIGINT)
                      ELSE 0 END)
             / 1e4)
           / (SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                             * 1e4) AS BIGINT)) / 1e4)
           AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register(
    "subq_promo_share",
    tags=("relational", "subquery"),
    description="TPC-H Q14 shape: conditional-aggregate revenue ratio.",
    oracle=_Q_PROMO_SHARE,
)
def subq_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q_PROMO_SHARE)


_Q_IDLE_RICH = """
    SELECT c.c_mktsegment, COUNT(*) AS n_cust,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 1e2 AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) / 1e2
                   / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
"""


@register(
    "subq_idle_rich_customers",
    tags=("relational", "subquery"),
    description=(
        "TPC-H Q22 shape: uncorrelated scalar-average threshold + NOT "
        "EXISTS anti predicate."
    ),
    oracle=_Q_IDLE_RICH,
)
def subq_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q_IDLE_RICH)
