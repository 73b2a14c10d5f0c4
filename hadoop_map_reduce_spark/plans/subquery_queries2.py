"""Deep-decorrelation subquery shapes (TPC-H Q17/Q21 families) and a
data-profiling query — the remaining optimizer stress shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import register_views as _views


# Correlated scalar average per part (Q17 shape). Quantities are
# integer-valued doubles, so the per-part average is exact-int-sum /
# count — identical doubles both engines; 2e-1 keeps the literal DOUBLE
# in both SQL dialects.
_Q_SMALL_QTY = """
    SELECT SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 1e2
           AS small_lot_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < 2e-1 *
          (SELECT SUM(CAST(ROUND(l2.l_quantity) AS BIGINT))
                  / CAST(COUNT(*) AS DOUBLE)
           FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
"""


@register(
    "subq_small_quantity",
    tags=("relational", "subquery"),
    description=(
        "TPC-H Q17 shape: per-part correlated average threshold "
        "(decorrelates to an aggregate join)."
    ),
    oracle=_Q_SMALL_QTY,
)
def subq_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q_SMALL_QTY)


# EXISTS + NOT EXISTS correlated pair (Q21 shape): orders where this
# supplier shipped >1 line but no other supplier shipped any.
_Q_SOLE_SUPPLIER = """
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_sole_orders
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey = l1.l_suppkey
              AND l2.l_linenumber <> l1.l_linenumber)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
"""


@register(
    "subq_sole_supplier",
    tags=("relational", "subquery"),
    description=(
        "TPC-H Q21 shape: correlated EXISTS + NOT EXISTS pair over the "
        "same fact table."
    ),
    oracle=_Q_SOLE_SUPPLIER,
)
def subq_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_Q_SOLE_SUPPLIER)


# Column profiling: the data-quality sweep a pipeline runs before
# training ingestion — exact counts so it oracles bit-for-bit.
_Q_PROFILE = """
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS custkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
           CAST(MAX(o_orderkey) AS BIGINT) AS key_max,
           MIN(o_orderdate) AS date_min,
           MAX(o_orderdate) AS date_max,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 1e2 AS price_total
    FROM orders
"""


@register(
    "profile_orders",
    tags=("relational", "profiling"),
    description="Table profiling sweep: null/distinct/min/max/total per column.",
    oracle=_Q_PROFILE,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_Q_PROFILE)
