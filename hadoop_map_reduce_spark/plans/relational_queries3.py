"""Third relational batch: multiset set-ops, null ordering, map/JSON-key
functions, and the LATERAL correlated-subquery surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table, register_views


@register(
    "set_except_all",
    tags=("relational", "setop"),
    description="EXCEPT ALL: multiset difference preserving multiplicities.",
    oracle="""
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus <> 'O'
        EXCEPT ALL
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") != "O").select(
        F.col("o_custkey").alias("key")
    )
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("key")
    )
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    tags=("relational", "setop"),
    description="INTERSECT ALL: multiset intersection.",
    oracle="""
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    return a.intersectAll(b)


@register(
    "sort_null_ordering",
    tags=("relational", "sort"),
    description="Explicit NULLS FIRST ordering with a deterministic limit.",
    oracle="""
        SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status
        FROM orders
        ORDER BY status ASC NULLS FIRST, o_orderkey ASC
        LIMIT 50
    """,
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        )
        .orderBy(
            F.col("status").asc_nulls_first(), F.col("o_orderkey").asc()
        )
        .limit(50)
    )


@register(
    "scalar_map_funcs",
    tags=("relational", "scalar", "json"),
    description="JSON payload to map type: keys, cardinality, value access.",
    oracle="""
        SELECT event_id,
               CAST(json_array_length(json_keys(props)) AS INT) AS n_keys,
               json_keys(props)[1] AS first_key,
               CAST(props->>'k' AS BIGINT) AS k_val
        FROM events
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
    )


_Q_LATERAL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 2
    ) AS t
"""


@register(
    "lateral_top_orders",
    tags=("relational", "subquery", "join"),
    description=(
        "LATERAL correlated subquery: top-2 orders per customer through "
        "the SQL lateral-join surface."
    ),
    oracle=_Q_LATERAL,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q_LATERAL)
