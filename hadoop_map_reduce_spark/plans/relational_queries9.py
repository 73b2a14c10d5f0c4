"""Ninth relational batch (round 8): the six TPC-H query shapes the
registry did not yet carry — Q4 (EXISTS priority check), Q13 (customer
order-count distribution), Q14 (promo revenue share), Q17
(small-quantity-order revenue), Q18 (large-volume customers), Q22
(idle-customer opportunity).

The synthetic schema omits a few TPC-H columns (no
l_commitdate/l_receiptdate, no p_container, no c_phone, no o_comment);
each adapted predicate keeps the query's defining plan shape — the
EXISTS semi-join, the anti-join with a scalar subquery gate, the
conditional-aggregate ratio — and each adaptation is noted on the
query. Money/quantity arithmetic follows the repo's integer-cents
discipline so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.plans.relational_queries import (
    _cents,
    _sql_sum,
    exact_sum,
)
from hadoop_map_reduce_spark.session import load_table


@register(
    "q4_order_priority",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q4 shape: order-priority census over a quarter, gated by "
        "an EXISTS semi-join against lineitem (adapted: the late-ship "
        "predicate l_shipdate > o_orderdate + 90 days stands in for the "
        "reference's commitdate/receiptdate pair, which the synthetic "
        "schema omits)."
    ),
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join, never a count-then-filter: the EXISTS becomes a
    LeftSemi hash join on l_orderkey — lineitem is scanned once with
    only two columns, no per-order lineitem aggregation is
    materialized, and the date-window filter prunes orders at the
    scan. At 100 TB the semi-join build is the filtered quarter of
    orders, a fraction of the fact table."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "q13_custdist",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q13 shape: distribution of per-customer order counts "
        "including zero-order customers (LEFT JOIN with the exclusion "
        "predicate INSIDE the join condition — adapted: urgent orders "
        "excluded in place of the reference's o_comment NOT LIKE)."
    ),
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey)
        GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exclusion predicate must live in the JOIN condition, not a
    WHERE (a WHERE would turn the left join inner and drop zero-order
    customers). Two aggregations: the first shuffles by custkey (the
    join's own key — one exchange serves both), the second by the
    tiny c_count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q14_promo_share",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q14 shape: promo revenue share of one ship-month — a "
        "conditional aggregate ratio over the lineitem-part join "
        "(adapted: p_type = 'PROMO' exactly; the synthetic p_type has "
        "no 'PROMO%' prefix family)."
    ),
    oracle=f"""
        SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT) ELSE 0 END)
               / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)), 6) AS promo_share_pct,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)',
                         'total_revenue', 10000)}
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One broadcast join (part is the dim side), one aggregate; the
    ratio divides two exact integer cent-sums so the double result is
    bit-identical cross-engine before the ROUND."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", cents).otherwise(
                    F.lit(0)
                )
            )
            / F.sum(cents),
            6,
        ).alias("promo_share_pct"),
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
            10000,
        ),
    )


@register(
    "q17_small_quantity",
    tags=("relational", "join", "aggregation", "subquery"),
    description=(
        "TPC-H Q17 shape: revenue that would be lost by refusing "
        "small-quantity orders — each lineitem compared against 20% of "
        "its part's average quantity (adapted: p_brand/p_size filter in "
        "place of the reference's brand/container pair). The comparison "
        "is cross-multiplied to integers (5*qty*n < sum) so no "
        "float average is ever materialized."
    ),
    oracle="""
        WITH cand AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#1' AND p.p_size <= 5),
        pq AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qsum,
                   CAST(COUNT(*) AS BIGINT) AS qn
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(SUM(CAST(ROUND(c.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM cand c JOIN pq ON pq.l_partkey = c.l_partkey
        WHERE 5 * CAST(ROUND(c.l_quantity * 100) AS BIGINT) * pq.qn
              < pq.qsum
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass, no correlated subquery: the per-part average is a
    narrow (partkey, qsum, qn) aggregate joined back to the filtered
    candidates. The candidate side carries the selective brand/size
    filter, so the join probe is tiny; the aggregate side shuffles
    once by partkey. The output stays in integer cents (revenue/7
    would be the TPC-H avg_yearly — a lossy divide the census
    deliberately skips)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
    )
    cand = li.join(
        F.broadcast(part.select("p_partkey")),
        part.p_partkey == li.l_partkey,
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pq = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_quantity"), 100)).alias("qsum"),
        F.count(F.lit(1)).cast("long").alias("qn"),
    )
    small = cand.join(pq, "l_partkey").filter(
        F.lit(5) * _cents(F.col("l_quantity"), 100) * F.col("qn")
        < F.col("qsum")
    )
    return small.agg(
        F.sum(_cents(F.col("l_extendedprice"), 100))
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_small"),
    )


@register(
    "q18_large_volume",
    headline=True,
    tags=("relational", "join", "topk", "subquery"),
    description=(
        "TPC-H Q18 shape: top-100 large-volume customers — orders whose "
        "total lineitem quantity exceeds 250, joined back through "
        "customer, ranked by order value (o_orderkey tie-break)."
    ),
    oracle=f"""
        WITH big AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_cents
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000)
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               {_sql_sum('o.o_totalprice', 'total_price', 100)},
               CAST(MAX(big.qty_cents) AS BIGINT) AS total_qty_cents
        FROM big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2, 3, 4
        ORDER BY total_price DESC, o_orderkey ASC
        LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING aggregate runs FIRST and is the only lineitem-sized
    shuffle; the survivors (~1% of orders) drive the joins, so orders
    and customer are probed by a small build. The final top-100 is a
    TakeOrdered, never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"), 100)).alias("qty_cents"))
        .filter(F.col("qty_cents") > 25000)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = big.join(
        orders, orders.o_orderkey == big.l_orderkey
    ).join(cust, cust.c_custkey == orders.o_custkey)
    agg = joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate"
    ).agg(
        exact_sum(F.col("o_totalprice"), "total_price", 100),
        F.max("qty_cents").cast("long").alias("total_qty_cents"),
    )
    return agg.orderBy(
        F.col("total_price").desc(), F.col("o_orderkey").asc()
    ).limit(100)


@register(
    "q22_global_sales",
    tags=("relational", "join", "subquery", "aggregation"),
    description=(
        "TPC-H Q22 shape: per-country census of rich-but-idle customers "
        "— above-average positive balance (scalar subquery gate, "
        "cross-multiplied to integer cents) and idle — no order "
        "since mid-2000 (anti-join). Adapted: c_nationkey in 1..7 "
        "stands in for the reference's phone-prefix country codes, and "
        "the idle gate is date-scoped because every synthetic customer "
        "has SOME order."
    ),
    oracle=f"""
        WITH pos AS (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS balsum,
                   CAST(COUNT(*) AS BIGINT) AS baln
            FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey BETWEEN 1 AND 7)
        SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               {_sql_sum('c.c_acctbal', 'totacctbal', 100)}
        FROM customer c, pos
        WHERE c.c_nationkey BETWEEN 1 AND 7
          AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.baln
              > pos.balsum
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
        GROUP BY c.c_nationkey
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar average gate is a 1-row broadcast (cross join), the
    no-orders gate a LeftAnti against only orders' o_custkey column;
    neither moves the customer table more than once. The
    above-average comparison cross-multiplies (bal*n > sum) so both
    engines gate on exact integers."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").between(1, 7)
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents(F.col("c_acctbal"), 100)).alias("balsum"),
        F.count(F.lit(1)).cast("long").alias("baln"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    idle = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    rich = idle.crossJoin(F.broadcast(pos)).filter(
        _cents(F.col("c_acctbal"), 100) * F.col("baln") > F.col("balsum")
    )
    return rich.groupBy(
        F.col("c_nationkey").cast("long").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        exact_sum(F.col("c_acctbal"), "totacctbal", 100),
    )
