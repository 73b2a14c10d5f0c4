"""Fifth relational batch: the remaining classic TPC-H query shapes,
adapted to this schema (no partsupp / commitdate / shipmode columns —
lineitem serves as the part↔supplier catalog where partsupp would be).

Q2  min-cost supplier        correlated scalar-MIN over an aggregate CTE
Q7  volume shipping          two-sided nation pair revenue by year
Q8  market share             conditional share of revenue per year
Q9  product-type profit      profit by supplier nation × year
Q11 important parts          HAVING against a global scalar subquery
Q12 shipping delay           CASE-count buckets on date arithmetic
Q15 top supplier             aggregate CTE + scalar MAX equality
Q16 supplier count           COUNT DISTINCT with NOT IN exclusion
Q21 waiting supplier         EXISTS + correlated NOT EXISTS inequality

Float discipline per repo convention: every money aggregate goes through
exact integer scaling on both engines (see relational_queries.exact_sum).
SQL-surface queries share ONE string between Spark and the DuckDB oracle
(dialect-portable: 1eK literals, TIMESTAMP literals, INTERVAL n DAY);
DataFrame-surface queries carry a DuckDB-dialect oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.plans.relational_queries import _sql_sum, exact_sum
from hadoop_map_reduce_spark.session import load_table
from hadoop_map_reduce_spark.session import register_views as _views

# Region 3 = EUROPE holds nations 3, 8, 13, 18, 23 in the synthetic data;
# region 1 = AMERICA holds 1, 6, 11, 16, 21.

_Q2_MIN_COST = """
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(ROUND(l_extendedprice * 1e2) AS BIGINT)) AS price_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation_name,
           o.price_cents / 1e2 AS best_price
    FROM part p
    JOIN offers o ON o.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size <= 10
      AND o.price_cents = (
          SELECT MIN(o2.price_cents)
          FROM offers o2
          JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
"""


@register(
    "q2_min_cost_supplier",
    tags=("relational", "subquery", "join"),
    description=(
        "TPC-H Q2 shape: cheapest in-region supplier per small part via a "
        "correlated scalar MIN over the (part, supplier) best-offer CTE "
        "(lineitem stands in for partsupp)."
    ),
    oracle=_Q2_MIN_COST,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "supplier", "nation", "region", "lineitem")
    return spark.sql(_Q2_MIN_COST)


@register(
    "q7_volume_shipping",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q7 shape: bidirectional nation-pair trade revenue by ship "
        "year (supplier nation x customer nation, dims broadcast)."
    ),
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 10000)}
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 10000
        )
    )


@register(
    "q8_market_share",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q8 shape: NATION_6's share of AMERICA-customer ECONOMY-part "
        "revenue per order year (conditional exact-int sums, one ratio)."
    ),
    oracle="""
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               (SUM(CASE WHEN n1.n_name = 'NATION_6'
                         THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                         * 1e4) AS BIGINT)
                         ELSE 0 END) / 1e4)
               / (SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 1e4) AS BIGINT)) / 1e4) AS mkt_share
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")
    )
    vol_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e4
    ).cast("long")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1key"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_6", vol_e4).otherwise(F.lit(0))
        ).alias("_target_e4"),
        F.sum(vol_e4).alias("_total_e4"),
    )
    return agg.select(
        "o_year",
        ((F.col("_target_e4") / F.lit(1e4)) / (F.col("_total_e4") / F.lit(1e4))).alias(
            "mkt_share"
        ),
    )


@register(
    "q9_product_profit",
    tags=("relational", "join", "aggregation"),
    description=(
        "TPC-H Q9 shape: revenue from parts named *red* by supplier "
        "nation x order year (no partsupp cost column in this schema)."
    ),
    oracle=f"""
        SELECT n.n_name AS nation_name,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               {_sql_sum('l.l_extendedprice * (1 - l.l_discount)', 'sum_profit', 10000)}
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation_name"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_profit", 10000
        )
    )


_Q11_IMPORTANT_PARTS = """
    WITH vals AS (
        SELECT l.l_partkey,
               SUM(CAST(ROUND(l.l_extendedprice * 1e2) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(cents AS BIGINT) / 1e2 AS part_value
    FROM vals
    WHERE cents > (SELECT CAST(SUM(cents) AS BIGINT) FROM vals) * 1e-3
"""


@register(
    "q11_important_parts",
    tags=("relational", "subquery", "aggregation"),
    description=(
        "TPC-H Q11 shape: per-part value from three nations' suppliers, "
        "kept when above a fraction of the global total (scalar subquery "
        "over the same aggregate CTE)."
    ),
    oracle=_Q11_IMPORTANT_PARTS,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_IMPORTANT_PARTS)


@register(
    "q12_ship_delay_buckets",
    tags=("relational", "aggregation", "scalar"),
    description=(
        "TPC-H Q12 shape: order-priority line counts bucketed by ship "
        "delay (date arithmetic feeding CASE-count aggregation; no "
        "l_shipmode column in this schema)."
    ),
    oracle="""
        SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE)) < 30 THEN 'fast'
                    WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE)) < 90 THEN 'medium'
                    ELSE 'slow' END AS delay_bucket,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """,
)
def q12_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "medium").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q15_TOP_SUPPLIER = """
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4)
                        AS BIGINT)) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.rev_e4 AS BIGINT) / 1e4 AS total_revenue
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.rev_e4 = (SELECT MAX(rev_e4) FROM rev)
"""


@register(
    "q15_top_supplier",
    tags=("relational", "subquery", "aggregation"),
    description=(
        "TPC-H Q15 shape: quarter revenue per supplier, keep the max "
        "(aggregate CTE consumed twice: join side + scalar MAX; exact "
        "integer revenue makes the equality safe)."
    ),
    oracle=_Q15_TOP_SUPPLIER,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_Q15_TOP_SUPPLIER)


_Q16_SUPPLIER_CNT = """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0e0)
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "q16_supplier_count",
    tags=("relational", "subquery", "aggregation"),
    description=(
        "TPC-H Q16 shape: distinct suppliers per (brand, type, size) with "
        "a NOT IN exclusion list (negative-balance suppliers standing in "
        "for the complaints filter)."
    ),
    oracle=_Q16_SUPPLIER_CNT,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SUPPLIER_CNT)


_Q21_WAITING_SUPPLIER = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
"""


@register(
    "q21_waiting_supplier",
    tags=("relational", "subquery"),
    description=(
        "TPC-H Q21 shape: per-supplier count of finished-order lineitems "
        "shipped 60+ days late where other suppliers participated but none "
        "shipped later (EXISTS + correlated NOT EXISTS with inequality; "
        "l_shipdate vs orderdate stands in for receipt/commit dates)."
    ),
    oracle=_Q21_WAITING_SUPPLIER,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_WAITING_SUPPLIER)


@register(
    "dedup_fingerprint",
    tags=("llm", "dedup"),
    description=(
        "Exact dedup keyed on md5 fingerprints: the narrow-shuffle variant "
        "of dedup_exact — at 100 TB the shuffle carries 16-byte digests, "
        "not raw documents."
    ),
    oracle="""
        SELECT md5(text) AS fp, MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_Q20_EXCESS_SHIPMENTS = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= DATE '1995-01-01'
          AND l.l_shipdate < DATE '1996-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) > 5e-1 * (
            SELECT SUM(CAST(ROUND(l2.l_quantity) AS BIGINT))
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
              AND l2.l_shipdate >= DATE '1995-01-01'
              AND l2.l_shipdate < DATE '1996-01-01'))
"""


@register(
    "q20_excess_shipments",
    tags=("relational", "subquery"),
    description=(
        "TPC-H Q20 shape: suppliers who shipped more than half of a "
        "part's yearly volume (IN over a grouped subquery whose HAVING "
        "compares against a correlated scalar aggregate; shipped volume "
        "stands in for partsupp availability). Completes the 22-query "
        "TPC-H shape set."
    ),
    oracle=_Q20_EXCESS_SHIPMENTS,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's planner stress is double-nested decorrelation: the IN
    subquery aggregates per (supplier, part) while its HAVING references
    a second aggregate correlated on the group key. Catalyst rewrites
    both levels into aggregate joins (no per-group re-scan); at 100 TB
    the inner and outer aggregates share the lineitem scan and shuffle
    on l_partkey-derived keys, and the final IN is a left-semi join onto
    the small supplier dim."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(_Q20_EXCESS_SHIPMENTS)


_MERGE_CDC_SQL = """
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
    ), upd AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               price_cents + 500 AS price_cents
        FROM base WHERE o_orderkey % 10 = 0
    ), ins AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
               'N' AS o_orderstatus, price_cents
        FROM base WHERE o_orderkey % 97 = 0
    ), cdc AS (
        SELECT * FROM upd UNION ALL SELECT * FROM ins
    )
    SELECT * FROM cdc
    UNION ALL
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM cdc c
                      WHERE c.o_orderkey = b.o_orderkey)
"""


@register(
    "merge_upsert_orders",
    tags=("relational", "join"),
    description=(
        "MERGE/upsert semantics (CDC apply): a deterministic change "
        "batch — updates for keys %10=0, inserts for keys %97=0 — "
        "merged into orders via operators.relational.merge_upsert "
        "(anti-join + union; Spark's MERGE INTO statement is v2-catalog-"
        "only, the operator gives the same semantics on any DataFrame). "
        "Money stays integer cents end-to-end."
    ),
    oracle=_MERGE_CDC_SQL,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC batch is small next to the accumulated table, so the anti
    join broadcasts it: the merge is one map-side pass over the target,
    no shuffle of the big side — the property that matters when the
    target is the 100-TB fact table and the batch is a day of changes."""
    from hadoop_map_reduce_spark.operators.relational import merge_upsert

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("price_cents") + 500).alias("price_cents"),
    )
    ins = base.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "price_cents",
    )
    return merge_upsert(base, upd.unionByName(ins), on=["o_orderkey"])


@register(
    "scalar_bitwise_funcs",
    tags=("relational", "scalar"),
    description=(
        "Bitwise scalar family: AND/OR/XOR, shifts, popcount over the "
        "integer key columns."
    ),
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
               CAST(o_orderkey | 4096 AS BIGINT) AS with_bit,
               CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
               CAST(o_orderkey << 2 AS BIGINT) AS shl2,
               CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
               CAST(bit_count(o_orderkey) AS INT) AS popcount
        FROM orders WHERE o_orderkey < 2000
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_bit"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "agg_bit_ops",
    tags=("relational", "aggregation"),
    description=(
        "Bitwise aggregates (bit_and / bit_or / bit_xor) of order keys "
        "per order status — set-intersection/union/parity semantics over "
        "bit masks in one partial-agg'd shuffle."
    ),
    oracle="""
        SELECT o_orderstatus,
               CAST(bit_and(o_orderkey) AS BIGINT) AS keys_and,
               CAST(bit_or(o_orderkey) AS BIGINT) AS keys_or,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS keys_xor
        FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("keys_and"),
        F.bit_or("o_orderkey").alias("keys_or"),
        F.bit_xor("o_orderkey").alias("keys_xor"),
    )


@register(
    "window_count_distinct",
    tags=("relational", "window"),
    description=(
        "Running COUNT(DISTINCT) over an ordered window — an aggregate "
        "Spark's window functions don't support natively. Emulated as "
        "sum-of-first-occurrence flags (row_number==1 over (key, value) "
        "marks each value's first row; a running sum of flags is the "
        "running distinct count). The DuckDB oracle runs its NATIVE "
        "distinct-window aggregate, so the emulation is checked against "
        "a true implementation, not against itself."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(DISTINCT o_orderpriority) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS running_distinct_priorities
        FROM orders
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both window passes partition by o_custkey alone — the first-
    occurrence flag uses lag over (priority, date, key) order rather
    than row_number over a (custkey, priority) partition, precisely so
    the two windows share ONE hash exchange (plan-tested); they differ
    only in within-partition sort order. A (custkey, priority)-
    partitioned row_number would force a second shuffle."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w_first = Window.partitionBy("o_custkey").orderBy(
        "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Within (custkey) ordered by (priority, date, key): the first row of
    # each priority run is that value's earliest (date, key) row.
    is_new = ~F.lag("o_orderpriority").over(w_first).eqNullSafe(
        F.col("o_orderpriority")
    )
    flagged = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.when(is_new, 1).otherwise(0).alias("_new"),
    )
    return flagged.select(
        "o_orderkey",
        "o_custkey",
        F.sum("_new").over(w_run).alias("running_distinct_priorities"),
    )


@register(
    "join_asof_tolerance",
    tags=("relational", "join", "asof"),
    description=(
        "Backward as-of join with a 7-day tolerance window (pandas "
        "merge_asof(tolerance=...) semantics): each event matched to the "
        "user's latest order at-or-before the event, nulled when the "
        "match is staler than 7 days. Same one-shuffle merge plan as "
        "join_asof — the bound filters the carried match, it does not "
        "change the join."
    ),
    oracle="""
        WITH m AS (
            SELECT e.event_id, e.user_id, e.ts, MAX(o.o_orderdate) AS o_orderdate
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                 AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
            GROUP BY 1, 2, 3
        )
        SELECT m.event_id, m.user_id, m.ts, m.o_orderdate,
               MAX(o.o_orderkey) AS o_orderkey
        FROM m LEFT JOIN orders o
          ON o.o_custkey = m.user_id AND o.o_orderdate = m.o_orderdate
        GROUP BY 1, 2, 3, 4
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.relational import asof_join_backward

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
        tolerance="INTERVAL 7 DAY",
    ).select("event_id", "user_id", "ts", "o_orderdate", "o_orderkey")


@register(
    "join_null_safe",
    tags=("relational", "join"),
    description=(
        "Null-safe equality join (<=> / IS NOT DISTINCT FROM): customers "
        "and suppliers matched on a derived nation key where one value is "
        "NULLIF'd away on both sides — NULL <=> NULL matches (one row "
        "group per null pair), plain = would drop them. Completes the "
        "join-variant checklist; still a hash-partitionable equi-join "
        "(Spark plans EqualNullSafe as a normal shuffle/broadcast key)."
    ),
    oracle="""
        SELECT c.nk AS nation_key,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM (SELECT NULLIF(c_nationkey, 0) AS nk FROM customer) c
        JOIN (SELECT NULLIF(s_nationkey, 0) AS nk FROM supplier) s
          ON c.nk IS NOT DISTINCT FROM s.nk
        GROUP BY c.nk
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EqualNullSafe is a first-class join key for Spark: the plan is the
    same Exchange-on-key + hash join as plain equality (nulls hash to one
    partition — acceptable when the null group is a bounded fraction, as
    here; a dominant null key would call for the salted-join variant)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.nullif(F.col("c_nationkey"), F.lit(0)).alias("c_nk"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.nullif(F.col("s_nationkey"), F.lit(0)).alias("s_nk"))
    )
    return (
        cust.join(supp, cust.c_nk.eqNullSafe(supp.s_nk))
        .groupBy(F.col("c_nk").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
