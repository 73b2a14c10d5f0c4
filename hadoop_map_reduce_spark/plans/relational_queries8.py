"""Round-2 additions, batch 8: distributed skyline (Pareto frontier),
SCD Type-2 interval build (gaps-and-islands), exact rolling-median
window, Markov event-transition matrix, incremental aggregate
maintenance (materialized-view delta refresh), and time-weighted
average (TWAP).

Reference scope note: the reference engine (a 3-file Hadoop MapReduce
job, SURVEY.md §0) has none of these; they belong to the generalized
query surface the engine claims (SURVEY.md §7.1). Float discipline
follows ``stats_queries.py`` / ``tfidf_top_terms``: integer-scaled
money and values (cents), integer-rational scores (`floor(1e6*a/b)`),
and identical expression structure on both engines; the one emitted
double (`rolling_median_c`) is an exact midpoint of integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.operators.skyline import skyline
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "skyline_parts",
    tags=("relational", "skyline"),
    description=(
        "Skyline / Pareto frontier of parts (minimize p_retailprice, "
        "maximize p_size): two-phase distributed frontier — shuffle-free "
        "per-partition NumPy frontier, then candidate-sized merge — vs "
        "the quadratic NOT EXISTS oracle."
    ),
    oracle="""
        SELECT p_partkey, p_brand, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size)
        )
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    return skyline(part, [("p_retailprice", "min"), ("p_size", "max")])


@register(
    "skyline_parts_grid",
    tags=("relational", "skyline"),
    description=(
        "Same Pareto frontier (minimize p_retailprice, maximize "
        "p_size) through the PARALLEL-merge variant: range-slab local "
        "frontiers, then every candidate verified against the "
        "broadcast candidate matrix in parallel — the plan for "
        "anti-correlated dimensions where the frontier (and thus the "
        "plain operator's single merge task) grows with the input. "
        "Identical result set by skyline(A∪B) algebra."
    ),
    oracle="""
        SELECT p_partkey, p_brand, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size)
        )
    """,
)
def skyline_parts_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.skyline import skyline_grid

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    return skyline_grid(
        part, [("p_retailprice", "min"), ("p_size", "max")]
    )


@register(
    "scd2_status_history",
    tags=("relational", "window", "scd"),
    description=(
        "SCD Type-2 build via gaps-and-islands: per customer, collapse "
        "consecutive same-status orders (ordered by date, orderkey) into "
        "validity intervals [valid_from, valid_to); open intervals have "
        "NULL valid_to. One hash exchange on custkey; runs and interval "
        "ends computed with rank-difference + lead windows."
    ),
    oracle="""
        WITH seq AS (
            SELECT o_custkey, o_orderstatus, o_orderdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey, o_orderstatus
                       ORDER BY o_orderdate, o_orderkey) AS rs
            FROM orders
        ), runs AS (
            SELECT o_custkey, o_orderstatus,
                   MIN(o_orderdate) AS valid_from,
                   MIN(rn) AS first_rn,
                   COUNT(*) AS n_orders
            FROM seq GROUP BY o_custkey, o_orderstatus, rn - rs
        )
        SELECT o_custkey, o_orderstatus, valid_from,
               LEAD(valid_from) OVER (
                   PARTITION BY o_custkey ORDER BY first_rn) AS valid_to,
               n_orders
        FROM runs
    """,
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    by_cust = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    by_cust_status = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.row_number().over(by_cust).alias("rn"),
        F.row_number().over(by_cust_status).alias("rs"),
    )
    runs = (
        seq.groupBy(
            "o_custkey", "o_orderstatus", (F.col("rn") - F.col("rs")).alias("_g")
        )
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.min("rn").alias("first_rn"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .drop("_g")
    )
    by_first = Window.partitionBy("o_custkey").orderBy("first_rn")
    return runs.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        F.lead("valid_from").over(by_first).alias("valid_to"),
        "n_orders",
    )


@register(
    "window_rolling_median",
    tags=("relational", "window"),
    description=(
        "Exact rolling median over the last 10 events per user (ordered "
        "by ts, event_id): integer-cent values make every median an "
        "exact integer or half-integer — engine-independent. One hash "
        "exchange, in-partition sort."
    ),
    oracle="""
        SELECT event_id, user_id,
               quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
               ) AS rolling_median_c
        FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.expr("percentile(value_c, 0.5)").over(w).alias("rolling_median_c"),
    )


@register(
    "events_transition_probs",
    tags=("relational", "window", "markov"),
    description=(
        "First-order Markov transition matrix over event types: per-user "
        "lag window (ordered by ts, event_id) pairs each event with its "
        "predecessor; transition probability emitted as an exact "
        "integer-rational floor(1e6 * n / row_total)."
    ),
    oracle="""
        WITH pairs AS (
            SELECT LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   event_type AS next_type
            FROM events
        ), counted AS (
            SELECT prev_type, next_type, COUNT(*) AS n
            FROM pairs WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        )
        SELECT prev_type, next_type, n,
               CAST(FLOOR(1e6 * (n / SUM(n) OVER (PARTITION BY prev_type)))
                    AS BIGINT) AS prob_ppm
        FROM counted
    """,
)
def events_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(by_user).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counted = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("prev_type")
    return counted.select(
        "prev_type",
        "next_type",
        "n",
        F.floor(F.lit(1e6) * (F.col("n") / F.sum("n").over(row_total)))
        .cast("long")
        .alias("prob_ppm"),
    )


@register(
    "incremental_agg_refresh",
    tags=("relational", "aggregation", "incremental"),
    description=(
        "Incremental materialized-view maintenance: the order-status "
        "revenue aggregate is computed as base-partition state (orders "
        "before 1995-01-01) merged with a delta batch (orders at/after), "
        "combining algebraic partials (sum of sums, sum of counts) "
        "instead of recomputing — verified against the full recompute."
    ),
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    cutoff = F.lit("1995-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_c").alias("revenue_c"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_c").alias("revenue_c"),
        )
    )


@register(
    "timeseries_twap",
    tags=("relational", "timeseries", "window"),
    description=(
        "Time-weighted average price (TWAP) per user: each reading "
        "weighted by microseconds until the user's next event (lead "
        "window); exact integer cents x microsecond durations, final "
        "ratio floor-scaled to ppm of a cent. Users with one event drop "
        "out (no holding interval)."
    ),
    oracle="""
        WITH spans AS (
            SELECT user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_c,
                   epoch_us(LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) - epoch_us(ts) AS dur_us
            FROM events
        )
        SELECT user_id,
               CAST(FLOOR(1e6 * (SUM(value_c * dur_us) / SUM(dur_us)))
                    AS BIGINT) AS twap_c_ppm,
               COUNT(*) AS n_spans
        FROM spans WHERE dur_us IS NOT NULL
        GROUP BY user_id
    """,
)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = events.select(
        "user_id",
        "value_c",
        (
            F.unix_micros(F.lead("ts").over(by_user)) - F.unix_micros(F.col("ts"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return spans.groupBy("user_id").agg(
        F.floor(
            F.lit(1e6)
            * (F.sum(F.col("value_c") * F.col("dur_us")) / F.sum("dur_us"))
        )
        .cast("long")
        .alias("twap_c_ppm"),
        F.count(F.lit(1)).alias("n_spans"),
    )


@register(
    "agg_rollup_gid",
    tags=("relational", "aggregation"),
    description=(
        "Rollup with GROUPING() disambiguation: subtotal rows labeled "
        "explicitly so a NULL group value and a NULL-as-subtotal marker "
        "can never be confused — the correctness nicety every BI layer "
        "on top of rollup needs."
    ),
    oracle="""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_gid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
        )
    )
