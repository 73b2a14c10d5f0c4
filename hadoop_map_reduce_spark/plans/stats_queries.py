"""Statistical aggregates and complex-type (array) coverage.

stddev/variance/correlation are computed from EXACT integer sums via their
algebraic forms — `F.stddev`/`corr` built-ins use streaming co-moment
updates whose floating-point result depends on partition order, so they
can never be bit-compared across engines; the algebraic form over exact
sums is engine-independent. (The built-ins remain available to users; this
registry entry is the verifiable formulation.)

Overflow notes: summed squares stay well inside int64 because the scaled
bases are small (quantity <= 50, discount-cents <= 100).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "agg_stats_exact",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Sample stddev/variance from exact integer sums (algebraic form): "
        "engine-independent where streaming-update built-ins are not."
    ),
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS s1,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)
                       * CAST(ROUND(l_quantity) AS BIGINT)) AS s2
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS qty_var,
               SQRT((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n AS DOUBLE) * (n - 1))) AS qty_stddev
        FROM s
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    n_d = F.col("n").cast("double")
    var = (n_d * F.col("s2") - F.col("s1").cast("double") * F.col("s1")) / (
        n_d * (F.col("n") - 1)
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        var.alias("qty_var"),
        F.sqrt(var).alias("qty_stddev"),
    )


@register(
    "agg_corr_exact",
    tags=("relational", "aggregation", "stats"),
    description="Pearson correlation from exact integer co-moment sums.",
    oracle="""
        WITH s AS (
            SELECT COUNT(*) AS n,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sx,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sy,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)
                       * CAST(ROUND(l_quantity) AS BIGINT)) AS sxx,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS syy,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS sxy
            FROM lineitem
        )
        SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS qty_disc_corr
        FROM s
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity"), 0).cast("long")
    y = F.round(F.col("l_discount") * 100, 0).cast("long")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    corr = (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * F.sqrt(n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(corr.alias("qty_disc_corr"))


@register(
    "agg_percentiles",
    tags=("relational", "aggregation", "stats"),
    description="Exact interpolated percentiles (median / p90), rounded 6dp.",
    oracle="""
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
        FROM orders GROUP BY 1
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "complex_array_funcs",
    tags=("relational", "scalar", "complex"),
    description=(
        "Array-column function family over embeddings: size, indexing, "
        "slicing, ordered fold (explicit reduce so both engines associate "
        "identically)."
    ),
    oracle="""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
        SELECT vec_id,
               CAST(len(v) AS INT) AS dim,
               ROUND(v[1], 6) AS first_val,
               ROUND(v[len(v)], 6) AS last_val,
               ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                              list_slice(v, 1, 8)),
                                 (acc, x) -> acc + x), 6) AS head_sum,
               ROUND(list_max(v), 6) AS max_val,
               ROUND(list_min(v), 6) AS min_val
        FROM e
    """,
)
def complex_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    df = emb.select("vec_id", v.alias("v"))
    return df.select(
        "vec_id",
        F.size("v").alias("dim"),
        F.round(F.element_at("v", 1), 6).alias("first_val"),
        F.round(F.element_at("v", F.size("v")), 6).alias("last_val"),
        F.round(
            F.aggregate(
                F.slice("v", 1, 8), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("head_sum"),
        F.round(F.array_max("v"), 6).alias("max_val"),
        F.round(F.array_min("v"), 6).alias("min_val"),
    )


@register(
    "agg_mad_outliers",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Robust outlier detection per event type: median absolute "
        "deviation on integer cents (every median a multiple of 0.5, "
        "every deviation-median a multiple of 0.25 — binary-exact on "
        "both engines), outliers = |x - median| > 3*MAD. Exact medians "
        "buffer per-group values, so the 100-TB path is the t-digest "
        "sketch twin (sketch_quantile_check); this exact formulation is "
        "the parity/verify stage, same standing as agg_mode_median."
    ),
    oracle="""
        WITH med AS (
            SELECT event_type,
                   median(CAST(ROUND(value * 100) AS BIGINT)) AS med_c
            FROM events GROUP BY 1
        ), dev AS (
            SELECT e.event_type, m.med_c,
                   ABS(CAST(ROUND(e.value * 100) AS BIGINT) - m.med_c)
                       AS dev_c
            FROM events e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, median(dev_c) AS mad_c
            FROM dev GROUP BY 1
        )
        SELECT d.event_type,
               MAX(d.med_c) AS med_c,
               MAX(m.mad_c) AS mad_c,
               CAST(SUM(CASE WHEN d.dev_c > 3 * m.mad_c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers,
               COUNT(*) AS n_events
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    med = events.groupBy("event_type").agg(
        F.median("value_c").alias("med_c")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_c",
        F.abs(F.col("value_c") - F.col("med_c")).alias("dev_c"),
    )
    mad = dev.groupBy("event_type").agg(F.median("dev_c").alias("mad_c"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med_c").alias("med_c"),
            F.max("mad_c").alias("mad_c"),
            F.sum(
                F.when(F.col("dev_c") > 3 * F.col("mad_c"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "user_type_gini",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Behavioral diversity per user: Gini impurity of the event-type "
        "distribution, 1 - sum(p_i^2), kept engine-exact as the integer "
        "rational floor(1e6 * (n^2 - sum(n_i^2)) / n^2) — no logarithms "
        "(entropy's libm ln is implementation-defined), same information "
        "ordering. Two narrow shuffles: (user, type) counts, then per-"
        "user sums of squares."
    ),
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS n_i
            FROM events GROUP BY 1, 2
        ), sums AS (
            SELECT user_id,
                   CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(SUM(n_i * n_i) AS BIGINT) AS ss,
                   COUNT(*) AS n_types
            FROM counts GROUP BY 1
        )
        SELECT user_id, n, n_types,
               CAST(FLOOR(1e6 * ((n * n - ss) / (n * n))) AS BIGINT)
                   AS gini_ppm
        FROM sums
    """,
)
def user_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_i")
    )
    sums = counts.groupBy("user_id").agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum(F.col("n_i") * F.col("n_i")).cast("long").alias("ss"),
        F.count(F.lit(1)).alias("n_types"),
    )
    n2 = F.col("n") * F.col("n")
    return sums.select(
        "user_id",
        "n",
        "n_types",
        F.floor(F.lit(1e6) * ((n2 - F.col("ss")) / n2))
        .cast("long")
        .alias("gini_ppm"),
    )


@register(
    "agg_winsorized_mean",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Winsorized (quartile-clipped) mean per event type: values "
        "clipped to the exact interpolated [Q1, Q3] on integer cents — "
        "quartiles are multiples of 0.25 (binary-exact cross-engine), "
        "clipped sums exact, final mean rounded to 6."
    ),
    oracle="""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.25)
                       AS q1,
                   quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.75)
                       AS q3
            FROM events GROUP BY 1
        )
        SELECT e.event_type,
               MAX(q.q1) AS q1_c,
               MAX(q.q3) AS q3_c,
               ROUND(AVG(
                   CASE WHEN CAST(ROUND(e.value * 100) AS BIGINT) < q.q1
                            THEN q.q1
                        WHEN CAST(ROUND(e.value * 100) AS BIGINT) > q.q3
                            THEN q.q3
                        ELSE CAST(ROUND(e.value * 100) AS BIGINT) END
               ), 6) AS winsorized_mean_c,
               COUNT(*) AS n_events
        FROM events e JOIN q USING (event_type)
        GROUP BY 1
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    q = events.groupBy("event_type").agg(
        F.expr("percentile(value_c, 0.25)").alias("q1"),
        F.expr("percentile(value_c, 0.75)").alias("q3"),
    )
    clipped = F.when(F.col("value_c") < F.col("q1"), F.col("q1")).when(
        F.col("value_c") > F.col("q3"), F.col("q3")
    ).otherwise(F.col("value_c"))
    return (
        events.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("q1").alias("q1_c"),
            F.max("q3").alias("q3_c"),
            F.round(F.avg(clipped), 6).alias("winsorized_mean_c"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "feature_quantile_normalize",
    tags=("relational", "window", "stats"),
    description=(
        "Rank-based quantile normalization per event type (the feature-"
        "prep transform that makes any two groups' distributions "
        "comparable): each value's percent rank within its type as the "
        "exact integer rational floor(1e6*(rk-1)/(n-1)), deterministic "
        "ties (value, event_id)."
    ),
    oracle="""
        WITH ranked AS (
            SELECT event_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_c,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100) AS BIGINT),
                                event_id
                   ) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM events
        )
        SELECT event_id, event_type, value_c,
               CAST(FLOOR(1e6 * ((rk - 1) / (n - 1))) AS BIGINT)
                   AS qnorm_ppm
        FROM ranked
    """,
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    by_type = Window.partitionBy("event_type").orderBy("value_c", "event_id")
    n_w = Window.partitionBy("event_type")
    ranked = events.select(
        "event_id",
        "event_type",
        "value_c",
        F.row_number().over(by_type).cast("long").alias("rk"),
        F.count(F.lit(1)).over(n_w).cast("long").alias("n"),
    )
    return ranked.select(
        "event_id",
        "event_type",
        "value_c",
        F.floor(F.lit(1e6) * ((F.col("rk") - 1) / (F.col("n") - 1)))
        .cast("long")
        .alias("qnorm_ppm"),
    )


@register(
    "agg_weighted_median",
    tags=("relational", "aggregation", "stats", "window"),
    description=(
        "Exact weighted (lower) median per return flag: extended price "
        "in cents weighted by quantity — the smallest value whose "
        "cumulative weight reaches half the total (deterministic "
        "cumulative order: value, line identity). All-integer; the "
        "weighted order statistic no built-in aggregate provides."
    ),
    oracle="""
        WITH w AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                   CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                   l_orderkey, l_linenumber
            FROM lineitem
        ), cum AS (
            SELECT l_returnflag, price_c,
                   SUM(qty) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY price_c, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING
                   ) AS cw,
                   SUM(qty) OVER (PARTITION BY l_returnflag) AS tw
            FROM w
        )
        SELECT l_returnflag,
               CAST(MIN(price_c) AS BIGINT) AS weighted_median_c,
               CAST(MAX(tw) AS BIGINT) AS total_weight
        FROM cum WHERE 2 * cw >= tw
        GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    cum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_c", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "price_c",
        F.sum("qty").over(cum_w).alias("cw"),
        F.sum("qty").over(tot_w).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_c").cast("long").alias("weighted_median_c"),
            F.max("tw").cast("long").alias("total_weight"),
        )
    )
