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
