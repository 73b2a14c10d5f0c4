"""Round-2 additions, batch 7: the remaining as-of directions
(forward / nearest, completing the pandas ``merge_asof`` direction
matrix), exact algebraic linear-regression aggregates (the ``regr_*``
family), deterministic mode + exact median, the ANSI ``try_*``
error-safe scalar family, the banded unkeyed interval-overlap join,
exact skewness/kurtosis, boolean aggregates, and ordered string
aggregation.

Reference scope note: the reference engine (a 3-file Hadoop MapReduce
job, SURVEY.md §0) has none of these; they belong to the generalized
query surface the engine claims (SURVEY.md §7.1). Float discipline
follows ``stats_queries.py``: exact integer sums, algebraic forms,
identical expression structure on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.operators.relational import (
    asof_join_forward,
    asof_join_nearest,
)
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "join_asof_fwd",
    tags=("relational", "join", "asof"),
    description=(
        "Forward as-of join (merge formulation, one shuffle): each event "
        "matched to the user's earliest order at-or-after the event."
    ),
    oracle="""
        WITH m AS (
            SELECT e.event_id, e.user_id, e.ts, MIN(o.o_orderdate) AS o_orderdate
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
            GROUP BY 1, 2, 3
        )
        SELECT m.event_id, m.user_id, m.ts, m.o_orderdate,
               MIN(o.o_orderkey) AS o_orderkey
        FROM m LEFT JOIN orders o
          ON o.o_custkey = m.user_id AND o.o_orderdate = m.o_orderdate
        GROUP BY 1, 2, 3, 4
    """,
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    return asof_join_forward(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderdate", "o_orderkey"],
    ).select("event_id", "user_id", "ts", "o_orderdate", "o_orderkey")


@register(
    "join_asof_nearest",
    tags=("relational", "join", "asof"),
    description=(
        "Nearest as-of join: closest order by absolute time distance, "
        "equidistant resolves backward (pandas merge_asof semantics); "
        "both directional carries share one hash exchange."
    ),
    oracle="""
        WITH b AS (
            SELECT e.event_id, e.user_id, e.ts, MAX(o.o_orderdate) AS bdate
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY 1, 2, 3
        ), f AS (
            SELECT e.event_id, MIN(o.o_orderdate) AS fdate
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
            GROUP BY 1
        ), pick AS (
            SELECT b.event_id, b.user_id, b.ts,
                   CASE WHEN f.fdate IS NULL THEN TRUE
                        WHEN b.bdate IS NULL THEN FALSE
                        WHEN epoch_us(b.ts) - epoch_us(CAST(b.bdate AS TIMESTAMP))
                             <= epoch_us(CAST(f.fdate AS TIMESTAMP)) - epoch_us(b.ts)
                        THEN TRUE ELSE FALSE END AS use_back,
                   b.bdate, f.fdate
            FROM b JOIN f ON f.event_id = b.event_id
        )
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN p.use_back THEN p.bdate ELSE p.fdate END AS o_orderdate,
               CASE WHEN p.use_back THEN MAX(o.o_orderkey)
                    ELSE MIN(o.o_orderkey) END AS o_orderkey
        FROM pick p LEFT JOIN orders o
          ON o.o_custkey = p.user_id
         AND o.o_orderdate = CASE WHEN p.use_back THEN p.bdate ELSE p.fdate END
        GROUP BY 1, 2, 3, 4, p.use_back
    """,
)
def join_asof_nearest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    return asof_join_nearest(
        events,
        orders,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderdate", "o_orderkey"],
    ).select("event_id", "user_id", "ts", "o_orderdate", "o_orderkey")


@register(
    "agg_regr_exact",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Linear-regression aggregate family (regr_slope/intercept/r2/"
        "avgx/avgy/count) from exact integer co-moment sums — the "
        "engine-independent algebraic formulation (stats_queries.py "
        "discipline); built-in streaming regr_* can never hash-match "
        "across engines."
    ),
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sx,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sy,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)
                       * CAST(ROUND(l_quantity) AS BIGINT)) AS sxx,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS syy,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS sxy
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS regr_n,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS regr_avgx,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS regr_avgy,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   AS regr_slope,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                   AS regr_intercept,
               ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                   / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   AS regr_r2
        FROM s
    """,
)
def agg_regr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial-agg'd shuffle on the group key; six int64 sums per
    group is the entire shuffle payload, so the plan is identical to a
    plain grouped sum at any scale. Co-moment sums stay inside 2^53
    (quantity <= 50, discount-cents <= 100 — n·sxy < 1e15 even at 1e11
    rows per group), so the doubles below start from exact integers and
    the identical expression tree yields bit-equal IEEE results on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity"), 0).cast("long")
    y = F.round(F.col("l_discount") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    dxy = n_d * F.col("sxy") - sx_d * F.col("sy")
    dxx = n_d * F.col("sxx") - sx_d * F.col("sx")
    dyy = n_d * F.col("syy") - sy_d * F.col("sy")
    slope = dxy / dxx
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("regr_n"),
        (sx_d / n_d).alias("regr_avgx"),
        (sy_d / n_d).alias("regr_avgy"),
        slope.alias("regr_slope"),
        ((sy_d - slope * sx_d) / n_d).alias("regr_intercept"),
        ((dxy * dxy) / (dxx * dyy)).alias("regr_r2"),
    )


@register(
    "agg_mode_median",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Deterministic MODE (highest count, ties to smallest value — "
        "built-in mode() is tie-nondeterministic across engines) and "
        "exact interpolated MEDIAN per group."
    ),
    oracle="""
        WITH counts AS (
            SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS q,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        ), m AS (
            SELECT l_returnflag, q AS qty_mode,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY cnt DESC, q ASC
                   ) AS rn
            FROM counts
        ), med AS (
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS price_median
            FROM lineitem GROUP BY 1
        )
        SELECT m.l_returnflag, m.qty_mode, med.price_median
        FROM m JOIN med ON med.l_returnflag = m.l_returnflag
        WHERE m.rn = 1
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode: per-(group, value) count (one partial-agg'd shuffle) then a
    WindowGroupLimit-style rank over the tiny distinct-value set — the
    second exchange moves one row per distinct value, not per input row.
    Median: exact interpolated percentile in a separate branch, joined
    on the 3-row group key (broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    counts = li.groupBy(F.col("l_returnflag"), q.alias("q")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("q").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("q").alias("qty_mode"))
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 6).alias("price_median")
    )
    return mode.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "qty_mode", "price_median"
    )


@register(
    "scalar_try_funcs",
    tags=("relational", "scalar"),
    description=(
        "ANSI error-safe scalar family: try_divide / try_cast / "
        "try_element_at return NULL where strict evaluation would raise."
    ),
    oracle="""
        SELECT o_orderkey,
               o_totalprice / NULLIF(o_orderkey % 5, 0) AS price_per_bucket,
               TRY_CAST(string_split(o_orderpriority, '-')[1] AS BIGINT)
                   AS prio_num,
               TRY_CAST(string_split(o_orderpriority, '-')[2] AS BIGINT)
                   AS prio_word_num,
               string_split(o_orderpriority, '-')[3] AS third_part
        FROM orders
    """,
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row Column expressions, zero shuffles; the try_* variants
    keep ANSI mode enabled pipelines total (NULL instead of runtime
    error) — the property that matters when one malformed row in 100 TB
    must not kill the job."""
    orders = load_table(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return orders.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), F.col("o_orderkey") % 5
        ).alias("price_per_bucket"),
        F.try_element_at(parts, F.lit(1))
        .try_cast("long")
        .alias("prio_num"),
        F.try_element_at(parts, F.lit(2))
        .try_cast("long")
        .alias("prio_word_num"),
        F.try_element_at(parts, F.lit(3)).alias("third_part"),
    )


@register(
    "join_interval_overlap",
    tags=("relational", "join", "timeseries"),
    description=(
        "Unkeyed interval-overlap join via time-bucket banding: pairs of "
        "concurrent sessions from different users, candidates generated "
        "by an equi-join on shared 30-minute buckets (any two overlapping "
        "intervals share the bucket of any common instant), then exact "
        "overlap verify."
    ),
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sess AS (
            SELECT user_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1 AS session_id,
                   ts
            FROM flagged
        ), s AS (
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   MIN(ts) AS t0, MAX(ts) AS t1
            FROM sess GROUP BY 1, 2
        )
        SELECT a.user_id AS user_a, a.session_id AS session_a,
               b.user_id AS user_b, b.session_id AS session_b,
               GREATEST(a.t0, b.t0) AS overlap_start,
               LEAST(a.t1, b.t1) AS overlap_end
        FROM s a JOIN s b
          ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The θ-join a naive plan would use explodes to |sessions|² under
    BroadcastNestedLoopJoin; banding replaces it with an equi-join whose
    cost is Σ per-bucket-count² — bounded by true concurrency, the same
    blocking idea as LSH dedup. Each interval explodes into the 30-min
    buckets it touches (short sessions → ~1-2 rows), candidates meet on
    the bucket key, exact overlap + user_a < user_b filter, then one
    distinct de-dups pairs that share several buckets. Three narrow
    shuffles (session agg, bucket join, distinct), no nested loop."""
    from hadoop_map_reduce_spark.operators.relational import sessionize

    events = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(
            events, key="user_id", time_col="ts", gap_seconds=1800,
            order_tiebreak="event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    bucketed = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("t0") / 1800),
                F.floor(F.unix_timestamp("t1") / 1800),
            )
        ),
    )
    a = bucketed.select(
        "bucket",
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("session_a"),
        F.col("t0").alias("a0"),
        F.col("t1").alias("a1"),
    )
    b = bucketed.select(
        "bucket",
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("session_b"),
        F.col("t0").alias("b0"),
        F.col("t1").alias("b1"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1"))
        )
        .select(
            "user_a",
            "session_a",
            "user_b",
            "session_b",
            F.greatest("a0", "b0").alias("overlap_start"),
            F.least("a1", "b1").alias("overlap_end"),
        )
        .distinct()
    )


@register(
    "agg_skew_kurtosis",
    tags=("relational", "aggregation", "stats"),
    description=(
        "Population skewness and excess kurtosis from exact integer "
        "raw-moment sums (algebraic central-moment forms) — the "
        "engine-independent formulation; streaming built-ins can never "
        "hash-match across engines."
    ),
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS s1,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s2,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s3,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s4
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               ((CAST(s3 AS DOUBLE) / n)
                - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
               / (SQRT((CAST(s2 AS DOUBLE) / n)
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                  * ((CAST(s2 AS DOUBLE) / n)
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                   AS disc_skewness,
               ((CAST(s4 AS DOUBLE) / n)
                - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
               / (((CAST(s2 AS DOUBLE) / n)
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                  * ((CAST(s2 AS DOUBLE) / n)
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
               - 3 AS disc_kurtosis
        FROM s
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same one-shuffle shape as agg_regr_exact: four int64 power sums
    per group are the entire shuffle payload. Raw sums stay inside 2^53
    (cents <= 100 -> cents^4 <= 1e8; exact to ~1e7 rows/group at 4th
    power, far past any per-group row count after partial agg). m2^1.5
    is written sqrt(m2)*m2 — sqrt is IEEE correctly-rounded where pow()
    is implementation-defined and may differ between JVM and C++."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.round(F.col("l_discount") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("s1"),
        F.sum(y * y).alias("s2"),
        F.sum(y * y * y).alias("s3"),
        F.sum(y * y * y * y).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    m2 = r2 - m1 * m1
    m3 = r3 - F.lit(3) * m1 * r2 + F.lit(2) * m1 * m1 * m1
    m4 = (
        r4
        - F.lit(4) * m1 * r3
        + F.lit(6) * m1 * m1 * r2
        - F.lit(3) * m1 * m1 * m1 * m1
    )
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        (m3 / (F.sqrt(m2) * m2)).alias("disc_skewness"),
        (m4 / (m2 * m2) - F.lit(3)).alias("disc_kurtosis"),
    )


@register(
    "agg_bool_funcs",
    tags=("relational", "aggregation"),
    description=(
        "Boolean aggregate family: bool_and / bool_or / count_if and the "
        "deterministic any_value stand-in (MIN)."
    ),
    oracle="""
        SELECT l_returnflag,
               BOOL_AND(l_discount < 0.1) AS all_low_disc,
               BOOL_OR(l_quantity > 45) AS some_big_qty,
               CAST(COUNT(*) FILTER (WHERE l_tax > 0.05) AS BIGINT)
                   AS n_high_tax,
               MIN(l_linestatus) AS any_status
        FROM lineitem GROUP BY 1
    """,
)
def agg_bool_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") < 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") > 45).alias("some_big_qty"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_high_tax"),
        F.min("l_linestatus").alias("any_status"),
    )


@register(
    "agg_string_concat",
    tags=("relational", "aggregation"),
    description=(
        "Ordered string aggregation (LISTAGG/STRING_AGG semantics): "
        "deterministic by sorting the distinct elements before joining — "
        "unordered string_agg is partition-order-nondeterministic."
    ),
    oracle="""
        SELECT o_orderstatus,
               STRING_AGG(DISTINCT o_orderpriority, ','
                          ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios
        FROM orders GROUP BY 1
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("o_orderpriority"))
        ).alias("priorities"),
        F.count_distinct("o_orderpriority").cast("long").alias("n_prios"),
    )
