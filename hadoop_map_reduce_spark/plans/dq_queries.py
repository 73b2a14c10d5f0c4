"""Data-quality audit queries: constraint violations counted in one scan
(see operators/dq.py). The audit is how a pipeline refuses bad ingests;
both entries return (rule, n_violations) rows and are exactly
SQL-expressible, so the driver hash-checks them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.operators.dq import audit
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

_ORDERS_AUDIT_ORACLE = """
    SELECT 'null_key' AS rule,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'negative_price',
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'bad_status',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'date_out_of_range',
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                           OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    -- COUNT(col) counts non-null rows: null-keyed rows are excluded from
    -- both terms (they are the null rule's violations, not duplicates)
    SELECT 'dup_key', CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
"""


@register(
    "dq_orders_audit",
    tags=("relational", "dq", "aggregation"),
    description=(
        "Data-quality audit of orders: null/duplicate keys, negative "
        "totals, enum drift, date range — all rules in one aggregate "
        "scan, unpivoted to (rule, n_violations)."
    ),
    oracle=_ORDERS_AUDIT_ORACLE,
)
def dq_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return audit(
        orders,
        {
            "null_key": F.col("o_orderkey").isNull(),
            "negative_price": F.col("o_totalprice") < 0,
            "bad_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "date_out_of_range": (
                F.col("o_orderdate")
                < F.lit("1992-01-01 00:00:00").cast("timestamp")
            )
            | (
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            ),
        },
        unique_keys={"dup_key": ["o_orderkey"]},
    )


_DOCS_AUDIT_ORACLE = """
    SELECT 'null_text' AS rule,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM documents
    UNION ALL
    SELECT 'char_count_drift',
           CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'empty_doc',
           CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'dup_doc_id', CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
"""


@register(
    "dq_documents_audit",
    tags=("llm", "dq", "aggregation"),
    description=(
        "Corpus-ingest audit: null/empty text, metadata drift (n_chars "
        "vs actual length), duplicate doc ids — the refuse-bad-ingest "
        "gate of a corpus pipeline, one aggregate scan."
    ),
    oracle=_DOCS_AUDIT_ORACLE,
)
def dq_documents_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return audit(
        docs,
        {
            "null_text": F.col("text").isNull(),
            "char_count_drift": F.col("n_chars") != F.length("text"),
            "empty_doc": F.length(F.trim(F.col("text"))) == 0,
        },
        unique_keys={"dup_doc_id": ["doc_id"]},
    )


@register(
    "dq_value_drift",
    tags=("relational", "dq", "aggregation"),
    description=(
        "Distribution-drift monitor: chi-square statistic per event type "
        "comparing the second half-month's value histogram (10 fixed "
        "50.00-wide bins) against the first half's proportions — the "
        "refuse-drifted-batch gate. Per-bin terms floor-scaled to ppm "
        "BIGINTs before summing, so the statistic is engine-exact."
    ),
    oracle="""
        WITH binned AS (
            SELECT event_type,
                   LEAST(CAST(FLOOR(CAST(ROUND(value * 100) AS BIGINT)
                                    / 5000) AS BIGINT), 9) AS bin,
                   CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT *,
                   SUM(n_a) OVER (PARTITION BY event_type) AS total_a,
                   SUM(n_b) OVER (PARTITION BY event_type) AS total_b
            FROM binned
        ), terms AS (
            SELECT event_type, total_a, total_b,
                   CAST(FLOOR(
                       1e6 * ((n_b - total_b * (n_a / total_a))
                              * (n_b - total_b * (n_a / total_a)))
                           / (total_b * (n_a / total_a))
                   ) AS BIGINT) AS term_ppm
            FROM tot WHERE n_a > 0
        )
        SELECT event_type,
               CAST(MAX(total_a) AS BIGINT) AS total_a,
               CAST(MAX(total_b) AS BIGINT) AS total_b,
               CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm,
               COUNT(*) AS n_bins
        FROM terms GROUP BY event_type
    """,
)
def dq_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.least(
            F.floor(
                F.round(F.col("value") * 100).cast("long") / F.lit(5000)
            ).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
    )
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    binned = events.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    by_type = Window.partitionBy("event_type")
    tot = binned.select(
        "event_type",
        "n_a",
        "n_b",
        F.sum("n_a").over(by_type).alias("total_a"),
        F.sum("n_b").over(by_type).alias("total_b"),
    )
    expected = F.col("total_b") * (F.col("n_a") / F.col("total_a"))
    terms = tot.filter(F.col("n_a") > 0).select(
        "event_type",
        "total_a",
        "total_b",
        F.floor(
            F.lit(1e6)
            * ((F.col("n_b") - expected) * (F.col("n_b") - expected))
            / expected
        )
        .cast("long")
        .alias("term_ppm"),
    )
    return terms.groupBy("event_type").agg(
        F.max("total_a").cast("long").alias("total_a"),
        F.max("total_b").cast("long").alias("total_b"),
        F.sum("term_ppm").cast("long").alias("chi2_ppm"),
        F.count(F.lit(1)).alias("n_bins"),
    )


@register(
    "dq_fd_violations",
    tags=("relational", "dq", "aggregation"),
    description=(
        "Functional-dependency profiling over orders: for each candidate "
        "FD lhs->rhs, how many lhs keys map to more than one rhs value "
        "and how many rows sit in those violating groups — the "
        "dependency-discovery primitive of a data profiler. One scan per "
        "FD, partial-aggregated."
    ),
    oracle="""
        WITH fd1 AS (
            SELECT o_custkey AS k, COUNT(DISTINCT o_orderstatus) AS d,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        ), fd2 AS (
            SELECT o_orderdate AS k, COUNT(DISTINCT o_orderpriority) AS d,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        ), fd3 AS (
            SELECT o_orderkey AS k, COUNT(DISTINCT o_custkey) AS d,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT 'custkey->orderstatus' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_keys,
               CAST(SUM(CASE WHEN d > 1 THEN n ELSE 0 END) AS BIGINT)
                   AS n_violating_rows
        FROM fd1
        UNION ALL
        SELECT 'orderdate->orderpriority',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN d > 1 THEN n ELSE 0 END) AS BIGINT)
        FROM fd2
        UNION ALL
        SELECT 'orderkey->custkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN d > 1 THEN n ELSE 0 END) AS BIGINT)
        FROM fd3
    """,
)
def dq_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def fd(name: str, lhs: str, rhs: str) -> DataFrame:
        g = orders.groupBy(F.col(lhs).alias("k")).agg(
            F.countDistinct(rhs).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        return g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_keys"),
            F.sum(F.when(F.col("d") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_violating_rows"),
        )

    return (
        fd("custkey->orderstatus", "o_custkey", "o_orderstatus")
        .unionByName(fd("orderdate->orderpriority", "o_orderdate",
                        "o_orderpriority"))
        .unionByName(fd("orderkey->custkey", "o_orderkey", "o_custkey"))
    )


@register(
    "dq_key_skew",
    tags=("relational", "dq", "aggregation"),
    description=(
        "Join-key skew diagnostics: per candidate shuffle key, key/row "
        "counts, the hottest key's row count, mean rows per key and the "
        "hot/mean skew ratio (exact integer rationals, ppm), and how "
        "many keys exceed 10x the mean — the pre-flight check that "
        "tells you a shuffle needs salting/AQE skew handling BEFORE the "
        "100-TB join runs."
    ),
    oracle="""
        WITH g1 AS (
            SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1
        ), g2 AS (
            SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1
        ), g3 AS (
            SELECT source AS k, COUNT(*) AS n FROM documents GROUP BY 1
        ), t1 AS (
            SELECT COUNT(*) AS nk, SUM(n) AS nr, MAX(n) AS mx FROM g1
        ), t2 AS (
            SELECT COUNT(*) AS nk, SUM(n) AS nr, MAX(n) AS mx FROM g2
        ), t3 AS (
            SELECT COUNT(*) AS nk, SUM(n) AS nr, MAX(n) AS mx FROM g3
        )
        SELECT 'events.user_id' AS key_name,
               CAST(nk AS BIGINT) AS n_keys,
               CAST(nr AS BIGINT) AS n_rows,
               CAST(mx AS BIGINT) AS max_key_rows,
               CAST(FLOOR(1e6 * (nr / nk)) AS BIGINT) AS mean_rows_ppm,
               CAST(FLOOR(1e6 * ((mx * nk) / nr)) AS BIGINT)
                   AS skew_ratio_ppm,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM g1, t1
                WHERE n * nk > 10 * nr) AS n_hot_keys
        FROM t1
        UNION ALL
        SELECT 'lineitem.l_orderkey',
               CAST(nk AS BIGINT), CAST(nr AS BIGINT), CAST(mx AS BIGINT),
               CAST(FLOOR(1e6 * (nr / nk)) AS BIGINT),
               CAST(FLOOR(1e6 * ((mx * nk) / nr)) AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM g2, t2
                WHERE n * nk > 10 * nr)
        FROM t2
        UNION ALL
        SELECT 'documents.source',
               CAST(nk AS BIGINT), CAST(nr AS BIGINT), CAST(mx AS BIGINT),
               CAST(FLOOR(1e6 * (nr / nk)) AS BIGINT),
               CAST(FLOOR(1e6 * ((mx * nk) / nr)) AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM g3, t3
                WHERE n * nk > 10 * nr)
        FROM t3
    """,
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    def skew(df: DataFrame, col: str, label: str) -> DataFrame:
        g = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        # hot-key rule n > 10*mean, kept integral: n * n_keys > 10 * n_rows
        tot = g.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_key_rows"),
        )
        hot = (
            g.crossJoin(F.broadcast(tot))
            .filter(F.col("n") * F.col("n_keys") > 10 * F.col("n_rows"))
            .agg(F.count(F.lit(1)).alias("n_hot_keys"))
        )
        return tot.crossJoin(F.broadcast(hot)).select(
            F.lit(label).alias("key_name"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("max_key_rows").cast("long").alias("max_key_rows"),
            F.floor(F.lit(1e6) * (F.col("n_rows") / F.col("n_keys")))
            .cast("long")
            .alias("mean_rows_ppm"),
            F.floor(
                F.lit(1e6)
                * ((F.col("max_key_rows") * F.col("n_keys")) / F.col("n_rows"))
            )
            .cast("long")
            .alias("skew_ratio_ppm"),
            F.col("n_hot_keys").cast("long").alias("n_hot_keys"),
        )

    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")
    return (
        skew(events, "user_id", "events.user_id")
        .unionByName(skew(lineitem, "l_orderkey", "lineitem.l_orderkey"))
        .unionByName(skew(documents, "source", "documents.source"))
    )


@register(
    "dq_fk_orphans",
    tags=("relational", "dq", "join", "aggregation"),
    description=(
        "Referential-integrity audit: orphaned foreign keys counted per "
        "relationship (lineitem->orders, orders->customer, events.user_"
        "id->customer) via left anti joins — the cross-table complement "
        "of the single-table audits. Dim side broadcasts; the fact scan "
        "is touched once per relationship."
    ),
    oracle="""
        SELECT 'lineitem->orders' AS fk,
               CAST(COUNT(*) AS BIGINT) AS n_orphans,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orphan_keys
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orders->customer',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'events->customer',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT)
        FROM events e
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    events = load_table(spark, sf_dir, "events").select("user_id")

    def orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
                label: str) -> DataFrame:
        o = fact.join(
            F.broadcast(dim), fact[fk] == dim[pk], "left_anti"
        )
        return o.agg(
            F.lit(label).alias("fk"),
            F.count(F.lit(1)).cast("long").alias("n_orphans"),
            F.countDistinct(fk).cast("long").alias("n_orphan_keys"),
        )

    return (
        orphans(lineitem, "l_orderkey", orders.select("o_orderkey"),
                "o_orderkey", "lineitem->orders")
        .unionByName(orphans(orders, "o_custkey", customer, "c_custkey",
                             "orders->customer"))
        .unionByName(orphans(events, "user_id", customer, "c_custkey",
                             "events->customer"))
    )


_EMB_AUDIT_ORACLE = """
    SELECT 'null_embedding' AS rule,
           CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM embeddings
    UNION ALL
    SELECT 'bad_dim',
           CAST(SUM(CASE WHEN embedding IS NOT NULL
                          AND len(embedding) <> 64
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM embeddings
    UNION ALL
    SELECT 'has_nan',
           CAST(SUM(CASE WHEN embedding IS NOT NULL AND len(list_filter(
                             embedding, x -> isnan(CAST(x AS DOUBLE)))) > 0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM embeddings
    UNION ALL
    SELECT 'zero_vector',
           CAST(SUM(CASE WHEN embedding IS NOT NULL AND list_sum(
                             [abs(CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 0
                                   ELSE CAST(ROUND(CAST(x AS DOUBLE)
                                             * 1000000) AS BIGINT)
                                   END) for x in embedding]) = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM embeddings
    UNION ALL
    SELECT 'norm_out_of_bounds',
           CAST(SUM(CASE WHEN embedding IS NOT NULL AND list_sum(
                             [CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 0
                               ELSE CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                         AS BIGINT)
                                    * CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                           AS BIGINT)
                               END for x in embedding])
                             > 4096000000000000
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM embeddings
    UNION ALL
    SELECT 'dup_vec_id',
           CAST(COUNT(vec_id) - COUNT(DISTINCT vec_id) AS BIGINT)
    FROM embeddings
"""


@register(
    "dq_embedding_audit",
    tags=("llm", "dq", "similarity", "aggregation"),
    description=(
        "Embedding-store audit: null/mis-dimensioned/NaN vectors, exact "
        "zero vectors and norm outliers (micro-unit BIGINT sum of "
        "squares vs a literal bound, engine-exact), duplicate vec ids — "
        "the refuse-bad-index gate before any ANN build, one aggregate "
        "scan."
    ),
    oracle=_EMB_AUDIT_ORACLE,
)
def dq_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm rule: sum of squared micro-units > 64 * (8e6)^2 — i.e. an
    RMS coordinate above 8.0 — flags mis-scaled ingests without any
    float accumulation (the int8-quantization precheck). NaN detection
    runs BEFORE quantization: round(NaN) would poison the integer
    path, so the rules are ordered the way a real gate would run."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    # NaN coordinates must not reach the integer cast (ANSI overflow
    # error) — they are has_nan's violations; the integer rules treat
    # them as 0 so the audit REPORTS a poisoned ingest instead of
    # crashing on it (exposed by the dirty-table test).
    e6 = F.transform(
        vec,
        lambda x: F.when(F.isnan(x), F.lit(0))
        .otherwise(F.round(x * 1e6))
        .cast("long"),
    )
    nonnull = F.col("embedding").isNotNull()
    return audit(
        emb,
        {
            "null_embedding": F.col("embedding").isNull(),
            "bad_dim": nonnull & (F.size("embedding") != 64),
            "has_nan": nonnull & F.exists(vec, lambda x: F.isnan(x)),
            "zero_vector": nonnull
            & (
                F.aggregate(
                    F.transform(e6, F.abs),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                == 0
            ),
            "norm_out_of_bounds": nonnull
            & (
                F.aggregate(
                    F.transform(e6, lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                > F.lit(4096000000000000)
            ),
        },
        unique_keys={"dup_vec_id": ["vec_id"]},
    )
