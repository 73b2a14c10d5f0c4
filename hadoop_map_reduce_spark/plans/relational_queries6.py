"""Sixth relational batch: group-wise top-k, ntile bucketing, and a
fixed-bin histogram.

``topk_per_group`` is the QUALIFY / ROW_NUMBER-filter pattern — distinct
from the global ``topk_lineitems`` (TakeOrderedAndProject): the limit is
per group, so Spark's planner must bound the per-partition sort instead
of the whole result. Spark >= 3.5 does exactly that when the rank filter
is statically visible (InferWindowGroupLimit -> a ``WindowGroupLimit``
physical node keeps only k rows per key BEFORE and after the exchange),
which is what makes this shape viable at 100 TB: the shuffle carries at
most k rows per (partition, key), not the whole table. Plan-tested in
tests/test_plan_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "topk_per_group",
    tags=("relational", "window", "topk"),
    description=(
        "Top-3 orders by total price within each order priority — the "
        "group-wise top-k (QUALIFY) pattern: row_number over a "
        "(priority ordered by price desc) window, filtered to <= 3. "
        "Deterministic tie-break on o_orderkey."
    ),
    oracle="""
        SELECT o_orderpriority, rk, o_orderkey, o_totalprice
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS BIGINT) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-filter is applied directly on the row_number column so
    Catalyst's InferWindowGroupLimit fires: the physical plan carries a
    ``WindowGroupLimit`` on the map side (each input partition forwards
    at most 3 rows per priority into the exchange) and again on the
    reduce side — per-group top-k without sorting any group fully."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


@register(
    "window_ntile",
    tags=("relational", "window"),
    description=(
        "ntile(4) quartile assignment of customers by account balance "
        "within each market segment, rolled up to per-(segment, quartile) "
        "counts and balance bounds. Deterministic ordering tie-break on "
        "c_custkey makes ntile's uneven-bucket assignment reproducible."
    ),
    oracle="""
        SELECT c_mktsegment, quartile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal
        FROM (
            SELECT c_mktsegment, c_acctbal,
                   CAST(NTILE(4) OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal ASC, c_custkey ASC
                   ) AS INT) AS quartile
            FROM customer
        )
        GROUP BY c_mktsegment, quartile
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exchange on the segment key serves both the ntile window and
    the following aggregate (the groupBy keys extend the window
    partition key, so no second shuffle is needed for the rollup)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal", "c_custkey"
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    )
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "events_histogram",
    tags=("timeseries", "aggregation", "stats"),
    description=(
        "Fixed-bin histogram of event values: 10 bins of width 50 over "
        "[0, 500), open-ended clamp on both ends — the floor-arithmetic "
        "formulation is engine-portable (no width_bucket dialect "
        "dependence) and is a single scan + single agg shuffle."
    ),
    oracle="""
        SELECT CAST(LEAST(GREATEST(FLOOR(value / 50.0), 0), 9) AS INT)
                   AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1
    """,
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogramming at 100 TB is the map-side-combine ideal: 10
    accumulator rows per task, one 10-row exchange. The bin expression
    stays in whole-stage codegen (floor/least/greatest are all
    JVM-native); only (value) is read from the scan."""
    events = load_table(spark, sf_dir, "events").select("value")
    bin_col = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(50.0)), F.lit(0)),
        F.lit(9),
    ).cast("int")
    return (
        events.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


_RECURSIVE_CHAIN = """
    WITH RECURSIVE edges AS (
        SELECT n_nationkey AS src,
               COALESCE(
                   LEAD(n_nationkey) OVER (
                       PARTITION BY n_regionkey ORDER BY n_nationkey
                   ),
                   MIN(n_nationkey) OVER (PARTITION BY n_regionkey)
               ) AS dst
        FROM nation
    ),
    reach(nk, depth) AS (
        SELECT CAST(0 AS BIGINT) AS nk, 0 AS depth
        UNION ALL
        SELECT e.dst AS nk, r.depth + 1 AS depth
        FROM reach r JOIN edges e ON e.src = r.nk
        WHERE r.depth < 12
    )
    SELECT nk,
           CAST(COUNT(*) AS BIGINT) AS n_visits,
           MIN(depth) AS first_depth
    FROM reach
    GROUP BY nk
"""


@register(
    "recursive_nation_chain",
    tags=("relational", "subquery", "graph"),
    description=(
        "Native WITH RECURSIVE (Spark >= 4.0): depth-limited reachability "
        "walk over the per-region nation ring (each nation points to the "
        "next key in its region, wrapping). One SQL string runs verbatim "
        "on both engines — the SQL-surface twin of the iterative "
        "DataFrame algorithms (dedup_clusters, graph_pagerank), which "
        "remain the tuned path for data-sized graphs."
    ),
    oracle=_RECURSIVE_CHAIN,
)
def recursive_nation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark executes the recursion as iterated unions with the same
    per-step shuffle shape as a hand-rolled loop; the depth guard bounds
    the iteration exactly like the loop counters in operators/clustering.
    Out-degree here is 1, so state stays one row per step — the guard,
    not row growth, ends the recursion."""
    from hadoop_map_reduce_spark.session import register_views

    register_views(spark, sf_dir, "nation")
    return spark.sql(_RECURSIVE_CHAIN)


@register(
    "scalar_variant_funcs",
    tags=("relational", "scalar", "json"),
    description=(
        "VARIANT ingestion (Spark >= 4.0): parse_json(props) into the "
        "binary variant encoding, typed extraction via variant_get and "
        "per-value type introspection via schema_of_variant — the "
        "schema-on-read path for heterogeneous JSON event payloads. The "
        "oracle extracts the same values through DuckDB's JSON operators."
    ),
    oracle="""
        SELECT event_id,
               CAST(props->>'k' AS BIGINT) AS k_val,
               'BIGINT' AS k_type
        FROM events
        WHERE CAST(props->>'k' AS BIGINT) IS NOT NULL
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT keeps the parsed tree in a binary columnar encoding, so
    repeated extractions don't re-parse the JSON text (get_json_object
    re-parses per call — see scalar_json_funcs for the classic path).
    Values stay JVM-side; both functions are codegen expressions."""
    events = load_table(spark, sf_dir, "events").select("event_id", "props")
    v = F.parse_json("props")
    extracted = events.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_val"),
        F.schema_of_variant(F.variant_get(v, "$.k", "variant")).alias(
            "k_type"
        ),
    )
    return extracted.filter(F.col("k_val").isNotNull())


_CDC_DELETES_SQL = """
    WITH batch AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
               'X' AS o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) + 500 AS price_cents
        FROM orders
        WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 = 0
    ),
    base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
    )
    SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.price_cents
    FROM base b
    WHERE NOT EXISTS (
        SELECT 1 FROM batch c WHERE c.o_orderkey = b.o_orderkey
    )
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
    FROM batch WHERE op <> 'D'
"""


@register(
    "merge_apply_cdc_deletes",
    tags=("relational", "join"),
    description=(
        "Full CDC apply including deletes (operators.relational."
        "apply_cdc): a deterministic change batch — updates for keys "
        "%10=0, tombstones for keys %7=0 — applied to orders. Every "
        "batched key leaves the target via one slim anti-join on the "
        "key projection; update rows re-enter, tombstoned keys do not. "
        "Completes the merge_upsert_orders story with the GDPR-deletion "
        "path. Money stays integer cents end-to-end."
    ),
    oracle=_CDC_DELETES_SQL,
)
def merge_apply_cdc_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti join ships only the batch's KEYS (distinct projection),
    so the broadcast is minimal regardless of change-row width; the big
    target is never shuffled — one map-side pass, like merge_upsert."""
    from hadoop_map_reduce_spark.operators.relational import apply_cdc

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    batch = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 10 == 0) | (F.col("o_orderkey") % 7 == 0))
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
            F.lit("X").alias("o_orderstatus"),
            (F.round(F.col("o_totalprice") * 100).cast("long") + 500).alias(
                "price_cents"
            ),
        )
    )
    return apply_cdc(base, batch, on=["o_orderkey"])


_AGG_FILTER_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_large,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS finished_cents
    FROM orders
    GROUP BY o_orderpriority
"""


@register(
    "agg_filter_clause",
    tags=("relational", "aggregation"),
    description=(
        "FILTER (WHERE ...) aggregate clauses — several differently-"
        "filtered aggregates in ONE scan+shuffle pass (the idiom that "
        "replaces N self-joined subqueries); one SQL string runs "
        "verbatim on both engines."
    ),
    oracle=_AGG_FILTER_SQL,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four aggregates ride the same partial/final HashAggregate —
    adding a filtered aggregate costs one counter per group, never a
    second pass. Money stays integer cents (repo-wide discipline)."""
    from hadoop_map_reduce_spark.session import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_AGG_FILTER_SQL)


@register(
    "window_first_last",
    tags=("relational", "window"),
    description=(
        "first_value / last_value / nth_value over a full-partition "
        "frame: each order annotated with its customer's cheapest, "
        "most expensive, and third-cheapest order (deterministic "
        "tie-break on o_orderkey; NULL third where the customer has "
        "fewer than three orders)."
    ),
    oracle="""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
               LAST_VALUE(o_orderkey) OVER w AS priciest_key,
               NTH_VALUE(o_orderkey, 3) OVER w AS third_key
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY o_totalprice ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exchange on the customer key serves all three positional
    window functions (identical window spec -> one Window operator).
    The unbounded frame is what makes last/nth well-defined; the
    ordering tie-break makes every position deterministic."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@register(
    "scalar_url_funcs",
    tags=("relational", "scalar"),
    description=(
        "URL parsing (parse_url): host / path / query / single query "
        "parameter extracted from a URL built over the documents table "
        "— the web-corpus provenance columns a crawl pipeline carries. "
        "The oracle extracts the same parts with regexes (DuckDB has no "
        "parse_url), which also pins parse_url's semantics on these "
        "shapes to the plain-regex reading."
    ),
    oracle="""
        SELECT doc_id,
               regexp_extract(url, '^https://([^/]+)', 1) AS host,
               regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS query,
               regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
        FROM (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || doc_id || '?lang=' || lang AS url
            FROM documents
        )
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url is a JVM-side expression (java.net.URI under the hood)
    — stays in codegen, no Python. Per-row, embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "agg_bitmap_distinct",
    tags=("relational", "aggregation", "sketch"),
    description=(
        "EXACT distinct counting via bitmap aggregates: customers per "
        "order priority counted by setting bits in fixed 4 KB bucket "
        "bitmaps (bitmap_bucket_number / bitmap_bit_position / "
        "bitmap_construct_agg), then summing bitmap_count per group. "
        "The oracle is plain COUNT(DISTINCT) — same numbers, but the "
        "bitmap plan's state per (group, bucket) is bounded and "
        "mergeable, where COUNT DISTINCT shuffles every distinct key."
    ),
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two narrow shuffles: (priority, bucket) carrying 4 KB bitmaps
    with map-side bitmap OR-merge, then (priority) summing bucket
    cardinalities. At 100 TB this is the exact-distinct shape that
    doesn't move one row per distinct key — the deterministic
    counterpart of the HLL sketch rollup (sketch_hll_rollup)."""
    from hadoop_map_reduce_spark.session import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct
        FROM (
            SELECT o_orderpriority,
                   bitmap_bucket_number(o_custkey) AS bucket,
                   bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
            FROM orders
            GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        GROUP BY o_orderpriority
    """)


@register(
    "scalar_collation_funcs",
    tags=("relational", "scalar"),
    description=(
        "Collation-aware semantics (Spark >= 4.0): grouping and equality "
        "under UTF8_LCASE over a deliberately case-mixed source column — "
        "case-insensitive GROUP BY and '=' without wrapping every "
        "reference in lower(). The oracle lowers explicitly; the output "
        "key is canonicalized to lower so the representative-case "
        "nondeterminism of collated grouping never reaches the compare."
    ),
    oracle="""
        SELECT lower(mixed) AS source_ci,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE lower(mixed) = 'web')
                    AS BIGINT) AS n_web
        FROM (
            SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source)
                        ELSE source END AS mixed
            FROM documents
        )
        GROUP BY lower(mixed)
    """,
)
def scalar_collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.when(
        F.col("doc_id") % 2 == 0, F.upper("source")
    ).otherwise(F.col("source"))
    ci = F.collate(mixed, "UTF8_LCASE")
    return (
        docs.select(ci.alias("_ci"))
        .groupBy("_ci")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("_ci") == F.lit("web"), 1).otherwise(0)
            ).alias("n_web"),
        )
        .select(
            F.lower(F.col("_ci")).cast("string").alias("source_ci"),
            "n_docs",
            "n_web",
        )
    )
