"""Data-layout queries: multi-dimensional (Z-order) clustering.

At 100 TB, scan cost is dominated by how much data a filter can skip.
Sorting by one column gives perfect min/max pruning on that column and
none on any other; interleaving the bits of two quantized dimensions
(Morton / Z-order) gives useful pruning on BOTH — every contiguous
z-range maps to a small rectangle in (dim1, dim2) space, so per-file
min/max footer stats stay tight for either predicate. This is the
layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``; here it is a
pure Column expression (shift/and/or — whole-stage codegen, no UDF),
composable with ``storage.write_partitioned`` or
``repartitionByRange(zvalue)`` at write time.

The registered query computes the z-value per order and reports, per
z-range cluster, the bounding box of both source dimensions — i.e. the
min/max stats a parquet footer would carry if files were cut on z —
demonstrating that each cluster is a tight rectangle. Everything is
integer arithmetic, exact on both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

#: Bits per dimension (z-values span 2 * _BITS bits).
_BITS = 8
#: Cluster id = z >> _CLUSTER_SHIFT (64 clusters at 16-bit z).
_CLUSTER_SHIFT = 10

_EPOCH = "1995-01-01"  # min o_orderdate in the synthetic data
_DAYS_PER_BUCKET = 10
_PRICE_PER_BUCKET = 2000.0


def zorder_key(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Morton interleave of two non-negative ints quantized to `bits` bits:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms)


def _zorder_sql(x: str, y: str, bits: int = _BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_clusters",
    tags=("layout", "scalar"),
    description=(
        "Z-order (Morton) clustering of orders on (order-date bucket, "
        "total-price bucket): interleave the bits of both quantized "
        "dimensions, cut the z-range into 64 clusters, and report each "
        "cluster's row count and per-dimension bounding box — the "
        "min/max footer stats files cut on z would carry, showing both "
        "dimensions stay prunable."
    ),
    oracle=f"""
        WITH dims AS (
            SELECT GREATEST(0, LEAST(255, CAST(FLOOR(date_diff('day',
                       DATE '{_EPOCH}', CAST(o_orderdate AS DATE))
                       / {_DAYS_PER_BUCKET}.0) AS INT))) AS day_bucket,
                   GREATEST(0, LEAST(255, CAST(FLOOR(o_totalprice
                       / {_PRICE_PER_BUCKET}) AS INT))) AS price_bucket
            FROM orders),
        z AS (
            SELECT day_bucket, price_bucket,
                   {_zorder_sql("day_bucket", "price_bucket")} AS zval
            FROM dims)
        SELECT zval >> {_CLUSTER_SHIFT} AS cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(day_bucket) AS min_day, MAX(day_bucket) AS max_day,
               MIN(price_bucket) AS min_price, MAX(price_bucket) AS max_price
        FROM z GROUP BY cluster_id
    """,
)
def layout_zorder_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection (pure integer bit ops, codegen'd) + one hash
    aggregation on the 64 cluster ids. At write time the same z column
    feeds ``repartitionByRange`` so each output file covers one tight
    z-range; nothing here shuffles more than the 64-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    # Clamp both ends: a date before the epoch (other generators start
    # 1992) would interleave sign bits and break z-locality silently.
    day_bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(255),
            F.floor(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.to_date(F.lit(_EPOCH)),
                )
                / _DAYS_PER_BUCKET
            ).cast("int"),
        ),
    )
    price_bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(255),
            F.floor(F.col("o_totalprice") / _PRICE_PER_BUCKET).cast("int"),
        ),
    )
    z = zorder_key(F.col("day_bucket"), F.col("price_bucket"))
    return (
        orders.select(
            day_bucket.alias("day_bucket"), price_bucket.alias("price_bucket")
        )
        .select("day_bucket", "price_bucket", z.alias("zval"))
        .groupBy(
            F.shiftright("zval", _CLUSTER_SHIFT).alias("cluster_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("day_bucket").alias("min_day"),
            F.max("day_bucket").alias("max_day"),
            F.min("price_bucket").alias("min_price"),
            F.max("price_bucket").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Round-8: small-file compaction planning
# ---------------------------------------------------------------------------


@register(
    "layout_compaction_plan",
    tags=("layout", "window", "aggregation"),
    description=(
        "Small-file compaction plan: documents stand in for data files "
        "(doc_id = file id, n_chars = bytes); within each source, files "
        "are packed in id order into target bins of 2000 bytes by "
        "cumulative-size division — the census reports files, bytes, "
        "and bin fill per (source, bin)."
    ),
    oracle="""
        WITH sized AS (
            SELECT source, doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS bytes_before
            FROM documents)
        SELECT source,
               CAST(bytes_before // 2000 AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(n_chars) AS BIGINT) AS bin_bytes
        FROM sized
        GROUP BY 1, 2
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-compactor rule (bin = floor(running bytes /
    target), one pass in file order) rather than true bin packing:
    deterministic, single window per source partition, and the rule a
    table-maintenance service can apply incrementally as files land.
    One exchange on source; no file content moves — this is the PLAN,
    the rewrite itself is the zip/text/warc sink's job."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.withColumn(
        "bytes_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    )
    return sized.groupBy(
        "source",
        F.floor(F.col("bytes_before") / 2000).cast("long").alias("bin_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_bytes"),
    )


@register(
    "layout_zonemap_prune",
    tags=("layout", "aggregation"),
    description=(
        "Zone-map pruning audit: documents chunked into 64-row 'row "
        "groups' (doc_id // 64) with per-chunk min/max n_chars zone "
        "maps; for the predicate n_chars >= 400, the census reports "
        "per source how many chunks a zone-map-aware scan skips "
        "entirely, reads fully, or must partially scan — the "
        "statistics that decide whether a sort/cluster rewrite "
        "(layout_zorder_clusters) pays for itself."
    ),
    oracle="""
        WITH zones AS (
            SELECT source, doc_id // 64 AS chunk_id,
                   MIN(n_chars) AS zmin, MAX(n_chars) AS zmax,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM documents GROUP BY 1, 2)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN zmax < 400 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_skipped,
               CAST(SUM(CASE WHEN zmin >= 400 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_full,
               CAST(SUM(CASE WHEN zmax < 400 THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_skipped
        FROM zones GROUP BY source
    """,
)
def layout_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two narrow integer aggregations (chunk zone maps, then the
    per-source rollup); this is the engine-side HALF of predicate
    pushdown — parquet row-group statistics do exactly this inside the
    scan, and the audit quantifies what the current physical layout
    actually buys before anyone pays for a re-cluster."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    zones = docs.groupBy(
        "source",
        F.floor(F.col("doc_id") / 64).cast("long").alias("chunk_id"),
    ).agg(
        F.min("n_chars").alias("zmin"),
        F.max("n_chars").alias("zmax"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return zones.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("zmax") < 400, 1).otherwise(0))
        .cast("long")
        .alias("n_skipped"),
        F.sum(F.when(F.col("zmin") >= 400, 1).otherwise(0))
        .cast("long")
        .alias("n_full"),
        F.sum(F.when(F.col("zmax") < 400, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_skipped"),
    )
