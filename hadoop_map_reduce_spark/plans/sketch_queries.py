"""Sketch-based approximate aggregates, registered as driver-verifiable
queries.

Sketch outputs are engine-specific (HyperLogLog++ registers, GK quantile
summaries), so they can never hash-match a DuckDB oracle directly. The
registered formulation makes them verifiable anyway: each query emits the
EXACT value (hash-compared against the oracle, a real cross-engine check)
plus an ``*_ok`` boolean asserting the sketch landed within its
documented error bound — the oracle pins the boolean to TRUE, so a sketch
drifting out of tolerance flips the hash and fails the round.

Determinism: HLL++ is hash-based with commutative register-max merges —
identical input yields identical estimates regardless of partition order
or count. ``percentile_approx`` (Greenwald-Khanna summaries) can vary
slightly with merge order, so its bound (2%) is 4× the observed error at
this scale; the assertion is about the error contract, not a pinned
estimate.

At 100 TB these sketches ARE the product: a single-pass mergeable
O(kB)-state distinct count / quantile where the exact forms need a full
shuffle of the key space. The exact twin here is the verification
harness, not the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "sketch_hll_rollup",
    tags=("sketch", "aggregation", "llm"),
    description=(
        "Mergeable HLL distinct-content counts over GROUPING SETS "
        "(lang), (source), (): exact distinct md5(text) hash-checked "
        "against the oracle, plus hll_ok pinning approx error < 6% "
        "(3× the configured rsd=0.02)."
    ),
    oracle="""
        SELECT lang, source,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact,
               TRUE AS hll_ok
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expand + one aggregate pass computes every stratum's distinct
    count; the HLL estimate rides along as a second aggregate over the
    same expanded rows. On a cluster the HLL variant alone is the scale
    path — fixed 2.5 KB of register state per group, partial-merged
    map-side, vs an exact distinct whose state is the key set itself."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    g = docs.groupingSets(
        [["lang"], ["source"], []],
        "lang",
        "source",
    ).agg(
        F.countDistinct(fp).alias("n_exact"),
        F.approx_count_distinct(fp, 0.02).alias("_n_hll"),
    )
    rel_err = F.abs(F.col("_n_hll") - F.col("n_exact")) / F.col("n_exact")
    return g.select(
        "lang",
        "source",
        "n_exact",
        (rel_err < 0.06).alias("hll_ok"),
    )


@register(
    "sketch_quantile_check",
    tags=("sketch", "relational", "aggregation", "stats"),
    description=(
        "Approximate quantiles (percentile_approx, accuracy=10000) on "
        "order totals: exact row count hash-checked, p50/p90/p99 each "
        "pinned within 2% of the exact percentile."
    ),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        FROM orders
    """,
)
def sketch_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ``percentile`` (full sort of the group) is the verification
    twin; the GK summary is what survives 100 TB — bounded state,
    mergeable partials, no global sort. Both run in the same single
    aggregate here so the error assertion compares one scan's results."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(price, F.lit(0.5)).alias("_e50"),
        F.percentile(price, F.lit(0.9)).alias("_e90"),
        F.percentile(price, F.lit(0.99)).alias("_e99"),
        F.percentile_approx(price, F.lit(0.5), F.lit(10000)).alias("_a50"),
        F.percentile_approx(price, F.lit(0.9), F.lit(10000)).alias("_a90"),
        F.percentile_approx(price, F.lit(0.99), F.lit(10000)).alias("_a99"),
    )

    def ok(a: str, e: str):
        return F.abs(F.col(a) - F.col(e)) / F.col(e) < 0.02

    return agg.select(
        "n",
        ok("_a50", "_e50").alias("p50_ok"),
        ok("_a90", "_e90").alias("p90_ok"),
        ok("_a99", "_e99").alias("p99_ok"),
    )


@register(
    "sketch_freq_items",
    tags=("sketch", "relational", "aggregation"),
    description=(
        "Approximate heavy hitters: df.stat.freqItems (lossy counting) "
        "at support 0.1 over order priorities, cross-checked against "
        "the exact frequent set. Contract: exact counts hash-checked; "
        "in_approx pins the sketch's no-false-negative guarantee (every "
        "item with frequency >= support appears in the sketch result)."
    ),
    oracle="""
        SELECT o_orderpriority AS item,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               TRUE AS in_approx
        FROM orders
        GROUP BY o_orderpriority
        HAVING COUNT(*) * 10 >= (SELECT COUNT(*) FROM orders)
    """,
)
def sketch_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two passes at sketch cost: freqItems is one map-side-combined pass
    producing a single driver row (broadcast back), the exact counts one
    hash aggregation. At 100 TB the exact pass is the expensive one —
    production keeps only the sketch; here the exact set IS the oracle
    check that the sketch kept its guarantee."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderpriority")
    approx = orders.stat.freqItems(["o_orderpriority"], support=0.1)
    total = orders.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        orders.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 10 >= F.col("_n"))
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "item",
        "cnt",
        F.array_contains(
            F.col("o_orderpriority_freqItems"), F.col("item")
        ).alias("in_approx"),
    )
