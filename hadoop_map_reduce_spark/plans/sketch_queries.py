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


# ---------------------------------------------------------------------------
# sketch_cms_heavy_hitters (round-7): Count-Min over the bigram stream
# ---------------------------------------------------------------------------
#
# Cormode & Muthukrishnan's Count-Min sketch, built the way a cluster
# builds it: d=4 hash rows x w=256 buckets, one shuffle-free projection
# of the token stream into (row, bucket) cells, one 1024-key partial-
# agg'd aggregation. Hashing is md5-derived (row-salted, first two hex
# digits = the bucket), so the ENTIRE sketch — cell values, point
# estimates, everything — is deterministic and replayed exactly by the
# DuckDB oracle: unlike HLL/GK, nothing here is engine-specific. The
# estimate for the exact top-20 bigrams rides back over a broadcast of
# the 1024-cell table; no_underestimate pins the CMS one-sided error
# guarantee (est >= true always, over-count only from collisions).

_CMS_D = 4
_CMS_TOPK = 20


@register(
    "sketch_cms_heavy_hitters",
    tags=("sketch", "llm", "aggregation"),
    description=(
        "Count-Min sketch (d=4 rows x 256 md5-bucket columns) over the "
        "corpus bigram stream: the exact top-20 bigrams' true counts "
        "hash-checked, their CMS point estimates (min over rows) "
        "replayed exactly by the oracle (md5 bucketing is cross-"
        "engine-deterministic), and no_underestimate pinning the CMS "
        "one-sided guarantee."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT list_filter(string_split_regex(lower(regexp_replace(
                       text, '([^\\s\\w]|_)+', ' ', 'g')), '\\s+'),
                       t -> t <> '') AS t
            FROM documents
        ), grams AS (
            SELECT t[i] || '+' || t[i + 1] AS g
            FROM toks, UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ), wc AS (
            SELECT g, COUNT(*) AS cnt FROM grams GROUP BY g
        ), probe AS (
            SELECT g, cnt FROM (
                SELECT g, cnt, ROW_NUMBER() OVER (
                    ORDER BY cnt DESC, g ASC) AS rk
                FROM wc
            ) WHERE rk <= {_CMS_TOPK}
        ), cms AS (
            SELECT j, substr(md5(CAST(j AS VARCHAR) || '|' || g), 1, 2)
                       AS bucket,
                   COUNT(*) AS n
            FROM grams, UNNEST(range(0, {_CMS_D})) AS r(j)
            GROUP BY 1, 2
        )
        SELECT p.g AS bigram,
               CAST(p.cnt AS BIGINT) AS true_cnt,
               CAST(MIN(c.n) AS BIGINT) AS est_cnt,
               TRUE AS no_underestimate
        FROM probe p
        JOIN cms c
          ON c.bucket = substr(md5(CAST(c.j AS VARCHAR) || '|' || p.g),
                               1, 2)
        GROUP BY p.g, p.cnt
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass feeds BOTH sides: the exact bigram counts (the
    verify twin and probe selector) and the sketch build — a projection
    to d (row, bucket) cells per gram, aggregated into 1024 cells with
    map-side partials (the 100-TB path: fixed-size mergeable state, no
    key-space shuffle). Estimation joins the 20-row probe against the
    broadcast cell table and takes min over rows. Reference shape:
    operators/bigram.py's flagship stream, sketched instead of exactly
    counted."""
    from hadoop_map_reduce_spark.operators.bigram import bigram_counts

    docs = load_table(spark, sf_dir, "documents")
    # Deliberately NOT one-slot-cached: bigram_counts(docs) is the
    # flagship bigram_count's ENTIRE plan, and persisting it would make
    # the CacheManager substitute InMemoryTableScan into the flagship's
    # plan session-wide (breaking its pinned pruned-scan shape). Two
    # cheap scans here beat contaminating another query's plan.
    wc = bigram_counts(docs)
    # TakeOrderedAndProject (distributed top-k heaps), not a global
    # window — the probe is the top-20 set, rank itself is not emitted.
    probe = (
        wc.orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(_CMS_TOPK)
        .select("bigram", F.col("cnt").alias("true_cnt"))
    )

    def bucket(j, gram_col):
        return F.substring(
            F.md5(
                F.concat(
                    F.lit(str(j)), F.lit("|"), gram_col
                ).cast("binary")
            ),
            1,
            2,
        )

    # Sketch build from the weighted gram table: identical cell values
    # to a raw-stream build (SUM of per-gram counts per cell), one
    # explode to d cells per DISTINCT gram instead of per occurrence.
    cells = (
        wc.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            bucket(j, F.col("bigram")).alias("bucket"),
                            F.col("cnt").alias("w"),
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("c")
        )
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("c.w").alias("n"))
    )
    probes = probe.select(
        "bigram",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("bigram")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    )
    return (
        probes.join(
            F.broadcast(cells),
            (probes["p.j"] == cells["j"])
            & (probes["p.bucket"] == cells["bucket"]),
        )
        .groupBy("bigram", "true_cnt")
        .agg(F.min("n").cast("long").alias("est_cnt"))
        .select(
            "bigram",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias(
                "no_underestimate"
            ),
        )
    )
