"""Graph analytics over the customer–supplier interaction graph.

The graph: an undirected bipartite edge (customer, supplier) for every
distinct trading relationship in orders⋈lineitem (supplier node ids
offset by 1e6 to disjoin the key spaces). Iterative algorithms are the
one workload MapReduce-era engines (the reference's lineage) handled by
re-running whole jobs per iteration; Spark holds the loop in one driver
program over cached DataFrames — same pattern as
``operators/clustering.py``'s connected components.

Determinism discipline for the PageRank oracle: a FIXED iteration count
(3) unrolled as chained CTEs in DuckDB (no recursive-CTE aggregation,
which SQL forbids), identical double expression shapes on both sides
(``0.15/n + 0.85*SUM(r/outdeg)``), and round-6 only at the output. The
only cross-engine nondeterminism is summation order inside SUM; rank
magnitudes (~1/n) put that noise near 1e-17, eight orders below the
round-6 boundary scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

_SUPP_OFFSET = 1_000_000
_DAMP = 0.85
_ITERS = 3

_GRAPH_SQL = f"""
    e0 AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey + {_SUPP_OFFSET} AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM e0
        UNION ALL
        SELECT s AS src, c AS dst FROM e0
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("s"),
        )
        .distinct()
    )
    return e0.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        e0.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _pagerank_oracle() -> str:
    # Unrolled fixed-iteration CTE chain: r0 = 1/n, r{k} from r{k-1}.
    steps = []
    for k in range(1, _ITERS + 1):
        steps.append(f"""
    r{k} AS (
        SELECT e.dst AS node,
               0.15 / (SELECT n FROM nn) + {_DAMP} * SUM(p.r / d.outdeg) AS r
        FROM edges e
        JOIN r{k - 1} p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    )""")
    return f"""
    WITH {_GRAPH_SQL},
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    {",".join(steps)}
    SELECT node, ROUND(r, 6) AS rank FROM r{_ITERS}
    """


@register(
    "graph_pagerank",
    tags=("graph", "iterative"),
    description=(
        f"PageRank, {_ITERS} fixed iterations (damping {_DAMP}) on the "
        "undirected customer-supplier graph: the iterative-algorithm "
        "pattern — driver loop over cached edge/degree DataFrames, one "
        "equi-join + one aggregation per iteration — vs an unrolled "
        "CTE-chain oracle."
    ),
    oracle=_pagerank_oracle(),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per iteration: edges⋈ranks on src (both sides hash-partitioned on
    the same key → one exchange for ranks, edges reused from cache), then
    one aggregation keyed dst. Undirected edges mean no dangling mass and
    a stable node set, so no driver-side convergence count is needed —
    the loop is fixed-length and fully lazy until the final collect.

    At 100 TB: edges are the big side — pre-partition them on src once
    (the cache preserves partitioning across iterations) and let ranks
    (n_nodes rows, small) shuffle to them each round; skewed hub nodes
    split via AQE exactly like any hot aggregation key.
    """
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    try:
        n = nodes.count()
        ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
        for _ in range(_ITERS):
            ranks = (
                ew.join(ranks, ew.src == ranks.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    (
                        F.lit(0.15 / n)
                        + F.lit(_DAMP) * F.sum(F.col("r") / F.col("outdeg"))
                    ).alias("r")
                )
                .select(F.col("node"), F.col("r"))
            )
        return ranks.select("node", F.round("r", 6).alias("rank"))
    finally:
        # Plans are lazy: unpersist only marks for cleanup after the
        # driver collects; safe because each iteration materializes
        # nothing until then and cache blocks outlive the marks.
        ew.unpersist(blocking=False)
        nodes.unpersist(blocking=False)


@register(
    "graph_degree_hist",
    tags=("graph", "aggregation"),
    description=(
        "Degree distribution of the customer-supplier graph: degree → "
        "node count (two exact integer aggregations; the skew report "
        "that decides salting/AQE strategy for everything else run on "
        "this graph)."
    ),
    oracle=f"""
        WITH {_GRAPH_SQL}
        SELECT outdeg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY outdeg
    """,
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
