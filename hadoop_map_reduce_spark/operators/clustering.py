"""Duplicate-cluster resolution: connected components over near-dup pairs.

After near-dup detection emits pairs, corpus curation needs CLUSTERS
(keep one representative per component). Connected components is the
canonical iterative algorithm the relational operators can't express in
one pass; implemented as alternating min-label propagation (large-star /
small-star style) — each iteration is two shuffles, converging in
O(log n) iterations on real graphs.

Scale notes: labels DataFrames are re-checkpointed each iteration via
``localCheckpoint`` to cut the growing lineage (without it, iteration k
replays all k-1 prior joins); convergence is detected with a count of
changed labels (one action per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components: (node, component) where
    component is the minimum node id reachable from ``node``."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        # Each node proposes its neighbors' minimum current label.
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("_old"),
            )
        )
        changed = updated.filter(F.col("component") != F.col("_old")).count()
        labels = updated.select("node", "component").localCheckpoint()
        if changed == 0:
            break
    return labels


def dedup_representatives(
    pairs: DataFrame, all_ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One representative per duplicate cluster: the minimum id of each
    connected component; singletons (no near-dup edges) represent
    themselves. Returns (doc_id, representative)."""
    comp = connected_components(pairs)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("representative"),
        )
    )
