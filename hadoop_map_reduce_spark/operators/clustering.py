"""Duplicate-cluster resolution: connected components over near-dup pairs.

After near-dup detection emits pairs, corpus curation needs CLUSTERS
(keep one representative per component). Connected components is the
canonical iterative algorithm the relational operators can't express in
one pass; implemented as min-label propagation — each iteration is two
shuffles, and the iteration count is O(graph diameter). Duplicate
clusters in practice have tiny diameters (stars / short chains), but the
loop runs to CONVERGENCE, not to a silent cap: if ``max_iterations`` is
hit with labels still changing, it raises instead of returning wrong
components.

Scale notes: the edge set is persisted (it drives two joins per
iteration); labels are re-materialized each iteration via eager
``localCheckpoint`` to cut the growing lineage, and the convergence
count reads the CHECKPOINTED result so no iteration executes twice.
Each iteration's checkpoint blocks are released once the next
checkpoint materializes (``hadoop_map_reduce_spark.checkpoint``), so
block-manager storage holds one label table, not O(diameter) copies;
only the FINAL iteration's checkpoint survives — it backs the returned
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.checkpoint import local_checkpoint


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 100,
) -> DataFrame:
    """Resolve undirected edges into components: (node, component) where
    component is the minimum node id reachable from ``node``.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iterations`` (never silently returns a partial clustering).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels, release = local_checkpoint(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    try:
        for _ in range(max_iterations):
            # Each node proposes its neighbors' minimum current label.
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_min"))
            )
            # Checkpoint FIRST (one execution), then read the convergence
            # count from the materialized result.
            updated, next_release = local_checkpoint(
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_min", F.col("component")),
                    ).alias("component"),
                    F.col("component").alias("_old"),
                )
            )
            # The new checkpoint is materialized; free the previous
            # iteration's blocks. The final checkpoint is never released
            # here — it backs the returned labels.
            release()
            release = next_release
            changed = updated.filter(F.col("component") != F.col("_old")).count()
            labels = updated.select("node", "component")
            if changed == 0:
                # Clear the handle BEFORE returning: the final
                # checkpoint backs the returned labels and must stay
                # alive; every other exit (non-convergence, mid-
                # iteration exception) releases the live iteration's
                # blocks in the finally below.
                release = None
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the cap); raise "
            "max_iterations"
        )
    finally:
        edges.unpersist()
        if release is not None:
            release()


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


def cluster_retention(
    representatives: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """The curation step AFTER clustering: decide which member of each
    duplicate cluster survives. Policy: keep the member with the
    highest ``quality_col``, ties to the lowest id (the keep-longest /
    keep-best rule of production dedup pipelines — min-id
    representatives are cluster NAMES, not the docs you'd keep).

    Inputs: ``representatives`` = (id, representative) as produced by
    :func:`dedup_representatives`; ``quality`` = (id, quality).
    Returns (id, representative, kept_id, action∈{keep,remove}).

    Members missing a quality row are KEPT in the output (left join)
    and rank after every scored member (nulls-last ordering) — an
    incomplete quality table can therefore never silently drop a
    member or leave a cluster with no ``keep`` row (an all-unscored
    cluster keeps its lowest id).

    Scale shape: one broadcast-or-shuffle join on the id key plus ONE
    window shuffle keyed by representative — cluster sizes are the
    window partitions, bounded by the dedup density, never corpus-sized.
    """
    from pyspark.sql import Window

    joined = representatives.join(quality, id_col, "left")
    w = Window.partitionBy("representative").orderBy(
        F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        joined.withColumn(
            "kept_id", F.first(F.col(id_col)).over(w)
        )
        .select(
            F.col(id_col),
            "representative",
            "kept_id",
            F.when(F.col(id_col) == F.col("kept_id"), F.lit("keep"))
            .otherwise(F.lit("remove"))
            .alias("action"),
        )
    )
