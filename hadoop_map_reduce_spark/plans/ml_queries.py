"""ML-adjacent queries over the embeddings table: iterative k-means and
exact per-label centroids.

``kmeans_embeddings`` is the registry's iterative-algorithm entry (like
``dedup_clusters``' label propagation): no SQL oracle can express the
loop, so the driver records a rows-only check and the hard guarantee
comes from the pure-Python recomputation test in
``tests/test_ml_queries.py``, which replays the exact integer/fold
arithmetic and must match bit-for-bit.

``embedding_centroid_by_label`` is the one-shuffle declarative core of
the same computation (supervised by the label column instead of the
learned assignment) and IS oracle-checked — between them the update step
of k-means is fully verified even though the loop itself cannot be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "kmeans_embeddings",
    tags=("llm", "ml", "iterative"),
    description=(
        "Deterministic Lloyd's k-means (k=8, 5 fixed iterations, lowest-id "
        "seeds, exact-integer centroid means): cluster sizes and final "
        "centroid norms. Iterative — rows-only driver check; exact parity "
        "is pinned by a pure-Python recomputation test."
    ),
    oracle=None,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per iteration: one vector scan + one (k*d)-key shuffle; vectors
    never shuffle, centroids ride the closure as broadcast-sized
    literals. The returned aggregate is one more tiny shuffle."""
    from hadoop_map_reduce_spark.operators.ml import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_lloyd(emb, k=8, n_iter=5)
    norms = [
        (ci, round(sum(x * x for x in c) ** 0.5, 6))
        for ci, c in enumerate(centroids)
    ]
    norms_df = spark.createDataFrame(norms, "cluster int, centroid_norm double")
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))
    return sizes.join(F.broadcast(norms_df), "cluster", "left").select(
        "cluster", "n_vecs", "centroid_norm"
    )


_CENTROID_ORACLE = """
    SELECT e.label,
           CAST(u.i - 1 AS INT) AS pos,
           SUM(CAST(ROUND(CAST(e.embedding[u.i] AS DOUBLE) * 1000000)
                    AS BIGINT)) / COUNT(*) / 1000000.0 AS avg_val
    FROM embeddings e, UNNEST(range(1, len(e.embedding) + 1)) AS u(i)
    GROUP BY 1, 2
"""


@register(
    "embedding_centroid_by_label",
    tags=("llm", "ml", "aggregation"),
    description=(
        "Exact per-label centroid: element-wise mean of the embedding "
        "vectors per label, one row per (label, dimension), micro-unit "
        "integer summation so the mean is partition-order independent."
    ),
    oracle=_CENTROID_ORACLE,
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode widens n x d rows map-side, partial aggregation
    collapses them before the single (label, pos)-key exchange — the
    shuffle carries at most labels*d*partitions partial rows, never the
    vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "_x"
            ),
        )
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round(F.col("_x") * 1_000_000).cast("long"))
                / F.count(F.lit(1))
                / F.lit(1_000_000.0)
            ).alias("avg_val")
        )
    )


_HEX = "0123456789abcdef"

_EMBED_HASHED_ORACLE = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(regexp_replace(text,
                   '([^\\s\\w]|_)+', ' ', 'g')), '\\s+'), t -> t <> '') AS t
        FROM documents
    ), flat AS (
        SELECT doc_id, u.tok FROM toks, UNNEST(t) AS u(tok)
    ), b AS (
        SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
               % 64 AS dim
        FROM flat
    )
    SELECT doc_id, CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM b GROUP BY 1, 2
"""


@register(
    "doc_embed_hashed",
    tags=("llm", "ml"),
    description=(
        "In-engine text featurization: 64-dim feature-hash embeddings "
        "(token -> md5-derived bucket, weight = term count), emitted as "
        "sparse (doc_id, dim, weight) rows. Deterministic and "
        "engine-portable — the bucket comes from md5 hex digits, not an "
        "engine-specific hash — so the full docs->vectors step is "
        "oracle-checked. Feeds the similarity/kmeans operators without "
        "a Python featurizer."
    ),
    oracle=_EMBED_HASHED_ORACLE,
)
def doc_embed_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode widens map-side; the (doc, dim) count is
    partial-agg'd before its single shuffle. No UDFs — the md5 bucket is
    whole-stage-codegen'd, so featurizing 100 TB of text is one scan at
    JVM speed."""
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(sanitize(F.col("text")))).alias("tok")
    )
    h1 = F.expr(f"instr('{_HEX}', substring(md5(cast(tok as binary)), 1, 1))")
    h2 = F.expr(f"instr('{_HEX}', substring(md5(cast(tok as binary)), 2, 1))")
    dim = (((h1 - 1) * 16 + h2 - 1) % 64).cast("int")
    return toks.groupBy("doc_id", dim.alias("dim")).agg(
        F.count(F.lit(1)).alias("weight")
    )
