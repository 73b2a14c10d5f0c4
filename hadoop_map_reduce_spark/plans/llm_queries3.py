"""LLM training-data pipeline queries, batch 3: fuzzy matching and
source mixing.

- Levenshtein near-dup pairs: character-level fuzzy duplicates that
  token-shingle Jaccard misses (typo variants). Blocked on the first
  token so the candidate join is an equi-join; the edit-distance verify
  runs only within blocks. Both engines ship the same classic
  Wagner-Fischer ``levenshtein``, so the oracle is exact.
- Weighted source mixing: per-source deterministic sampling rates via
  the md5 bucket, the standard way to hit a target data mixture without
  a shuffle or an RNG whose stream depends on partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.similarity import ivf_topk
from hadoop_map_reduce_spark.plans.llm_queries2 import (
    _md5_bucket_spark,
    _md5_bucket_sql,
)
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

# Sampling percentage per source for the mixing query; unlisted sources
# fall back to 25%. Literal on both engines (sources are src0..src19 in
# the synthetic corpus).
_MIX_WEIGHTS = {"src0": 90, "src1": 70, "src2": 40, "src3": 10}
_MIX_DEFAULT = 25


@register(
    "dedup_fuzzy_levenshtein",
    tags=("llm", "dedup"),
    description=(
        "Character-level fuzzy near-dup pairs: docs sharing their first "
        "token whose 64-char prefixes are within Levenshtein distance 8. "
        "First-token blocking keeps candidate generation an equi-join; "
        "the quadratic edit-distance verify runs only inside blocks."
    ),
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   regexp_extract(lower(regexp_replace(text,
                       '([^\\s\\w]|_)+', ' ', 'g')), '[a-z0-9]+', 0)
                       AS block_key,
                   substr(lower(regexp_replace(text,
                       '([^\\s\\w]|_)+', ' ', 'g')), 1, 64) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
        FROM keyed a
        JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
        WHERE a.block_key <> ''
          AND levenshtein(a.prefix, b.prefix) <= 8
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sanitized = F.lower(F.regexp_replace("text", r"([^\s\w]|_)+", " "))
    keyed = docs.select(
        "doc_id",
        F.regexp_extract(sanitized, "[a-z0-9]+", 0).alias("block_key"),
        F.substring(sanitized, 1, 64).alias("prefix"),
    ).filter(F.col("block_key") != "")
    a = keyed.select(
        F.col("doc_id").alias("id_a"),
        "block_key",
        F.col("prefix").alias("_pa"),
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"),
        "block_key",
        F.col("prefix").alias("_pb"),
    )
    # Banded DP: with the threshold argument Spark computes only the
    # |i-j| <= 8 diagonal band and early-exits past it (-1), ~4-8x less
    # work per candidate pair than the full 64x64 matrix — and the
    # returned value is the exact distance whenever it is <= threshold,
    # so results are identical to the unbounded form filtered afterward.
    dist = F.levenshtein(F.col("_pa"), F.col("_pb"), 8)
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "similarity_ivf",
    tags=("llm", "similarity"),
    description=(
        "ANN via IVF coarse quantization: corpus assigned once to "
        "deterministic sampled-centroid Voronoi cells, queries probe "
        "their 6 nearest cells, exact cosine re-ranks (equi-join on the "
        "cell id; recall<1 by design, so no SQL oracle — recall pinned "
        "vs brute force in tests)."
    ),
    oracle=None,
)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6)


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


@register(
    "mix_sources_weighted",
    tags=("llm", "pipeline"),
    description=(
        "Deterministic weighted source mixing: keep each doc when its "
        "md5 bucket falls under the source's target percentage — a "
        "reshuffle-proof Bernoulli sample per source, summarized as "
        "kept/total counts per source."
    ),
    oracle=f"""
        SELECT source,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN {_md5_bucket_sql('doc_id', 100)}
                             < {_mix_case_sql()}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents GROUP BY source
    """,
)
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for s, w in sorted(_MIX_WEIGHTS.items()):
        rate = F.when(F.col("source") == s, F.lit(w)).otherwise(rate)
    keep = _md5_bucket_spark(F.col("doc_id"), 100) < rate
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
    )
