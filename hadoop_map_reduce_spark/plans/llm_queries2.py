"""LLM training-data pipeline queries, batch 2: dataset assembly.

Where batch 1 (llm_queries) covers cleaning — dedup, similarity, quality
— this batch covers turning a curated corpus into training data:

- deterministic train/val/test assignment (hash-based, reshuffle-proof)
- context-window token chunking (per-shard window cumsum, no global sort)
- exact-integer tf-idf term ranking (no floating logs: the idf factor is
  an integer ``floor(N*1e6/df)`` so both engines agree bit-for-bit)
- cross-source contamination pairs (near-dups spanning sources — the
  benchmark-leak check)
- skew-safe salted aggregation (two-phase exact-cents sums: associative
  integer partials make the salted plan answer-identical to the oracle)

All five carry DuckDB oracles; determinism tricks are noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
from hadoop_map_reduce_spark.operators.dedup import ngram_jaccard_pairs_prefix
from hadoop_map_reduce_spark.plans.llm_queries import _JACCARD_PAIRS_SQL, _TOKS
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

_HEX = "0123456789abcdef"


def _md5_bucket_spark(col, buckets: int):
    """Uniform-ish deterministic bucket in [0, buckets) from the first two
    hex chars of md5 — pure string ops so Spark and DuckDB agree exactly
    (no hex-literal casts, which the engines spell differently)."""
    digest = F.md5(col.cast("string").cast("binary"))
    v1 = F.instr(F.lit(_HEX), F.substring(digest, 1, 1)) - 1
    v2 = F.instr(F.lit(_HEX), F.substring(digest, 2, 1)) - 1
    return (v1 * 16 + v2) % buckets


def _md5_bucket_sql(expr: str, buckets: int) -> str:
    return (
        f"((instr('{_HEX}', substr(md5(CAST({expr} AS VARCHAR)), 1, 1)) - 1)"
        f" * 16 + instr('{_HEX}', substr(md5(CAST({expr} AS VARCHAR)), 2, 1))"
        f" - 1) % {buckets}"
    )


@register(
    "split_assign",
    tags=("llm", "pipeline"),
    description=(
        "Deterministic 80/10/10 train/val/test assignment keyed on "
        "md5(doc_id): stable under repartitioning, re-runs, and corpus "
        "growth (a doc's split never depends on other rows)."
    ),
    oracle=f"""
        SELECT doc_id,
               CASE WHEN {_md5_bucket_sql('doc_id', 100)} < 80 THEN 'train'
                    WHEN {_md5_bucket_sql('doc_id', 100)} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = _md5_bucket_spark(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


@register(
    "pack_token_chunks",
    tags=("llm", "pipeline", "window"),
    description=(
        "Context-window packing: per-source running token count assigns "
        "each doc to the 2048-token chunk where it starts. Window is "
        "PARTITIONed BY source — packing within shards, never a global "
        "single-partition sort."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), cum AS (
            SELECT doc_id, source, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, source, n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / 2048e0) AS BIGINT)
                   AS chunk_id
        FROM cum
    """,
)
def pack_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(tokenize(sanitize(F.col("text")))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    chunk = F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(2048.0))
    return cum.select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_tokens",
        chunk.cast("long").alias("chunk_id"),
    )


@register(
    "tfidf_top_terms",
    headline=True,
    tags=("llm", "text", "aggregation"),
    description=(
        "Top-5 tf-idf terms per document. Exact integers only: the idf "
        "factor is floor(N*1e6/df) (N, df, tf all counts), so scores and "
        "the (score DESC, term ASC) ranking are engine-independent — no "
        "floating-point logarithms to disagree on."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   CAST(tf.tf * FLOOR(((SELECT COUNT(*) FROM documents) * 1e6)
                                      / df.df) AS BIGINT) AS score
            FROM tf JOIN df ON df.term = tf.term
        ), ranked AS (
            SELECT doc_id, term, score,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term ASC
                   ) AS BIGINT) AS rk
            FROM scored
        )
        SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(sanitize(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.floor((F.col("_n") * F.lit(1e6)) / F.col("df")))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
    )


@register(
    "contamination_pairs",
    tags=("llm", "dedup"),
    description=(
        "Benchmark-leak check: near-duplicate pairs (trigram Jaccard >= "
        "0.5) whose documents come from DIFFERENT sources — the pairs an "
        "intra-source dedup pass would never see."
    ),
    oracle=f"""
        WITH pairs AS ({_JACCARD_PAIRS_SQL})
        SELECT p.id_a, p.id_b, p.jaccard,
               da.source AS source_a, db.source AS source_b
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
        WHERE da.source <> db.source
    """,
)
def contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.5, n=3)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("source_a")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("source_b")
            ),
            "id_b",
        )
        .filter(F.col("source_a") != F.col("source_b"))
        .select("id_a", "id_b", "jaccard", "source_a", "source_b")
    )


@register(
    "agg_salted_hot_key",
    tags=("llm", "aggregation", "skew"),
    description=(
        "Skew-safe event rollup: two-phase aggregation over a salted key "
        "(operators/skew.py pattern). Partials are counts and exact "
        "integer cents — associative — so any salt assignment yields the "
        "oracle's plain-GROUP-BY answer bit-for-bit."
    ),
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 1e2) AS BIGINT)) AS BIGINT) / 1e2
                   AS total_value
        FROM events GROUP BY event_type
    """,
)
def agg_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * F.lit(1e2)).cast("long")
    salted = events.select(
        "event_type",
        cents.alias("_cents"),
        (F.rand(42) * 16).cast("int").alias("_salt"),
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum("_cents").alias("_pcents")
    )
    return partial.groupBy("event_type").agg(
        F.sum("_cnt").alias("n_events"),
        (F.sum("_pcents") / F.lit(1e2)).alias("total_value"),
    )


@register(
    "split_leakage_report",
    tags=("llm", "pipeline", "dedup"),
    description=(
        "Train/val/test leakage report: near-dup pair counts per "
        "unordered split pair under the deterministic md5 split "
        "assignment — off-diagonal rows (train,val / train,test / "
        "val,test) are evaluation leakage an intra-split dedup pass "
        "cannot see."
    ),
    oracle=f"""
        WITH truth AS ({_JACCARD_PAIRS_SQL}),
        s AS (
            SELECT doc_id,
                   CASE WHEN {_md5_bucket_sql('doc_id', 100)} < 80
                        THEN 'train'
                        WHEN {_md5_bucket_sql('doc_id', 100)} < 90
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ), j AS (
            SELECT LEAST(sa.split, sb.split) AS split_a,
                   GREATEST(sa.split, sb.split) AS split_b
            FROM truth p
            JOIN s sa ON sa.doc_id = p.id_a
            JOIN s sb ON sb.doc_id = p.id_b
        )
        SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM j GROUP BY 1, 2
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: the exact near-dup pair table (at 100 TB: the verified LSH
    output you already materialize — same schema) joined twice against
    the split_assign expression (a per-row md5, no extra shuffle beyond
    the pair-sized equi-joins), unordered-pair normalization, <=6-row
    aggregate. This is the dataset-release gate: a nonzero
    (train, test) row means your held-out set is contaminated however
    clean each split looks in isolation.
    """
    from hadoop_map_reduce_spark.operators.dedup import pair_attr_matrix

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.5, n=3)
    b = _md5_bucket_spark(F.col("doc_id"), 100)
    s = docs.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        .alias("split"),
    )
    return pair_attr_matrix(pairs, s, "split", "split_a", "split_b")
