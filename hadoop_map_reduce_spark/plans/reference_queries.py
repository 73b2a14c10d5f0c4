"""Reference-parity queries (SURVEY.md §2 operators O2–O13) over the
``documents`` table — the stand-in for the reference's cookbook corpus.

Each query aliases output columns identically to its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
from hadoop_map_reduce_spark.operators.bigram import bigram_counts, ngram_counts
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

# DuckDB-side equivalents of sanitize (O4) + tokenize (O5): RE2's \w and \s
# are ASCII-only, matching Java's default regex classes used by the
# reference (WordCountV2.java:76-79).
_ORACLE_TOKENS = (
    "list_filter(string_split_regex(lower(regexp_replace(text, "
    r"'([^\s\w]|_)+', ' ', 'g')), '\s+'), t -> t <> '')"
)


@register(
    "bigram_count",
    headline=True,
    tags=("reference", "flagship"),
    description=(
        "Flagship: sanitize → tokenize → filter(<2 tokens) → adjacent-pair "
        "explode → groupBy.count, mirroring WordCountV2.java:76-111."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT {_ORACLE_TOKENS} AS t FROM documents
        )
        SELECT t[i] || '+' || t[i + 1] AS bigram,
               COUNT(*) AS cnt
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
        GROUP BY 1
    """,
)
def q_bigram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_counts(load_table(spark, sf_dir, "documents"))


@register(
    "wordcount",
    tags=("reference",),
    description="Classic wordcount (degenerate n=1 case of the n-gram op).",
    oracle=f"""
        WITH toks AS (
            SELECT {_ORACLE_TOKENS} AS t FROM documents
        )
        SELECT u.word AS word, COUNT(*) AS cnt
        FROM toks, UNNEST(t) AS u(word)
        GROUP BY 1
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_counts(
        load_table(spark, sf_dir, "documents"), n=1, out_key="word"
    )


@register(
    "trigram_count",
    tags=("reference",),
    description="n=3 n-gram counting (generalizes the reference's bigram op).",
    oracle=f"""
        WITH toks AS (
            SELECT {_ORACLE_TOKENS} AS t FROM documents
        )
        SELECT t[i] || '+' || t[i + 1] || '+' || t[i + 2] AS ngram,
               COUNT(*) AS cnt
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
        GROUP BY 1
    """,
)
def q_trigram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_counts(load_table(spark, sf_dir, "documents"), n=3)


@register(
    "doc_token_stats",
    tags=("reference",),
    description=(
        "Per-record sanitize/tokenize/filter projection (O4-O6): token count "
        "per document for documents with >= 2 tokens."
    ),
    oracle=f"""
        SELECT doc_id,
               CAST(len({_ORACLE_TOKENS}) AS BIGINT) AS n_tokens
        FROM documents
        WHERE len({_ORACLE_TOKENS}) >= 2
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(sanitize(F.col("text")))
    return (
        docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 2)
    )
