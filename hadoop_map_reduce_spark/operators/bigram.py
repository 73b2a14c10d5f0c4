"""The reference's flagship pipeline: text → sanitized bigram counts.

Reference data path (SURVEY.md §3 EP2, WordCountV2.java:81-111):
``sanitize → tokenize → filter(<2 tokens) → sliding-pair emit → group-by-key
→ sum``. Here the whole thing is one declarative DataFrame chain; Catalyst
plans it as scan → project/explode → partial HashAggregate → single shuffle
→ final HashAggregate, i.e. the map-side combine the reference lacked
(no combiner, WordCountV2.java:44-57) comes free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.functions.text import bigrams, ngrams, sanitize, tokenize


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "+",
    out_key: str = "bigram",
    out_count: str = "cnt",
) -> DataFrame:
    """Count adjacent-token bigrams across all records of ``text_col``.

    Windows never cross records (reference: per-line windows,
    WordCountV2.java:88-94). One shuffle; partial aggregation map-side.
    """
    toks = tokenize(sanitize(F.col(text_col)))
    # The reference's <2-token filter (WordCountV2.java:85-86) is implicit:
    # ngrams() yields [] for short records and explode drops them. An
    # explicit filter would run the tokenize pipeline twice per row
    # (Catalyst duplicates computed-column predicates into the scan).
    return (
        df.select(toks.alias("_toks"))
        .select(F.explode(bigrams(F.col("_toks"), sep=sep)).alias(out_key))
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias(out_count))
    )


def ngram_counts(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    sep: str = "+",
    out_key: str = "ngram",
    out_count: str = "cnt",
) -> DataFrame:
    """Generalized n-gram counting (n=1 is the classic wordcount)."""
    toks = tokenize(sanitize(F.col(text_col)))
    return (
        df.select(toks.alias("_toks"))
        .select(F.explode(ngrams(F.col("_toks"), n=n, sep=sep)).alias(out_key))
        .groupBy(out_key)
        .agg(F.count(F.lit(1)).alias(out_count))
    )
