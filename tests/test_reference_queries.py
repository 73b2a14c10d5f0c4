"""Oracle-differential tests for the reference-parity queries (SURVEY.md §2)."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query

REFERENCE_QUERIES = [
    "bigram_count",
    "wordcount",
    "trigram_count",
    "doc_token_stats",
    "zip_roundtrip_census",
    "warc_roundtrip_census",
]


@pytest.mark.parametrize("name", REFERENCE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "bigram" in df.columns


def test_bigram_semantics(spark):
    """Pin the reference's exact per-record semantics on a hand-built corpus.

    sanitize (WordCountV2.java:76-79): `([^\\s\\w]|_)+` -> ' ', lowercase,
    ASCII classes (ñ is a separator); windows never cross records; records
    with <2 tokens dropped (WordCountV2.java:85-86).
    """
    from hadoop_map_reduce_spark.operators.bigram import bigram_counts

    df = spark.createDataFrame(
        [
            ("Hello, World_zuni!",),   # -> hello world zuni
            ("one",),                  # dropped: 1 token
            ("",),                     # dropped: 0 tokens
            ("Zuñi bread-stuff",),     # ñ splits: zu i bread stuff
            ("hello world again",),
        ],
        ["text"],
    )
    got = {(r["bigram"], r["cnt"]) for r in bigram_counts(df).collect()}
    assert got == {
        ("hello+world", 2),
        ("world+zuni", 1),
        ("zu+i", 1),
        ("i+bread", 1),
        ("bread+stuff", 1),
        ("world+again", 1),
    }
