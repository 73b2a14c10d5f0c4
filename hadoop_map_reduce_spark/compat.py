"""Drop-in compatibility with the reference's job surface.

The reference is driven as ``hadoop jar bigram.jar WordCountV2 <in> <out>``
(WordCountV2.java:25-68): text lines in, 32 sorted ``bigram<TAB>count``
part files + ``_SUCCESS`` out. ``python -m hadoop_map_reduce_spark.compat
<in> <out>`` is the same contract on this engine — same arguments, same
output directory shape, same key format — so existing jobs switch without
changes to anything downstream of the output path.

Also provides :func:`map_reduce`, the generalized surface: the reference's
Mapper is a UDTF (record → N key-value pairs) and its Reducer a UDAF
(grouped values → 1 result) — SURVEY.md §2. Arbitrary Python
mapper/reducer pairs run distributed via the RDD layer. This is the
compatibility escape hatch, NOT the recommended path: per-record Python is
~10-100x slower than the declarative DataFrame operators in this package,
so use it only for logic the built-ins genuinely cannot express.
"""

from __future__ import annotations

import sys
from collections.abc import Callable, Iterable, Iterator
from typing import Any, TypeVar

from pyspark.sql import DataFrame, SparkSession

from hadoop_map_reduce_spark.operators.bigram import bigram_counts
from hadoop_map_reduce_spark.sinks import write_kv_text
from hadoop_map_reduce_spark.sources import read_text_lines

K = TypeVar("K")
V = TypeVar("V")


def map_reduce(
    df: DataFrame,
    mapper: Callable[[Any], Iterable[tuple[K, V]]],
    reducer: Callable[[V, V], V],
    num_partitions: int | None = None,
):
    """Hadoop-style map/shuffle/reduce over a DataFrame's rows.

    ``mapper``: one input Row → iterable of (key, value) pairs (the UDTF
    role, WordCountV2.java:81-95). ``reducer``: associative+commutative
    binary combine (the UDAF role, WordCountV2.java:102-111).

    Runs as ``flatMap → reduceByKey`` — reduceByKey applies the combine
    map-side first (the combiner the reference never configured,
    WordCountV2.java:44-57), so shuffle volume is per-distinct-key, not
    per-record. Returns an RDD of (key, value).
    """
    rdd = df.rdd.flatMap(mapper)
    return rdd.reduceByKey(reducer, numPartitions=num_partitions)


def map_reduce_sorted(
    df: DataFrame,
    mapper: Callable[[Any], Iterable[tuple[K, V]]],
    reducer: Callable[[K, Iterator[V]], Any],
    num_partitions: int = 32,
):
    """Hadoop secondary sort: values arrive at the reducer SORTED within
    each key group.

    The classic MapReduce pattern (composite key + grouping comparator —
    the capability the reference's framework exposes through
    ``setSortComparatorClass``/``setGroupingComparatorClass``, unused in
    WordCountV2 but part of the Reducer contract's sorted-shuffle
    guarantee, SURVEY.md §2 O10). Spark equivalent:
    ``repartitionAndSortWithinPartitions`` on the composite (key, value)
    with partitioning by key only, then a STREAMING per-key group walk in
    ``mapPartitions`` — values are never materialized per key (unlike
    ``groupByKey``), so a hot key spills to disk in the sort, not to a
    reducer-side list. ``reducer`` takes (key, sorted-value-iterator) and
    returns one result per key.
    """
    from pyspark.rdd import portable_hash

    composite = df.rdd.flatMap(mapper).map(lambda kv: (kv, None))
    part = composite.repartitionAndSortWithinPartitions(
        numPartitions=num_partitions,
        partitionFunc=lambda ck: portable_hash(ck[0]),
    )

    def stream(rows: Iterator[tuple[tuple[K, V], None]]):
        from itertools import groupby

        for key, grp in groupby(rows, key=lambda r: r[0][0]):
            yield key, reducer(key, (r[0][1] for r in grp))

    return part.mapPartitions(stream, preservesPartitioning=False)


def run_bigram_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    num_partitions: int = 32,
    hadoop_layout: bool = True,
) -> None:
    """The reference's flagship job, end to end (WordCountV2 semantics).

    Declarative pipeline (scan → sanitize/tokenize/explode → count) with
    the reference's output contract: ``num_partitions`` sorted
    ``bigram<TAB>count`` text parts + ``_SUCCESS``; ``hadoop_layout=True``
    reproduces the exact Text.hashCode%N key→file assignment of the
    committed golden artifacts.
    """
    lines = read_text_lines(spark, input_path)
    counts = bigram_counts(lines, text_col="value")
    write_kv_text(
        counts,
        output_path,
        key_col="bigram",
        value_col="cnt",
        num_partitions=num_partitions,
        sort_within=True,
        hadoop_layout=hadoop_layout,
    )


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("Usage: python -m hadoop_map_reduce_spark.compat <in> <out>")
        return 2
    from hadoop_map_reduce_spark import get_spark

    spark = get_spark(app_name="Bigram")  # job name, WordCountV2.java:46
    try:
        run_bigram_job(spark, argv[0], argv[1])
    finally:
        spark.stop()
    print("Job Successful")  # status report, WordCountV2.java:62-66
    return 0


if __name__ == "__main__":
    sys.exit(main())
