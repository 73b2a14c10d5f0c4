"""General format IO: CSV / JSON-lines / parquet readers and writers.

The reference speaks only newline text and ZIP (SURVEY.md §2 O2/O3);
these cover the formats any replacement pipeline actually ingests.
All thin wrappers over Spark's native (splittable, pushdown-capable)
sources — they exist so engine users have one import surface, not to
reinvent the readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
    infer: bool = False,
) -> DataFrame:
    """CSV read. Pass an explicit ``schema`` in production — inference
    costs a full extra pass over the data (O(corpus) at 100 TB)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(list(paths))


def read_jsonl(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """JSON-lines read (one object per line, splittable)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(list(paths))


def write_csv(
    df: DataFrame, path: str, header: bool = True, sep: str = ",",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(spark: SparkSession, *paths: str) -> DataFrame:
    """ORC: the other columnar format with predicate pushdown + column
    pruning; same scan contract as parquet."""
    return spark.read.orc(list(paths))


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet read across schema versions (``mergeSchema``).

    Long-lived tables accrete columns: files written before a column
    existed simply lack it. ``mergeSchema`` unions the file schemas
    (by name) and fills missing columns with NULL, so old and new files
    scan as one table — the append-only schema-evolution contract a
    100-TB lakehouse table needs (add-column is free; renames/drops are
    NOT reconciled — a rename reads as drop + add, both halves nullable).

    Cost note: merging reads every file footer at planning time rather
    than one; on tables with very many files, prefer declaring the
    target schema explicitly via ``spark.read.schema(...)`` — same
    NULL-fill semantics, no extra footer pass.
    """
    return spark.read.option("mergeSchema", True).parquet(*paths)
