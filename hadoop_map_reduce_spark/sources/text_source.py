"""Text-line source (reference O2: implicit ``TextInputFormat``).

The reference reads newline-delimited text as (byte-offset, line) records
(WordCountV2.java:48, default input format). Spark's text source is the
same capability — splittable by file block, pushdown-friendly — with the
offset key dropped (the reference's mapper ignores it too,
WordCountV2.java:81-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(
    spark: SparkSession,
    *paths: str,
    with_file: bool = False,
    wholetext: bool = False,
) -> DataFrame:
    """Read newline text file(s) to a ``value: string`` DataFrame.

    ``with_file=True`` adds the source ``file`` column (useful when one
    corpus spans many files — the capability the reference's single-path
    ZIP source lacked, NYUZInputFormat.java:58).
    """
    df = spark.read.text(list(paths), wholetext=wholetext)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df
