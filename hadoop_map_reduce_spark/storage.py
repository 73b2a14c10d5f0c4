"""Storage-layout utilities: bucketing and partitioned layouts.

At 100 TB the dominant join cost is the shuffle; bucketing both sides of
a recurring join key at write time makes the join shuffle-free forever
after (Spark reads bucket files as pre-partitioned inputs). Partitioned
layouts (by e.g. date) give partition pruning on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` between tables bucketed with the
    same count read co-located buckets and skip the exchange entirely;
    sorted buckets additionally skip the sort of a sort-merge join.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout → partition pruning on read."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def overwrite_partitions_dynamic(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leave every other partition untouched — the idempotent
    daily-backfill write (re-running a day's job rewrites that day, not
    the table). Static ``mode("overwrite")`` would truncate the whole
    root path first.

    Scoped via the session conf around this one write; restored after,
    so other writers keep the static default.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).format(
            fmt
        ).save(path)
    finally:
        spark.conf.set(key, prev)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol,
    num_files: int = 32,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Cluster rows by a z-order key at write time.

    ``zcol`` is the interleaved key (see
    ``plans.layout_queries.zorder_key``). ``repartitionByRange`` range-
    partitions on z (one sample pass, contiguous non-overlapping z-ranges
    per output file) and the within-partition sort keeps each parquet
    row group's footer min/max tight on BOTH interleaved dimensions —
    the stats a scan consults to skip files/row-groups for a predicate
    on either dimension. This is the write-side half of the layout
    story; `layout_zorder_clusters` is the read-side report.
    """
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite a directory of many small files into ~target-sized files.

    The small-files problem is the silent killer of long-lived 100 TB
    tables: every streaming micro-batch / incremental append leaves
    files far below the scan-efficient size, and scan planning, footer
    reads, and shuffle-map counts all scale with FILE COUNT, not bytes.
    Compaction = read + coalesce to ceil(bytes / target) + rewrite.
    ``coalesce`` (not ``repartition``) so the rewrite is shuffle-free —
    existing partitions are concatenated, never re-hashed; row order
    within input files is preserved, so footer min/max stats of sorted
    (e.g. z-ordered) data stay as tight as the merge allows.

    Swap protocol (two renames — directory swap cannot be a single
    atomic op on a generic filesystem): write to ``<path>.compact``,
    rename ``<path>`` -> ``<path>.old``, rename the compact dir into
    place, delete the backup. A crash between the renames leaves
    ``<path>.old`` holding the intact original; the next ``compact``
    call detects that state and restores it before proceeding, so the
    table is never lost and reruns self-heal. Hive-style partitioned
    layouts (``col=value`` subdirectories) are refused — reading them
    flat would silently destroy the partition columns' physical layout;
    compact each partition directory individually instead.

    Returns the new file count.
    """
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    bak = Path(str(p) + ".old")
    if bak.exists():
        # Crashed previous run: the backup is the authoritative table.
        if not p.exists():
            bak.rename(p)
        else:
            shutil.rmtree(bak)
    if any(d.is_dir() and "=" in d.name for d in p.iterdir()):
        raise ValueError(
            f"{path} is a partitioned layout; compact each partition "
            "directory individually to preserve partition pruning"
        )
    data_files = [
        f for f in p.rglob("*") if f.is_file() and not f.name.startswith("_")
    ]
    total_bytes = sum(f.stat().st_size for f in data_files)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = str(p) + ".compact"
    (
        spark.read.format(fmt)
        .load(str(p))
        .coalesce(n_files)
        .write.mode("overwrite")
        .format(fmt)
        .save(tmp)
    )
    p.rename(bak)
    Path(tmp).rename(p)
    shutil.rmtree(bak)
    return n_files
