"""Partitioned ``key<TAB>value`` text sink (reference O9/O10/O13 parity).

The reference writes one sorted text file per reduce partition plus a
``_SUCCESS`` marker (TextOutputFormat, WordCountV2.java:49,53; artifacts
``bigram_custom8/part-r-00000..00031``). Two modes:

- default (Spark-native, fast): ``repartition(n, key)`` (murmur3) +
  ``sortWithinPartitions`` + text write. Each written file is sorted with
  disjoint hash-assigned keys; NOTE the DataFrame writer emits no file
  for an empty partition, so the file count is <= n (and filenames carry
  writer UUIDs). Consumers needing exactly-n contiguously-numbered parts
  — the reference's output contract — must use ``hadoop_layout=True``.
- ``hadoop_layout=True``: byte-identical file-level layout with the
  reference — keys routed by Hadoop ``Text.hashCode`` via an RDD
  partitioner, exactly ``num_partitions`` files (``part-00000..``, empty
  partitions included, like TextOutputFormat). Slow path (Python
  round-trip); exists for golden-artifact parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.functions.hashing import hadoop_partition


def write_kv_text(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    num_partitions: int = 32,
    sort_within: bool = True,
    hadoop_layout: bool = False,
) -> None:
    """Write ``key<TAB>value`` lines, one file per hash partition.

    Emits Spark's ``_SUCCESS`` marker (same Hadoop output-committer
    behavior as the reference). Both modes share the overwrite contract:
    an existing target directory is replaced (``saveAsTextFile`` has no
    overwrite mode, so the hadoop_layout path clears the target through
    Hadoop's FileSystem API — works on any supported scheme, not just
    local paths).
    """
    if hadoop_layout:
        sc = df.sparkSession.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            fs.delete(hpath, True)
        kv = df.select(
            F.col(key_col).cast("string").alias("k"),
            F.col(value_col).cast("string").alias("v"),
        )
        lines = (
            kv.rdd.map(lambda r: (r["k"], r["v"]))
            .partitionBy(
                num_partitions, lambda k: hadoop_partition(k, num_partitions)
            )
            .mapPartitions(
                lambda it: (
                    f"{k}\t{v}"
                    for k, v in (sorted(it) if sort_within else it)
                )
            )
        )
        lines.saveAsTextFile(path)
        return

    out = df.select(
        F.concat_ws(
            "\t",
            F.col(key_col).cast("string"),
            F.col(value_col).cast("string"),
        ).alias("value"),
        F.col(key_col).cast("string").alias("_k"),
    ).repartition(num_partitions, F.col("_k"))
    if sort_within:
        out = out.sortWithinPartitions("_k")
    # The exactly-num_partitions contract vs AQE: when an upstream
    # exchange already hash-partitions on the same key with the same
    # count (e.g. the count aggregate and the session default both at
    # n), EnsureRequirements elides this repartition and AQE is then
    # free to coalesce the surviving upstream exchange — the write
    # produced 1-4 files instead of n. Pin coalescing off for the write
    # action only (restored after); upstream queries keep full AQE.
    sess = df.sparkSession
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = sess.conf.get(coalesce_key, "true")
    sess.conf.set(coalesce_key, "false")
    try:
        out.select("value").write.mode("overwrite").text(path)
    finally:
        sess.conf.set(coalesce_key, prev)
