"""Format IO roundtrips."""

from __future__ import annotations

from hadoop_map_reduce_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,comma", 1.5), (2, 'quo"te', -2.0)], ["id", "s", "x"]
    )
    write_csv(df, str(tmp_path / "c"))
    back = read_csv(
        spark, str(tmp_path / "c"), schema="id bigint, s string, x double"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"k": "v"}), (2, {"k": "w"})], ["id", "m"]
    )
    write_jsonl(df, str(tmp_path / "j"))
    back = read_jsonl(spark, str(tmp_path / "j"), schema="id bigint, m map<string,string>")
    assert sorted((r.id, dict(r.m)) for r in back.collect()) == [
        (1, {"k": "v"}), (2, {"k": "w"}),
    ]


def test_partitioned_parquet_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        ["id", "par"],
    )
    write_parquet(df, str(tmp_path / "p"), partition_by=["par"])
    back = spark.read.parquet(str(tmp_path / "p")).filter("par = 'even'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(par" in plan  # pruned at the scan
    assert back.count() == 50


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from hadoop_map_reduce_spark.sources.formats import read_orc, write_orc
    from hadoop_map_reduce_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    # Filters reach the ORC scan like they do for parquet.
    plan = (
        back.filter("o_orderkey < 100")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan


def test_dynamic_partition_overwrite_replaces_only_touched(spark, oracle_sf_dir, tmp_path):
    """Incremental pipelines rewrite ONE partition of a date-partitioned
    table per run; dynamic overwrite mode must leave sibling partitions
    intact (static mode would truncate the whole table)."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.session import load_table

    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, oracle_sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    full = spark.read.parquet(out)
    statuses = [r.o_orderstatus for r in full.select("o_orderstatus").distinct().collect()]
    assert len(statuses) >= 2
    target = statuses[0]
    before_other = full.filter(F.col("o_orderstatus") != target).count()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = orders.filter(F.col("o_orderstatus") == target).withColumn(
            "o_totalprice", F.lit(0.0)
        )
        patch.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    after = spark.read.parquet(out)
    assert after.filter(F.col("o_orderstatus") != target).count() == before_other
    assert (
        after.filter(
            (F.col("o_orderstatus") == target) & (F.col("o_totalprice") != 0.0)
        ).count()
        == 0
    )


def test_merge_schema_reads_evolved_files(spark, oracle_sf_dir, tmp_path):
    """Schema evolution: files written before a column existed must read
    as NULL for that column under mergeSchema — the append-only contract
    a long-lived table relies on."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.session import load_table

    out = tmp_path / "evolving"
    v1 = load_table(spark, oracle_sf_dir, "region")
    v1.write.parquet(str(out / "batch=1"))
    v2 = v1.withColumn("ingested_by", F.lit("v2"))
    v2.write.parquet(str(out / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(out))
    assert "ingested_by" in merged.columns
    n = v1.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("ingested_by").isNull()).count() == n


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Old files lacking a column and new files carrying it must scan as
    one table: merged schema is the by-name union, missing values NULL,
    and filters on the new column still push down to the scan."""
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.sources.formats import read_parquet_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.range(0, 5).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.parquet(v1)
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("de").alias("lang"),
        (F.col("id") * 10).alias("quality"),
    ).write.parquet(v2)

    df = read_parquet_evolved(spark, v1, v2)
    assert sorted(df.columns) == ["doc_id", "lang", "quality"]
    assert df.count() == 8
    # rows from pre-evolution files surface the new column as NULL
    assert df.filter(F.col("quality").isNull()).count() == 5
    got = {r.doc_id: r.quality for r in df.collect()}
    assert got[6] == 60 and got[2] is None
    # pushdown still reaches the scan for the evolved column
    plan = (
        df.filter(F.col("quality") > 50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(quality), GreaterThan(quality,50)]" in plan


def test_ignore_corrupt_files_skips_bad_shard(spark, tmp_path):
    """Resilient scan: with ignoreCorruptFiles a truncated/garbage shard
    is skipped and the healthy shards still read — at 100 TB a handful
    of corrupt files must not fail the whole job. Default behavior
    (fail loudly) is also pinned, so silent data loss stays opt-in."""
    import pytest
    from pyspark.sql import functions as F

    src = tmp_path / "shards"
    spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1).write.parquet(
        str(src)
    )
    (src / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    # default: the corrupt shard fails the read
    with pytest.raises(Exception):
        spark.read.parquet(str(src)).count()

    got = (
        spark.read.option("ignoreCorruptFiles", True)
        .parquet(str(src))
        .count()
    )
    assert got == 100
