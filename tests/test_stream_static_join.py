"""Stream-static join: enrich a stream against a batch dimension table."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_stream_enriched_with_static_dim(spark, tmp_path, sf_dir):
    src = tmp_path / "ev"
    src.mkdir()
    schema = "event_id bigint, user_id bigint, value double"
    spark.createDataFrame(
        [(1, 0, 5.0), (2, 1, 7.0), (3, 99999, 1.0)], schema
    ).write.mode("overwrite").parquet(str(src / "b0"))

    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = spark.readStream.schema(schema).parquet(str(src / "b*"))
    enriched = stream.join(F.broadcast(customers), "user_id", "left")

    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.event_id: r.c_mktsegment for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert len(rows) == 3
    assert rows[1] is not None and rows[2] is not None
    assert rows[3] is None  # unmatched user keeps the event (left join)
