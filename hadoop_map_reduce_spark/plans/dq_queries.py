"""Data-quality audit queries: constraint violations counted in one scan
(see operators/dq.py). The audit is how a pipeline refuses bad ingests;
both entries return (rule, n_violations) rows and are exactly
SQL-expressible, so the driver hash-checks them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.dq import audit
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

_ORDERS_AUDIT_ORACLE = """
    SELECT 'null_key' AS rule,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'negative_price',
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'bad_status',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'date_out_of_range',
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
                           OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    -- COUNT(col) counts non-null rows: null-keyed rows are excluded from
    -- both terms (they are the null rule's violations, not duplicates)
    SELECT 'dup_key', CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
"""


@register(
    "dq_orders_audit",
    tags=("relational", "dq", "aggregation"),
    description=(
        "Data-quality audit of orders: null/duplicate keys, negative "
        "totals, enum drift, date range — all rules in one aggregate "
        "scan, unpivoted to (rule, n_violations)."
    ),
    oracle=_ORDERS_AUDIT_ORACLE,
)
def dq_orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return audit(
        orders,
        {
            "null_key": F.col("o_orderkey").isNull(),
            "negative_price": F.col("o_totalprice") < 0,
            "bad_status": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "date_out_of_range": (
                F.col("o_orderdate")
                < F.lit("1992-01-01 00:00:00").cast("timestamp")
            )
            | (
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            ),
        },
        unique_keys={"dup_key": ["o_orderkey"]},
    )


_DOCS_AUDIT_ORACLE = """
    SELECT 'null_text' AS rule,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM documents
    UNION ALL
    SELECT 'char_count_drift',
           CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'empty_doc',
           CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'dup_doc_id', CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT)
    FROM documents
"""


@register(
    "dq_documents_audit",
    tags=("llm", "dq", "aggregation"),
    description=(
        "Corpus-ingest audit: null/empty text, metadata drift (n_chars "
        "vs actual length), duplicate doc ids — the refuse-bad-ingest "
        "gate of a corpus pipeline, one aggregate scan."
    ),
    oracle=_DOCS_AUDIT_ORACLE,
)
def dq_documents_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return audit(
        docs,
        {
            "null_text": F.col("text").isNull(),
            "char_count_drift": F.col("n_chars") != F.length("text"),
            "empty_doc": F.length(F.trim(F.col("text"))) == 0,
        },
        unique_keys={"dup_doc_id": ["doc_id"]},
    )
