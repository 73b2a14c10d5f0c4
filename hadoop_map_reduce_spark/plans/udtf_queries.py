"""Python UDTF surface (SURVEY.md §2.2: the reference's Mapper IS a
user-defined table function — WordCountV2.java:71-96 emits many KV pairs
per input record).

The engine's hot paths express UDTF-shaped logic declaratively (explode
over Column expressions, which stays in codegen); this module registers
one REAL Python UDTF — lateral-joined per-token emission with positions
— so the imperative plugin surface is driver-verified too, not just the
declarative twin. UDTFs run row-at-a-time in Python: the right tool for
logic that genuinely cannot be a Column expression, and deliberately NOT
used anywhere performance-sensitive.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hadoop_map_reduce_spark.plans.llm_queries import _TOKS
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


class TokenPositions:
    """Emit (token, 1-based position) per token of the sanitized text —
    the same ASCII-regex semantics as functions.text.sanitize/tokenize
    (Python's re with re.ASCII mirrors the Java dialect)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        s = re.sub(r"([^\s\w]|_)+", " ", text, flags=re.ASCII).lower()
        pos = 0
        for tok in re.split(r"\s+", s, flags=re.ASCII):
            if tok != "":
                pos += 1
                yield tok, pos


@register(
    "udtf_token_positions",
    tags=("llm", "text", "udtf"),
    description=(
        "Python UDTF lateral join: per-token (token, position) emission "
        "over documents — the imperative row-generator surface, verified "
        "against unnest-with-ordinality."
    ),
    oracle=f"""
        SELECT doc_id,
               unnest({_TOKS}) AS token,
               generate_subscripts({_TOKS}, 1) AS pos
        FROM documents
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    fn = udtf(TokenPositions, returnType="token string, pos bigint")
    spark.udtf.register("hmrs_token_positions", fn)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM _udtf_documents d, LATERAL hmrs_token_positions(d.text) t
        """
    )
