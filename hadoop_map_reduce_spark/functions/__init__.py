"""Column-level scalar/array functions (all JVM-side, codegen-friendly)."""

from hadoop_map_reduce_spark.functions.text import (
    bigrams,
    ngrams,
    sanitize,
    tokenize,
)
from hadoop_map_reduce_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "bigrams",
    "ngrams",
    "sanitize",
    "tokenize",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
