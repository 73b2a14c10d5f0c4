"""Dense-vector math over ``array<float|double>`` columns — pure Column
expressions (``zip_with`` / ``aggregate``), no Python UDFs, so similarity
scans stay JVM-side and codegen'd even over 100 TB of embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, computed in double precision, left-to-right."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a|| * ||b||); null-safe on zero vectors (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
