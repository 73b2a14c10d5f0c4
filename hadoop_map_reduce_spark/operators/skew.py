"""Skew-mitigation utilities.

AQE's skew-join splitting (on by default in this engine's sessions)
handles most runtime skew; these utilities cover the cases AQE cannot:
aggregations over pathologically hot keys, and joins where the skewed
side must be decided at plan time (e.g. inside a larger pipeline AQE
won't re-plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left (skewed, large) side salted.

    Each left row gets a uniform salt in [0, salt); the right side is
    replicated ``salt`` times via an exploded sequence (no driver loop).
    The shuffle key becomes (key, salt), splitting each hot key's rows
    across ``salt`` reducers. Right-side replication costs |right| x salt
    rows — use for large-skewed ⋈ small-to-medium shapes; for two huge
    skewed sides prefer AQE skew handling.

    Only ``inner`` and ``left`` joins are supported: the replicated right
    side would emit each unmatched right row ``salt`` times under
    right/full-outer semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: the "
            "replicated right side breaks right/full-outer semantics"
        )
    salted_l = left.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key])
        & (salted_l["_salt"] == salted_r["_salt"]),
        how,
    )
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe count/sum: pre-aggregate on (key, salt), then merge.

    For hot-key aggregations where a single reducer would own the hot
    key's entire input. Spark's partial aggregation already does this
    per-partition; explicit salting helps when upstream partitioning
    concentrates a key (e.g. post-join) and the partial agg can't see
    enough of it.
    """
    salted = df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum(agg_col).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"), F.sum("_sum").alias("total")
    )
