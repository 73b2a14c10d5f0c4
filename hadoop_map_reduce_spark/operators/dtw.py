"""Banded dynamic-time-warping distance between keyed series.

The classic time-series similarity measure that tolerates phase shift
(Sakoe & Chiba 1978 band; REPOSE/ICDE'21-style distributed pairing).
This is the textbook case for the engine's custom-operator tier (c):
a per-pair dynamic program no relational rewrite can express — so it
runs as an Arrow-batched ``mapInPandas`` stage over pre-assembled
series arrays, one independent task per pair.

Scale shape: the corpus-sized work is the per-series aggregation that
BUILDS the series (one partial-agg'd shuffle); the DP runs on series
ARRAYS whose length is bounded by the time range, not the corpus, and
pairs parallelize embarrassingly. Values are integer-scaled, the DP is
exact integer arithmetic — deterministic across engines and runs,
pinned by a pure-Python recomputation test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


def dtw_banded(a: list[int], b: list[int], band: int) -> int:
    """Exact banded DTW with |i-j| <= band (Sakoe-Chiba); cost = |x-y|,
    ints in, int out. O(len(a)·band) time, two rolling rows."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("DTW over an empty series is undefined")
    if abs(n - m) > band:
        raise ValueError(f"band {band} cannot align lengths {n} and {m}")
    prev = [_INF] * (m + 1)
    prev[0] = 0
    for i in range(1, n + 1):
        cur = [_INF] * (m + 1)
        lo = max(1, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return int(prev[m])


def dtw_distance_pairs(
    series: DataFrame,
    band: int = 7,
    id_col: str = "series_id",
    time_col: str = "t",
    value_col: str = "v",
) -> DataFrame:
    """All-pairs banded DTW between the keyed series in ``series``
    (long format: one row per (series, time, int value)).

    Series are assembled once (sorted by time inside an array_sort over
    (t, v) structs — no window needed), then every unordered id pair
    meets its two arrays and the DP runs per pair in Arrow batches.
    The pair join is tiny-side (series COUNT, not length); callers with
    many series should pre-filter pairs by a cheap bound first.
    Returns (id_a, id_b, dtw).
    """
    arrays = series.groupBy(F.col(id_col).alias("_id")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(time_col), F.col(value_col)))
            ),
            lambda s: s[value_col],
        ).alias("_vals")
    )
    a = arrays.select(
        F.col("_id").alias("id_a"), F.col("_vals").alias("_va")
    )
    b = arrays.select(
        F.col("_id").alias("id_b"), F.col("_vals").alias("_vb")
    )
    joined = a.join(b, F.col("id_a") < F.col("id_b"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "dtw": [
                        dtw_banded(
                            [int(x) for x in va], [int(x) for x in vb], band
                        )
                        for va, vb in zip(pdf["_va"], pdf["_vb"])
                    ],
                }
            )

    out_schema = (
        f"id_a {dict(series.dtypes)[id_col]}, "
        f"id_b {dict(series.dtypes)[id_col]}, dtw bigint"
    )
    return joined.mapInPandas(batches, out_schema)
