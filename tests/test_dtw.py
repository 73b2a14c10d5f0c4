"""DTW: pure-Python recomputation oracle (exact integer DP) plus
algorithmic pins (identity, symmetry, band behavior)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from hadoop_map_reduce_spark.operators.dtw import dtw_banded
from hadoop_map_reduce_spark.plans import REGISTRY
from hadoop_map_reduce_spark.session import load_table


def test_dtw_banded_properties():
    assert dtw_banded([1, 2, 3], [1, 2, 3], band=2) == 0  # identity
    a, b = [1, 5, 9, 2], [2, 4, 9, 1]
    assert dtw_banded(a, b, band=3) == dtw_banded(b, a, band=3)  # symmetry
    # phase shift: same shape offset by one step aligns nearly free
    assert dtw_banded([0, 10, 0, 0], [0, 0, 10, 0], band=1) == 0
    # band too narrow to reach the alignment -> larger distance
    assert dtw_banded([0, 10, 0, 0], [0, 0, 10, 0], band=0) == 20
    with pytest.raises(ValueError):
        dtw_banded([1], [1, 2, 3, 4], band=1)  # unreachable corner
    with pytest.raises(ValueError):
        dtw_banded([], [1], band=1)


def test_query_matches_pure_python(spark, sf_dir):
    got = {
        (r.id_a, r.id_b): r.dtw
        for r in REGISTRY["timeseries_dtw"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in ev.collect():
        day = r["ts"].date()
        # round-half-up like Spark ROUND on doubles
        v = r["value"] * 10000
        cents = int(v + 0.5) if v >= 0 else -int(-v + 0.5)
        daily[r["event_type"]][day] += cents
    series = {
        k: [v for _, v in sorted(d.items())] for k, d in daily.items()
    }
    want = {}
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            want[(ta, tb)] = dtw_banded(series[ta], series[tb], band=7)
    assert got == want
    assert len(got) == len(types) * (len(types) - 1) // 2
