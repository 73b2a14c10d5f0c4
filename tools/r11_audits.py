"""Round-11 x10 audits: the new registry entries via the standard
scale_audit harness, plus the auto-scaled-cells admission audit
(VERDICT r10 #5 done-bar: stream_ann_index_admission at auto cells,
x10 ratio recorded in BASELINE.md).

Usage: python tools/r11_audits.py
Prints one JSON line per audit.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_audit import BASE, build, time_query  # noqa: E402


def admission_auto_cells(spark, sf_dir: str) -> None:
    """stream_ann_index_admission's harness shape with the round-11
    auto-scaled quantizer (n_cells=None -> cells ∝ seed corpus)."""
    from hadoop_map_reduce_spark.plans.streaming_queries import (
        _run_admission_harness,
    )
    from hadoop_map_reduce_spark.streaming.neardup import AnnIndexAdmitter

    (
        _run_admission_harness(
            spark,
            sf_dir,
            "ann_index_auto",
            lambda store: AnnIndexAdmitter(store, threshold=0.4, n_probe=6),
            table="embeddings",
            id_col="vec_id",
            select_cols=("vec_id", "embedding"),
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


def main() -> None:
    from hadoop_map_reduce_spark import get_spark
    from hadoop_map_reduce_spark.plans import REGISTRY

    n = 10
    out_dir = f"/tmp/sfx{n}"
    spark = get_spark(app_name="r11-audits")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, n, out_dir)

    for name in (
        "ann_index_filtered_recall_bound",
        "ann_index_served_search",
        "ann_index_timetravel_census",
        "graph_kcore_converged",
    ):
        fn = REGISTRY[name].fn
        x1 = time_query(fn, spark, BASE)
        xn = time_query(fn, spark, out_dir)
        print(
            json.dumps(
                {
                    "query": name,
                    "x1_s": x1,
                    f"x{n}_s": xn,
                    "ratio": round(xn / x1, 1),
                }
            ),
            flush=True,
        )

    # auto-cells admission: warm pass then timed pass, both SFs
    def timed(sf_dir: str) -> float:
        admission_auto_cells(spark, sf_dir)
        t0 = time.perf_counter()
        admission_auto_cells(spark, sf_dir)
        return round(time.perf_counter() - t0, 2)

    x1 = timed(BASE)
    xn = timed(out_dir)
    print(
        json.dumps(
            {
                "query": "stream_ann_index_admission[auto-cells]",
                "x1_s": x1,
                f"x{n}_s": xn,
                "ratio": round(xn / x1, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
