"""Round-11 measurement harness (guide §1): per-query timing into the
noop sink plus ``explain("formatted")`` capture for the optimization
round's before/after evidence.

Usage:
    python tools/r11_measure.py plans [query ...]   # write plans/r11/<q>_<tag>.txt
    python tools/r11_measure.py time  [query ...]   # time median-of-3 into noop
    R11_TAG=after python tools/r11_measure.py plans ...  # tag output files

Defaults to every headline query when no names are given. Timing uses
the same methodology as bench.py (warmup + median of 3, noop sink,
$SPARK_GRAFT_SF_DIR input) so numbers are comparable, but runs only the
requested subset so one query can be isolated while iterating.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    from hadoop_map_reduce_spark import get_spark
    from hadoop_map_reduce_spark.plans import REGISTRY

    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("R11_TAG", "before")

    spark = get_spark(app_name=f"r11-measure-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    headline = [q for q in REGISTRY.values() if q.headline]
    if names:
        qs = [REGISTRY[n] for n in names]
    else:
        qs = headline

    if mode == "plans":
        out_dir = REPO / "plans" / "r11"
        out_dir.mkdir(parents=True, exist_ok=True)
        for q in qs:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = out_dir / f"{q.name}_{tag}.txt"
            path.write_text(plan)
            print(f"wrote {path}")
    elif mode == "time":
        # Warm page cache like bench.py so numbers are comparable.
        for fname in sorted(os.listdir(sf_dir)):
            if fname.endswith(".parquet"):
                with open(os.path.join(sf_dir, fname), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
        results = {}
        for q in qs:
            spark.sparkContext.setJobDescription(f"r11:{q.name}")

            def run(q=q):
                q.fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()

            run()  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                runs.append(round(time.perf_counter() - t0, 3))
            results[q.name] = {
                "median": statistics.median(runs),
                "runs": runs,
            }
            print(json.dumps({q.name: results[q.name]}), flush=True)
        total = round(sum(v["median"] for v in results.values()), 3)
        print(json.dumps({"total_median": total}))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
