"""Scale audit: measure flagship queries at Nx the sf0.1 data volume.

Builds (once) an Nx dataset at /tmp/sfx{N}: fact/doc tables are N
id-shifted copies of sf0.1, dimension tables are copied unchanged, so
fact->dim joins keep their selectivity and fact->fact joins match within
a copy. Document text is rot-ciphered per copy (rotation i%26) so each
base text matches only its ~N/26 same-rotation copies, not all N: at
N=100 that is 22*C(4,2) + 4*C(3,2) = 144 cross-copy identical pairs per
base text instead of C(100,2) = 4950 — a heavy but not degenerate
near-dup load (measured for dedup_minhash_lsh: 256 pairs at x1 ->
819,328 at x100, i.e. 3200x the output for 24x the time; see
BASELINE.md).

Usage: python tools/scale_audit.py [N] [query ...]
Prints one JSON line per query: {"query", "x1_s", "xN_s", "ratio"}.
Ratio ~ N = linear scaling; << N = fixed overhead still dominating;
>> N = super-linear (investigate).

Methodology notes:
- warm timing (second run) into the noop sink, same session;
- multi-file parquet output (one file per copy-partition), so scans
  parallelize by row group the way a real multi-file corpus does;
- dims (region/nation/customer/supplier/part) unchanged — at any scale
  they remain broadcast-sized, which is exactly the 100-TB shape.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "customer", "supplier", "part")
DEFAULT_QUERIES = [
    "bigram_count",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "events_hourly",
    "sessionization",
    "text_quality",
    "tfidf_top_terms",
    "dedup_minhash_lsh",
    "similarity_topk",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot(i: int) -> tuple[str, str]:
    r = i % 26
    return _ALPHA + _ALPHA.upper(), (
        _ALPHA[r:] + _ALPHA[:r] + (_ALPHA[r:] + _ALPHA[:r]).upper()
    )


def build(spark, n: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    def complete(path: str) -> bool:
        # A bare directory check would accept a killed run's partial
        # output (Spark creates the dir before committing); _SUCCESS is
        # only written on commit.
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    for t in DIMS:
        dst = f"{out_dir}/{t}.parquet"
        if not complete(dst):
            spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(dst)

    shifts = {
        # (table, shifted id columns); fact->dim FKs stay unshifted.
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t, id_cols in shifts.items():
        dst = f"{out_dir}/{t}.parquet"
        if complete(dst):
            continue
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        offset = base.agg(F.max(id_cols[0])).collect()[0][0] + 1
        copies = []
        for i in range(n):
            c = base
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * offset))
            if t == "documents":
                src, dmap = _rot(i)
                c = c.withColumn("text", F.translate("text", src, dmap))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        # one output file per copy keeps row-group parallelism realistic
        df.repartition(n).write.mode("overwrite").parquet(dst)
        print(f"built {t} x{n}", file=sys.stderr)


def time_query(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = f"/tmp/sfx{n}"

    from hadoop_map_reduce_spark import get_spark
    from hadoop_map_reduce_spark.plans import REGISTRY

    spark = get_spark(app_name=f"scale-audit-x{n}")
    build(spark, n, out_dir)

    for name in names:
        fn = REGISTRY[name].fn
        x1 = time_query(fn, spark, BASE)
        xn = time_query(fn, spark, out_dir)
        print(
            json.dumps(
                {
                    "query": name,
                    "x1_s": x1,
                    f"x{n}_s": xn,
                    "ratio": round(xn / x1, 1) if x1 > 0 else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
