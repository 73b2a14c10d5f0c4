"""Targeted oracle check: verify ONLY the named queries against their
DuckDB oracles (verify_contract's comparison, subset form) — the fast
inner loop for the optimization round.

Usage: python tools/r11_check.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only, rows={len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ss = sorted([tuple(r[i] for i in so) for r in srows], key=repr)
        dd = sorted([tuple(r[i] for i in do) for r in drows], key=repr)
        ok = sorted(scols) == sorted(dcols) and ss == dd
        print(f"{name}: {'OK' if ok else 'FAIL'} spark={len(srows)} "
              f"duck={len(drows)}")
        if not ok:
            fails.append(name)
            for i, (a, b) in enumerate(zip(ss, dd)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} duck={b}")
                    break
    print("FAILS:", fails if fails else "none")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
