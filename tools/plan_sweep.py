"""Registry-wide single-partition plan sweep.

Round-3 found three correct queries whose executed plans ranked a
corpus-sized table through ``Exchange SinglePartition`` (a
``Window.orderBy`` with no partition spec — the whole input sorts on one
task, a 100-TB scale killer that local benches never surface). This
sweep makes that defect class structurally visible: for every registered
query it executes the plan at a small SF and asserts every
``Exchange SinglePartition`` node's subtree is CONSTANT-BOUNDED — i.e.
it contains a limit node (``GlobalLimit`` / ``LocalLimit`` /
``TakeOrderedAndProject`` / ``CollectLimit``) or the whole subtree reads
only bounded-by-construction inputs named in the per-query allowlist.

Usage:
    python tools/plan_sweep.py [sf_dir] [query ...]   # default: all

Exit code 1 if any query has an unbounded single-partition exchange.
``tests/test_plan_quality.py`` runs the same check in CI via
``hadoop_map_reduce_spark.plancheck``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from hadoop_map_reduce_spark.plancheck import (
        SINGLE_PARTITION_ALLOWLIST,
        unbounded_single_partition_exchanges,
    )

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = args[1:] if args and "/" in args[0] else args

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    targets = names or list(qs)
    bad: list[str] = []
    for name in targets:
        if name in SINGLE_PARTITION_ALLOWLIST:
            print(f"{name}: allowlisted ({SINGLE_PARTITION_ALLOWLIST[name]})")
            continue
        try:
            df = qs[name](spark, sf_dir)
            df.collect()  # finalize the AQE plan
            offenders = unbounded_single_partition_exchanges(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            bad.append(name)
            continue
        if offenders:
            print(f"{name}: UNBOUNDED single-partition exchange(s):")
            for o in offenders:
                print(f"    {o}")
            bad.append(name)
        else:
            print(f"{name}: ok")
    print(f"\nswept {len(targets)}; offenders: {bad or 'none'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
