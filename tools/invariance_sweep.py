"""Full-registry determinism sweep: every query must produce identical
rows under different shuffle partition counts AND different scan-split
sizes (the two knobs a deployment turns first). The CI suite pins a
sample (tests/test_partition_invariance.py); this tool sweeps all
registered queries before a round ships, because any
partitioning-dependent result becomes a red driver verdict when the
verification window reaches it.

Usage: python tools/invariance_sweep.py [sf_dir] [query ...]
Prints one line per query; final line FAILS: [...].
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rows(df):
    # repr-normalized so NaN == NaN compares equal (float('nan') !=
    # float('nan') would flag identical results as a false FAIL).
    return sorted(repr(tuple(r)) for r in df.collect())


def main() -> None:
    from hadoop_map_reduce_spark import get_spark
    from hadoop_map_reduce_spark.plans import REGISTRY

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(REGISTRY)

    spark = get_spark(app_name="hmrs-invariance", shuffle_partitions=32)
    fails: list[str] = []
    for name in names:
        fn = REGISTRY[name].fn
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
            wide = _rows(fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
            narrow = _rows(fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"ERR {name}: {type(ex).__name__} "
                  f"{str(ex).splitlines()[0][:120]}")
            continue
        ok = wide == narrow
        if not ok:
            fails.append(name)
            only_w = [r for r in wide if r not in narrow][:2]
            only_n = [r for r in narrow if r not in wide][:2]
            print(f"FAIL {name}: rows {len(wide)} vs {len(narrow)}; "
                  f"wide-only={only_w} narrow-only={only_n}")
        else:
            print(f"OK  {name}: {len(wide)} rows invariant")
    print("FAILS:", fails if fails else "none", f"({len(names)} queries)")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
