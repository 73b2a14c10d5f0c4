"""Regenerate the DRIVER_VERIFIED set from CORRECTNESS_r*.json files.

Usage: python tools/update_verified.py [CORRECTNESS_r01.json ...]

Prints the names with a conclusive driver verdict — green (rows+schema+
hash match) in any round, or rows-only-by-design (err == "no_oracle" and
the registry entry has no oracle) — as a ready-to-paste sorted block for
``plans/verification.py``. Names whose registered plan changed since
their green round must still be removed BY HAND (the tool cannot know
which plans changed; list them in the round notes).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from hadoop_map_reduce_spark.plans import REGISTRY

    paths = [Path(p) for p in sys.argv[1:]] or sorted(
        Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")
    )
    green: set[str] = set()
    rows_only: set[str] = set()
    for path in paths:
        data = json.loads(path.read_text())
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                green.add(name)
            elif (
                row.get("err") == "no_oracle"
                and name in REGISTRY
                and REGISTRY[name].oracle is None
            ):
                rows_only.add(name)
    stale = (green | rows_only) - set(REGISTRY)
    if stale:
        print(f"# WARNING: not in registry anymore: {sorted(stale)}")
    print(f"# green in {len(paths)} round file(s): {len(green)}; "
          f"rows-only done: {len(rows_only)}")
    for name in sorted(green | rows_only):
        print(f'        "{name}",')


if __name__ == "__main__":
    main()
