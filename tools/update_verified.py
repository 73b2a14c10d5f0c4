"""Regenerate the DRIVER_VERIFIED set from CORRECTNESS_r*.json files.

Usage: python tools/update_verified.py [CORRECTNESS_r01.json ...]

Prints the names with a GREEN driver verdict (rows+schema+hash match in
any round) as a ready-to-paste sorted block for
``plans/verification.py``. Rows-only entries (no oracle) are NOT
included: since round 6, ``verification_order`` sorts them dead last
structurally, so they never belong in DRIVER_VERIFIED. Names whose
registered plan changed since their green round must still be removed
BY HAND (the tool cannot know which plans changed; list them in the
round notes — round-6 precedent: multimodal_frame_hash_matches).
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
    for path in paths:
        data = json.loads(path.read_text())
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                green.add(name)
    stale = green - set(REGISTRY)
    if stale:
        print(f"# WARNING: not in registry anymore: {sorted(stale)}")
    green &= set(REGISTRY)
    print(f"# green in {len(paths)} round file(s): {len(green)}")
    for name in sorted(green):
        print(f'        "{name}",')


if __name__ == "__main__":
    main()
