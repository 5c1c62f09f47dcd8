"""Maintain GREEN_DIGESTS.json — per-query source digest at last driver-green.

Run this at ROUND START, before any code change, so the working tree
still matches the tree the driver tested: for every query whose latest
``CORRECTNESS_r*.json`` green round is newer than its recorded one, the
CURRENT source digest is what the driver verified, and gets stamped.

The rotation in ``__spark_entry__`` then treats any green query whose
live digest mismatches its stamp as unchecked — reworked queries
re-enter the 50-slot driver window the next round instead of waiting
out the staleness queue (VERDICT r9 finding #1 / next-round #1).

Usage:
    python tools/update_green_digests.py                 # stamp fresh greens
    python tools/update_green_digests.py --invalidate NAME [NAME...]
        # force-mark queries as reworked-since-green (used to seed the
        # ledger for reworks that predate digest tracking)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SIDE = os.path.join(ROOT, "GREEN_DIGESTS.json")


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from tableau_dashboard_performance_etl_automation_spark.digests import (
        registry_digests,
    )

    invalidate: set[str] = set()
    if argv and argv[0] == "--invalidate":
        invalidate = set(argv[1:])

    try:
        with open(SIDE) as fh:
            side = json.load(fh)
    except (OSError, ValueError):
        side = {}

    greens = entry_mod._green_rounds()
    current = registry_digests(entry_mod._raw_queries(), entry_mod._raw_oracles())

    unknown = invalidate - set(current)
    if unknown:
        print(f"--invalidate names not registered: {sorted(unknown)}")
        return 1

    stamped = invalidated = pruned = 0
    for name, rnd in greens.items():
        prev = side.get(name, {})
        if prev.get("round", -1) < rnd:
            side[name] = {"round": rnd, "digest": current[name]}
            stamped += 1
    for name in invalidate:
        if name in side:
            side[name]["digest"] = "invalidated:rework-predates-digest-tracking"
        else:
            side[name] = {
                "round": greens.get(name, 0),
                "digest": "invalidated:rework-predates-digest-tracking",
            }
        invalidated += 1
    for name in list(side):
        if name not in current:
            del side[name]
            pruned += 1

    with open(SIDE, "w") as fh:
        json.dump(dict(sorted(side.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"GREEN_DIGESTS.json: {len(side)} entries "
        f"({stamped} stamped, {invalidated} invalidated, {pruned} pruned)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
