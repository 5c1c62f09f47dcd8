"""Append newly registered queries to QUERY_LEDGER.json.

The ledger is an append-only record of registration order: the
rotation in ``__spark_entry__`` fronts never-driver-checked queries
and, among those, puts the longest-registered first — so every query
earns its driver-green row within two rounds even when more than 50
are waiting. Run this after registering new queries;
``tests/test_entry_rotation.py`` fails until you do, so forgetting is
loud, not silent.

Usage:  python tools/update_ledger.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LEDGER = os.path.join(ROOT, "QUERY_LEDGER.json")


def main() -> int:
    import __spark_entry__ as entry_mod

    try:
        with open(LEDGER) as fh:
            names: list[str] = json.load(fh)
    except (OSError, ValueError):
        names = []
    seen = set(names)
    added = [k for k in entry_mod.queries() if k not in seen]
    if not added:
        print(f"ledger up to date ({len(names)} entries)")
        return 0
    names.extend(added)
    with open(LEDGER, "w") as fh:
        json.dump(names, fh, indent=0)
        fh.write("\n")
    print(f"appended {len(added)}: {added}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
