"""Per-query bench regression diff.

Compares two ``BENCH_DETAIL.json`` snapshots (the per-query timing
file ``bench.py`` writes next to its short stdout summary) and
reports queries whose steady-state wall moved by more than the noise
threshold — the guard that separates "the VM was slow today" from
"this commit regressed a plan".

The sandbox's run-to-run variance is ±35% (PERF.md), so the default
threshold is 2.0×: anything under that is noise unless it repeats
across runs; anything over it on a min-of-2 timing is a plan change
worth reading.

Usage::

    python tools/bench_diff.py OLD.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    return data["queries"] if "queries" in data else data


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regressions, improvements = [], []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0:
            continue
        ratio = n / o
        if ratio >= threshold:
            regressions.append((ratio, name, o, n))
        elif ratio <= 1 / threshold:
            improvements.append((ratio, name, o, n))

    o_sum = sum(old[q] for q in common)
    n_sum = sum(new[q] for q in common)
    print(
        f"common {len(common)} queries: {o_sum:.1f}s -> {n_sum:.1f}s "
        f"({n_sum / o_sum:.2f}x)" if o_sum else "no common queries"
    )
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{q}={new[q]:.2f}s" for q in added
        ))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    for ratio, name, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    for ratio, name, o, n in sorted(improvements):
        print(f"improved   {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if not regressions:
        print(f"no regressions over {threshold}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
