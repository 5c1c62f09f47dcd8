"""Contract tests for the driver-window rotation in __spark_entry__.

The driver's correctness gate checks only the FIRST 50 entries of
``queries()``; these tests pin the properties that guarantee every
registered query earns a driver-green row within two rounds:

* every registered query is in the append-only ledger (else the
  "longest-waiting first" order could silently rot — this is the
  fail-loud replacement for round 3's hardcoded ``_NEWEST`` tuple);
* unchecked queries lead, in ledger (registration) order — newest
  registrations last among the unchecked;
* driver-green queries sit at the tail.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry_mod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ledger() -> list[str]:
    with open(os.path.join(ROOT, "QUERY_LEDGER.json")) as fh:
        return json.load(fh)


def test_ledger_covers_every_registered_query():
    names = _ledger()
    missing = [k for k in entry_mod.queries() if k not in set(names)]
    assert not missing, (
        f"queries missing from QUERY_LEDGER.json: {missing} — "
        "run `python tools/update_ledger.py`"
    )


def test_ledger_has_no_duplicates_or_strays():
    names = _ledger()
    assert len(names) == len(set(names)), "duplicate ledger entries"
    registered = set(entry_mod.queries())
    strays = [n for n in names if n not in registered]
    assert not strays, f"ledger names no longer registered: {strays}"


def test_rotation_unchecked_lead_in_ledger_order_then_green_tail():
    green = entry_mod._driver_green()
    stale = entry_mod._stale_green_names()
    order = {n: i for i, n in enumerate(_ledger())}
    keys = list(entry_mod.queries())
    unchecked = [k for k in keys if k not in green]
    reworked = [k for k in keys if k in green and k in stale]
    head = keys[: len(unchecked)]
    mid = keys[len(unchecked): len(unchecked) + len(reworked)]
    tail = keys[len(unchecked) + len(reworked):]
    # never-green precede reworked greens precede fresh greens
    assert head == unchecked
    assert mid == reworked
    assert all(k in green and k not in stale for k in tail)
    # among unchecked: registration order (newest last)
    positions = [order[k] for k in unchecked]
    assert positions == sorted(positions), (
        "unchecked queries not in ledger (registration) order"
    )


def test_queries_and_oracles_share_rotation():
    q = list(entry_mod.queries())
    o = list(entry_mod.oracle_sql())
    assert q == o


def test_green_tail_reverifies_longest_unverified_first():
    """Re-verification cadence: when unchecked < 50, the driver's
    free window slots must fill with the STALEST green queries —
    green tail ordered by (last-green round asc, ledger position
    asc) within each of the reworked/fresh groups. Pins the invariant
    so it can't silently rot back to registration-order-only (which
    would starve early queries of re-verification once the ledger
    grows)."""
    rounds = entry_mod._green_rounds()
    stale = entry_mod._stale_green_names()
    order = {n: i for i, n in enumerate(_ledger())}
    keys = list(entry_mod.queries())
    for group in (
        [k for k in keys if k in rounds and k in stale],
        [k for k in keys if k in rounds and k not in stale],
    ):
        ranks = [(rounds[k], order.get(k, len(order)), k) for k in group]
        assert ranks == sorted(ranks), (
            "green group not longest-unverified first"
        )


def test_reworked_greens_promoted_by_digest_mismatch():
    """VERDICT r9 #1: a green query whose source digest no longer
    matches GREEN_DIGESTS.json must re-enter the checked window ahead
    of fresh greens. The three round-9 reworks were seeded as
    invalidated; they must occupy the head of the window until the
    driver re-verifies them (after which tools/update_green_digests.py
    restamps and this test's expectation adjusts to the empty set)."""
    green = entry_mod._driver_green()
    stale = entry_mod._stale_green_names()
    assert stale <= green, "stale set must be a subset of greens"
    keys = list(entry_mod.queries())
    window = set(keys[:50])
    if len(stale) <= 50 - len(window - green):
        # everything fits: full containment, the original invariant
        assert stale <= window, (
            f"reworked greens escaped the 50-slot window: {stale - window}"
        )
    else:
        # round-11: an optimization round can rework more greens than
        # one driver window holds (53 stale vs 50 slots). The
        # invariant then weakens to PRIORITIZED overflow: every window
        # slot not taken by a never-green entry holds a stale green,
        # and the escapees are exactly the stale entries with the
        # NEWEST last-green rounds (they head next round's queue).
        in_window_fresh = window & (green - stale)
        assert not in_window_fresh, (
            "window wasted slots on fresh greens while reworked "
            f"greens overflowed: {in_window_fresh}"
        )
        rounds = entry_mod._green_rounds()
        escaped = stale - window
        max_windowed_stale = max(rounds[k] for k in stale & window)
        assert all(rounds[k] >= max_windowed_stale for k in escaped), (
            "a STALER rework escaped while a fresher one sat in the "
            f"window: {escaped}"
        )


def test_digest_is_deterministic_and_source_sensitive():
    from tableau_dashboard_performance_etl_automation_spark.digests import (
        query_digest,
    )
    from tableau_dashboard_performance_etl_automation_spark.operators import (
        textops,
    )

    fn = textops.QUERIES["hybrid_rank_fusion"]
    sql = textops.ORACLE_SQL["hybrid_rank_fusion"]
    d1 = query_digest("hybrid_rank_fusion", fn, sql)
    d2 = query_digest("hybrid_rank_fusion", fn, sql)
    assert d1 == d2 and d1.startswith("sha256:")
    # oracle text is part of the digest
    assert query_digest("hybrid_rank_fusion", fn, sql + " ") != d1
    # name is part of the digest
    assert query_digest("other", fn, sql) != d1


def test_green_digests_sidecar_covers_all_greens():
    """Every driver-green query must have a sidecar stamp — a missing
    stamp silently promotes it forever. Run
    `python tools/update_green_digests.py` at round start."""
    with open(os.path.join(ROOT, "GREEN_DIGESTS.json")) as fh:
        side = json.load(fh)
    greens = entry_mod._driver_green()
    missing = greens - set(side)
    assert not missing, f"greens without digest stamp: {sorted(missing)}"


def test_green_digests_not_lagging_newest_correctness():
    """The sidecar must be refreshed (tools/update_green_digests.py)
    after every new CORRECTNESS_r*.json lands — round-10 VERDICT
    item 2: a skipped refresh leaves the just-verified greens stamped
    with PRE-rework digests, so `_stale_green_names()` reports them
    as reworked and they hijack the next driver window from the
    genuinely longest-unverified greens. Freshness invariant: for
    every query green in the newest CORRECTNESS round, the sidecar
    records that round (the refresh is what stamps it)."""
    import re

    with open(os.path.join(ROOT, "GREEN_DIGESTS.json")) as fh:
        side = json.load(fh)
    rounds = [
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
    ]
    newest = max(rounds)
    greens = entry_mod._green_rounds()
    lagging = sorted(
        name
        for name, rnd in greens.items()
        if rnd == newest and side.get(name, {}).get("round", -1) < newest
    )
    assert not lagging, (
        f"GREEN_DIGESTS lags CORRECTNESS_r{newest:02d} for {lagging} — "
        f"run `python tools/update_green_digests.py` at round start"
    )


def test_green_rounds_reads_latest_round():
    """_green_rounds must report the LATEST green round per query
    (a query green in r1 and re-verified in r4 ranks as r4)."""
    rounds = entry_mod._green_rounds()
    assert rounds, "no CORRECTNESS artifacts found"
    assert set(rounds) == entry_mod._driver_green()
    assert max(rounds.values()) >= 4  # r4 artifact exists in-repo


def test_no_query_name_collisions_across_modules():
    """Two modules registering the same query name silently shadow
    each other in the merged dict (dict.update) — the later module
    wins and the earlier oracle-green query vanishes. Round 5 nearly
    shipped this with order_interarrival_stats; fail loudly instead."""
    import importlib

    pkg = "tableau_dashboard_performance_etl_automation_spark.operators"
    modules = [
        "tabjolt", "analytics", "dedup", "similarity", "textops",
        "multimodal", "relational_ext", "starjoins", "subqueries",
        "sketches", "scrubbing", "chunking", "history", "intervals",
        "linkage", "clustering", "curation", "asof", "sampling",
        "streaming_twins", "profiling", "cohorts", "textstats",
        "statstests",
    ]
    seen: dict[str, str] = {}
    dupes = []
    for name in modules:
        mod = importlib.import_module(f"{pkg}.{name}")
        for q in mod.QUERIES:
            if q in seen:
                dupes.append((q, seen[q], name))
            seen[q] = name
    assert not dupes, f"query name collisions: {dupes}"
    # the merged registry must carry every module-level registration
    assert len(entry_mod.queries()) == len(seen)


def test_sql_compat_tolerance_helper():
    """_within_rel_tol (round-11): known numeric dialect divergences
    carry their diagnosed scale; the helper must accept drift inside
    it, reject drift beyond it, and fail closed on shape changes —
    so an old diagnosis can't keep explaining a regrown mismatch."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from sql_compat import _within_rel_tol

    cols = ["k", "v"]
    a = [("x", 1.0000001), ("y", -2.0)]
    # inside 1e-5 rel tol
    assert _within_rel_tol(cols, a, cols, [("x", 1.0), ("y", -2.0)], 1e-5)
    # beyond tol → rejected
    assert not _within_rel_tol(cols, a, cols, [("x", 1.1), ("y", -2.0)], 1e-5)
    # non-numeric cell must match exactly
    assert not _within_rel_tol(cols, a, cols, [("z", 1.0), ("y", -2.0)], 1e-5)
    # row-count mismatch fails closed
    assert not _within_rel_tol(cols, a, cols, [("x", 1.0)], 1e-5)
    # column order may differ; names align the cells
    assert _within_rel_tol(
        cols, a, ["v", "k"], [(1.0, "x"), (-2.0, "y")], 1e-5
    )
    # near-zero cells use the absolute floor, not pure relative
    assert _within_rel_tol(["v"], [(1e-9,)], ["v"], [(0.0,)], 1e-5)
