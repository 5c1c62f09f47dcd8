"""Source digests for driver-green staleness detection.

The driver's correctness gate checks only the first 50 entries of
``queries()``.  A query that earned a driver-green row in round N and
was then *reworked* in round N+1 used to wait behind merely-stale
greens for re-verification (VERDICT r9 finding #1: ``hybrid_rank_fusion``,
``word_bigram_kn_scores``, ``ann_lsh_ranking_quality`` were restructured
in round 9 but would not have re-entered the checked window until ~round
12).  This module gives every registered query a deterministic *source
digest*; ``GREEN_DIGESTS.json`` records the digest each query had when
it last went driver-green, and the rotation in ``__spark_entry__``
promotes any green query whose **current** digest mismatches its
recorded one back into the checked window ahead of fresh greens.

Digest scope (documented boundary): the registered callable's source,
every *same-module* function it references (transitively, by identifier
token), every same-module non-callable constant it references (by
``repr``, excluding the registry dicts themselves), and the query's
oracle SQL string.  Cross-module helpers (e.g. ``warehouse.persisted_table``)
are deliberately outside the closure — including them would invalidate
every persisted query on any warehouse-plumbing edit and flood the
50-slot window; a cross-module rework that changes query *semantics*
shows up in the consuming module's call site or the oracle anyway.
"""

from __future__ import annotations

import hashlib
import inspect
import re
from collections.abc import Callable

_IDENT = re.compile(r"\b[A-Za-z_][A-Za-z0-9_]*\b")

# Registry dicts: referenced ubiquitously via registration lines, and
# hashing them would make every oracle edit invalidate the whole module.
_SKIP_NAMES = {"QUERIES", "ORACLE_SQL"}

_CONST_TYPES = (str, int, float, bool, bytes, tuple, list, dict, frozenset, set)


def _source_of(obj) -> str:
    try:
        return inspect.getsource(obj)
    except (OSError, TypeError):
        # No retrievable source (builtin / partial): fall back to the
        # qualname, which is stable across processes (repr is not).
        return getattr(obj, "__qualname__", type(obj).__name__)


def _closure_sources(fn: Callable) -> list[str]:
    """Sources of ``fn`` plus same-module helpers/constants it references,
    transitively, in a deterministic order."""
    mod = inspect.getmodule(fn)
    mod_name = getattr(mod, "__name__", None)
    seen_fns: dict[str, str] = {}
    seen_consts: dict[str, str] = {}
    stack = [fn]
    root_qualname = getattr(fn, "__qualname__", "<fn>")
    seen_fns[root_qualname] = _source_of(fn)
    while stack:
        src = _source_of(stack.pop())
        for tok in set(_IDENT.findall(src)):
            if tok in _SKIP_NAMES or mod is None:
                continue
            obj = getattr(mod, tok, None)
            if obj is None:
                continue
            if inspect.isfunction(obj) and obj.__module__ == mod_name:
                qn = obj.__qualname__
                if qn not in seen_fns:
                    seen_fns[qn] = _source_of(obj)
                    stack.append(obj)
            elif isinstance(obj, _CONST_TYPES) and not isinstance(obj, type):
                if tok not in seen_consts:
                    if isinstance(obj, (set, frozenset)):
                        seen_consts[tok] = repr(sorted(obj, key=repr))
                    else:
                        seen_consts[tok] = repr(obj)
    parts = [seen_fns.pop(root_qualname)]
    parts.extend(src for _, src in sorted(seen_fns.items()))
    parts.extend(f"{k}={v}" for k, v in sorted(seen_consts.items()))
    return parts


def query_digest(name: str, fn: Callable, sql: str | None) -> str:
    """Deterministic sha256 over the query's source closure + oracle."""
    h = hashlib.sha256()
    h.update(name.encode())
    for part in _closure_sources(fn):
        h.update(b"\x00")
        h.update(part.encode())
    h.update(b"\x00oracle\x00")
    h.update((sql or "<no-oracle>").encode())
    return "sha256:" + h.hexdigest()


def registry_digests(
    queries: dict[str, Callable], oracles: dict[str, str]
) -> dict[str, str]:
    return {
        name: query_digest(name, fn, oracles.get(name))
        for name, fn in queries.items()
    }
