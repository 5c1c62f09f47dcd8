"""Central registry for session memos (per-(applicationId, sf_dir)
caches of derived artifacts: shingle tables, LSH band signatures,
IVF/PQ codebooks, CC labels, pagerank vectors, ...).

IMMUTABLE-INPUT ASSUMPTION — every registered memo assumes the data
under its ``sf_dir`` does not change within one Spark application.
If files under a memoized ``sf_dir`` are appended or rewritten
mid-session, every consumer of that memo silently serves results
computed from the OLD data.  Writers that mutate inputs in-session
must call :func:`invalidate_session_memos` (the clear-on-write
discipline the incremental-dedup batch path uses for its persisted
band index).

A second failure mode exists only in cluster mode: memos holding
``localCheckpoint``-ed DataFrames lose blocks if an executor dies,
and subsequent reads FAIL (loudly) rather than silently rebuild —
call :func:`invalidate_session_memos` and re-run the query to
recover.  On ``local[*]`` (this repo's test target) executor loss
cannot happen.  Since round 5 the CORPUS-SIZED memos (shingles,
band signatures, CC labels, IVF postings, PQ codes) hold disk-backed
parquet scans via ``warehouse.persisted_table`` instead — immune to
block loss and free of executor heap; only small or
lineage-truncation checkpoints remain.
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def register(cache: dict) -> dict:
    """Register a memo dict so a global invalidation can clear it.
    Returns the dict unchanged so call sites stay one-liners."""
    _REGISTRY.append(cache)
    return cache


def invalidate_session_memos() -> int:
    """Clear every registered session memo AND revoke the on-disk
    artifact stamps this process has touched; returns how many dicts
    were cleared.  Call after mutating data under a memoized sf_dir
    (or after an executor loss invalidated checkpoint blocks).

    The artifact revocation matters: disk-backed corpus artifacts are
    tagged by input PATH, which cannot see an in-place mutation — so
    clearing the dict memos alone would immediately re-trust stale
    parquet.  Deleting the meta stamps forces the next consumer to
    rebuild from the mutated inputs."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        invalidate_artifacts,
    )

    for cache in _REGISTRY:
        cache.clear()
    invalidate_artifacts()
    return len(_REGISTRY)
