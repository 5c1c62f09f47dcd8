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
    clustering,
    curation,
    dedup,
    multimodal,
    relational_ext,
    sampling,
    similarity,
    tabjolt,
    textops,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


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
    out.update(clustering.QUERIES)
    out.update(curation.QUERIES)
    out.update(asof.QUERIES)
    out.update(sampling.QUERIES)
    return out


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
    out.update(clustering.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out.update(asof.ORACLE_SQL)
    out.update(sampling.ORACLE_SQL)
    return out
