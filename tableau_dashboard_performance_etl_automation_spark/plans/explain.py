"""Physical-plan inspection helpers.

The scale contract of every operator ("dimension joins broadcast",
"filters reach the parquet scan", "no accidental cartesian product")
is asserted in tests via these helpers rather than trusted from code
review — plan regressions fail CI the same way wrong results do.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian_product(df: DataFrame) -> bool:
    """True for a real cartesian product node. (A 1-row broadcast
    anchor appears as BroadcastNestedLoopJoin and is fine; an actual
    CartesianProduct over two big sides is the scale killer.)"""
    return "CartesianProduct" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes (shuffles) in the physical plan."""
    return len(re.findall(r"\bExchange\b", formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))
