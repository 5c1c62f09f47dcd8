"""Column profiling — the data-quality census every warehouse runs
before trusting a table (null rates, cardinalities, ranges).

Scale shape: one single-row aggregate PER COLUMN, unioned — not a
melt. Each branch's scan is column-pruned to exactly one column, so
the total I/O is one pass over the columnar table while the branches
parallelize independently; there is no (col_name, value) explode
shuffling n_rows × n_cols rows (the naive melt), and every aggregate
is map-side combinable. Cross-engine discipline: numeric ranges are
ROUND(...,4) doubles, temporal ranges are explicitly formatted
strings, string ranges are raw min/max — never an engine-default
numeric→string cast (Spark and DuckDB disagree on scientific
notation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table

#: (column, kind) profile plan for the orders table; kind picks which
#: range slots a column fills (num / str / ts).
ORDERS_PROFILE = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders``: row/null/distinct counts and
    typed min/max ranges."""
    orders = load_table(spark, sf_dir, "orders")
    branches = []
    for col, kind in ORDERS_PROFILE:
        c = F.col(col)
        if kind == "num":
            lo = F.round(F.min(c).cast("double"), 4)
            hi = F.round(F.max(c).cast("double"), 4)
            slo = F.lit(None).cast("string")
            shi = F.lit(None).cast("string")
        elif kind == "ts":
            lo = F.lit(None).cast("double")
            hi = F.lit(None).cast("double")
            slo = F.date_format(F.min(c), _TS_FMT_SPARK)
            shi = F.date_format(F.max(c), _TS_FMT_SPARK)
        else:
            lo = F.lit(None).cast("double")
            hi = F.lit(None).cast("double")
            slo = F.min(c)
            shi = F.max(c)
        branches.append(
            orders.select(col).agg(
                F.lit(col).alias("col_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(c.isNull().cast("bigint"))
                .cast("bigint")
                .alias("n_nulls"),
                F.countDistinct(c).cast("bigint").alias("n_distinct"),
                lo.alias("min_num"),
                hi.alias("max_num"),
                slo.alias("min_str"),
                shi.alias("max_str"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("col_name")


QUERIES = {"profile_orders": profile_orders}


def _profile_oracle() -> str:
    parts = []
    for col, kind in ORDERS_PROFILE:
        if kind == "num":
            lo = f"ROUND(CAST(MIN({col}) AS DOUBLE), 4)"
            hi = f"ROUND(CAST(MAX({col}) AS DOUBLE), 4)"
            slo = "CAST(NULL AS VARCHAR)"
            shi = "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            lo = "CAST(NULL AS DOUBLE)"
            hi = "CAST(NULL AS DOUBLE)"
            slo = f"strftime(MIN({col}), '{_TS_FMT_DUCK}')"
            shi = f"strftime(MAX({col}), '{_TS_FMT_DUCK}')"
        else:
            lo = "CAST(NULL AS DOUBLE)"
            hi = "CAST(NULL AS DOUBLE)"
            slo = f"MIN({col})"
            shi = f"MAX({col})"
        parts.append(
            f"""SELECT '{col}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   {lo} AS min_num, {hi} AS max_num,
                   {slo} AS min_str, {shi} AS max_str
            FROM orders"""
        )
    union = " UNION ALL ".join(parts)
    return f"SELECT * FROM ({union}) t ORDER BY col_name"


ORACLE_SQL = {"profile_orders": _profile_oracle()}
