"""Table catalog over the driver's parquet testdata.

Mirrors the reference's fixed externally-declared schema model
(SURVEY.md §1.2: tables pre-exist in Vertica, the script never issues
DDL): schemas here are known up front, loaders normalize physical
quirks (nanosecond timestamps) into clean logical types once, at scan
time, so every downstream operator sees a stable relational catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: All tables the driver materializes per scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: SQL confs the engine's semantics depend on. All three are
#: runtime-settable, so they also take effect on sessions we did not
#: build (e.g. the driver's own smoke-check session).
_REQUIRED_SQL_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
    # otherwise rejects outright; read as BIGINT nanos + convert below.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # tz-naive parquet TIMESTAMP(MICROS) must surface as TIMESTAMP
    # (session-UTC), not TIMESTAMP_NTZ: the engine's epoch functions
    # (unix_millis / unix_timestamp) reject NTZ, and the DuckDB oracle
    # treats the same bytes as plain TIMESTAMP in a UTC session.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Vertica-lax casts guarded by rlike filters (SURVEY.md §1.3).
    "spark.sql.ansi.enabled": "false",
    # Deterministic date/timestamp semantics matching the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_engine_confs(spark: SparkSession) -> None:
    for key, val in _REQUIRED_SQL_CONFS.items():
        if spark.conf.get(key, None) != val:
            spark.conf.set(key, val)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing physical storage quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader only surfaces as BIGINT nanos (via
    ``spark.sql.legacy.parquet.nanosAsLong``); convert to a proper
    timestamp (microsecond precision, same truncation DuckDB applies).
    The conversion is a cheap projection — it does not break column
    pruning or predicate pushdown on the other columns.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        # integer division: `ts / 1000` in double loses precision at
        # 1.7e18 nanos (double ulp ≈ 256 ns → off-by-1 µs vs DuckDB's
        # exact integer ns→µs truncation)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
