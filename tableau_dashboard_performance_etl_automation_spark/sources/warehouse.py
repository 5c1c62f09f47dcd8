"""Warehouse-layout writers: date-partitioned and bucketed tables.

These are the layouts the 100 TB deployment depends on (PERF.md):

- **partition by date** → the daily-window queries (today / 3-day
  lookback) become partition-pruned scans instead of full scans;
- **bucket by join key** → repeated co-located joins (baseline vs
  current, IVF cluster lookups) skip their shuffle entirely — the
  exchange happens once at write time, then never again.

Both are thin, explicit wrappers so operators/tests can build and
verify the layouts rather than assert them rhetorically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
) -> None:
    """Write parquet partitioned by the date of ``ts_col``. Readers
    filtering on ``partition_col`` get partition pruning (directory
    elimination) — the scan never opens out-of-window files."""
    (
        df.withColumn(partition_col, F.col(ts_col).cast("date"))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
) -> None:
    """Persist as a bucketed managed table: rows are hash-distributed
    into ``n_buckets`` files by ``bucket_col`` at write time, so joins
    and aggregations on that column read co-located data with no
    exchange."""
    spark = df.sparkSession
    # idempotent: a stale location with no metastore entry (fresh
    # metastore, leftover directory) would fail LOCATION_ALREADY_EXISTS
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse_dir = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse_dir.startswith("file:"):
        warehouse_dir = warehouse_dir[len("file:") :]
    if warehouse_dir:
        import shutil

        shutil.rmtree(f"{warehouse_dir}/{table_name}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
