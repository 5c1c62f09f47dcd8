"""Columnar-format breadth: ORC read/write alongside parquet, with
the same pushdown/pruning contract.

A migrating user's lake is rarely one format; Spark's built-in ORC
reader gives the engine a second columnar source with predicate
pushdown and column pruning for free. (Avro needs the external
spark-avro package — not available in this container, so it is
deliberately absent rather than stubbed.) CSV/JSONL ingestion with
reject capture lives in ``delimited.py`` / ``jsonl.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str) -> None:
    """Write an ORC copy of a DataFrame (snappy, Spark default)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table; filters and projections push into the ORC
    reader exactly as with parquet (asserted in tests)."""
    return spark.read.orc(path)
