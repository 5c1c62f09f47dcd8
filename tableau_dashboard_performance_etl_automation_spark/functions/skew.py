"""Skew-mitigation helpers: key salting for hot-key joins/aggregates.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case AQE
can't fix — a single key so hot that even a split partition's *build*
side overwhelms one task (e.g. 40% of events carrying one
event_type at 100 TB).

Pattern: fan the hot side out over ``n_salts`` sub-keys, replicate the
small side across every sub-key, join on (key, salt), then drop the
salt. Aggregations salt → partial-agg → final-agg on the bare key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted(df: DataFrame, key: str, n_salts: int = 16,
           salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt that varies PER ROW (not rand():
    deterministic plans replay identically on retry/resume, which
    matters for fault tolerance at scale).

    The salt hashes ``monotonically_increasing_id()`` — row-unique by
    construction — rather than the row's columns: hashing columns
    collapses to ONE salt per key when the projection carries only the
    key (every row of a hot key landing in the same sub-partition is
    exactly the skew this exists to prevent)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def replicated(df: DataFrame, n_salts: int = 16,
               salt_col: str = "_salt") -> DataFrame:
    """Explode the small side once per salt value so every salted
    partition finds its match."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: shuffle spreads each key
    over ``n_salts`` partitions instead of one."""
    salt_col = "_salt"
    b = salted(big, key, n_salts, salt_col)
    s = replicated(small, n_salts, salt_col)
    return b.join(s, [key, salt_col]).drop(salt_col)


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase count for hot grouping keys: partial count on
    (key, salt), final sum on key — the map-side-combine pattern made
    explicit when a single final-agg partition would be the straggler."""
    salt_col = "_salt"
    partial = (
        salted(df, key, n_salts, salt_col)
        .groupBy(key, salt_col)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
