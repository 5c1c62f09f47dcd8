"""Scalar expression helpers shared by the query layer.

These wrap the exact semantics the reference exercises
(SURVEY.md §2.2): digits-only regex validation before numeric casts,
epoch-millis-string → timestamp conversion, and the guarded
percentage-difference CASE. All are pure Column expressions — they
stay inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: The reference's numeric-string validation pattern
#: (tabjolt_email.py:383,385,387: ``REGEXP_LIKE(col,'^[0-9]+$')``).
DIGITS_RE = "^[0-9]+$"


def digits_only(col: Column) -> Column:
    """True iff the string column is all digits (dirty-data gate)."""
    return col.rlike(DIGITS_RE)


def epoch_ms_string(ts_col: Column) -> Column:
    """Render a timestamp as its epoch-milliseconds decimal string.

    The reference's ``performance_samples.timestamp_ms`` arrives as a
    VARCHAR of epoch millis; the driver's ``events.ts`` is a real
    timestamp, so queries that preserve the reference's
    validate-then-cast discipline derive the string form first.
    """
    return F.unix_millis(ts_col).cast("string")


def ts_from_epoch_ms_string(col: Column) -> Column:
    """``TO_TIMESTAMP(CAST(s AS BIGINT) / 1000)`` (tabjolt_email.py:383).

    Division yields a double (fractional seconds preserved), matching
    DuckDB's ``to_timestamp(BIGINT / 1000)``; Vertica's integer
    division would truncate to whole seconds — we keep the more
    precise cross-engine-consistent form.
    """
    return F.timestamp_seconds(col.cast("bigint") / 1000)


def floor_int(col: Column) -> Column:
    """Double → INTEGER with floor semantics, identical in Spark and
    DuckDB.

    A bare ``CAST(double AS INT)`` truncates toward zero in Spark but
    rounds-to-nearest in DuckDB/Vertica; ``FLOOR`` first makes the two
    engines agree (all values in this domain are non-negative).
    """
    return F.floor(col).cast("int")


def guarded_pct_diff(avg_col: Column, cur_col: Column, decimals: int = 4) -> Column:
    """``CASE WHEN avg = 0 THEN NULL ELSE (cur-avg)/avg*100.0 END``
    (tabjolt_email.py:385) — division-by-zero guard preserved, result
    rounded so float noise cannot flip the oracle value-hash.
    """
    return F.round(
        F.when(avg_col == 0, F.lit(None)).otherwise(
            (cur_col - avg_col) / avg_col * 100.0
        ),
        decimals,
    )


def dow_sunday0_sql(date_expr: str) -> str:
    """Engine-neutral day-of-week SQL (0=Sunday..6=Saturday) via
    Zeller's congruence — pure EXTRACT/FLOOR/% integer arithmetic
    that parses AND means the same thing in DuckDB and Spark SQL.

    ``EXTRACT(dow ...)`` is a dialect trap: DuckDB numbers Sunday=0,
    Spark's DAYOFWEEK field Sunday=1, so an oracle using either reads
    differently when replayed through ``spark.sql`` (COMPAT.md
    round-7 "Mismatches"). Zeller sidesteps the field-name divergence
    entirely: with q=day, m=month (Jan/Feb counted as 13/14 of the
    previous year), K=year%100, J=year//100,
    ``h = (q + ⌊13(m+1)/5⌋ + K + ⌊K/4⌋ + ⌊J/4⌋ + 5J) mod 7`` gives
    h=0 Saturday, so Sunday0 = (h+6) mod 7. All intermediates are
    small positive integers; ``FLOOR(a/b)`` and ``%`` agree across
    both engines on this domain."""
    y = f"EXTRACT(year FROM {date_expr})"
    m = f"EXTRACT(month FROM {date_expr})"
    q = f"EXTRACT(day FROM {date_expr})"
    mz = f"(CASE WHEN {m} < 3 THEN {m} + 12 ELSE {m} END)"
    yz = f"(CASE WHEN {m} < 3 THEN {y} - 1 ELSE {y} END)"
    k = f"({yz} % 100)"
    j = f"CAST(FLOOR({yz} / 100) AS BIGINT)"
    h = (
        f"({q} + CAST(FLOOR((13 * ({mz} + 1)) / 5) AS BIGINT)"
        f" + {k} + CAST(FLOOR({k} / 4) AS BIGINT)"
        f" + CAST(FLOOR({j} / 4) AS BIGINT) + 5 * {j})"
    )
    return f"CAST(({h} % 7 + 6) % 7 AS INTEGER)"
