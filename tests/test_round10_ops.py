"""Round-10 contracts: the four portable-SQL spellings that the
round-10 oracle conversions rely on must stay byte-identical between
DuckDB and Spark.  Each test runs the same SQL text in both engines
over the same values and compares exactly — if either engine changes
semantics (Spark upgrade, DuckDB upgrade), the pin fails here before
a converted oracle silently diverges in the driver gate.

Spellings under pin (see COMPAT.md round-10 audit):
- ``percentile_cont(p) WITHIN GROUP (ORDER BY x)`` for quantile_cont
- ``CAST(d2 - d1 AS BIGINT)`` for date_diff('day', d1, d2) on DATEs
- ``CAST(d AS STRING)`` for strftime(d, '%Y-%m-%d') on DATEs
- ``CAST(bit_length(t)/8 AS BIGINT)`` for octet_length(encode(t))
- ``split(t, ' ')`` for string_split(t, ' ') (validated, deferred)
"""

from __future__ import annotations

import duckdb
import pytest


def _both(spark, sql: str):
    srows = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    drows = con.sql(sql).fetchall()
    con.close()
    return srows, drows


def test_percentile_cont_within_group_pins_both_engines(spark):
    """Interpolated quantile over BIGINT input returns the same
    DOUBLE in both engines — including a non-midpoint p where the
    interpolation weight is fractional."""
    sql = """
        SELECT event_type,
               percentile_cont(0.50) WITHIN GROUP (ORDER BY v) AS p50,
               percentile_cont(0.90) WITHIN GROUP (ORDER BY v) AS p90
        FROM (
            SELECT CASE WHEN i % 2 = 0 THEN 'a' ELSE 'b' END AS event_type,
                   CAST(i * i AS BIGINT) AS v
            FROM (SELECT 1 i UNION ALL SELECT 2 UNION ALL SELECT 3
                  UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6
                  UNION ALL SELECT 7)
        )
        GROUP BY event_type
        ORDER BY event_type
    """
    srows, drows = _both(spark, sql)
    assert srows == [tuple(map(lambda x: float(x) if not isinstance(x, str) else x, r)) for r in drows]
    assert srows[0][1] == pytest.approx(16.0)  # median of {4,16,36} = 16


def test_date_subtraction_cast_bigint_pins_both_engines(spark):
    """DATE - DATE cast to BIGINT is day-difference in both engines,
    including negative spans."""
    sql = """
        SELECT CAST(DATE '2020-03-05' - DATE '2020-01-01' AS BIGINT) AS fwd,
               CAST(DATE '2020-01-01' - DATE '2020-03-05' AS BIGINT) AS bwd,
               CAST(DATE '2021-03-01' - DATE '2020-03-01' AS BIGINT) AS leap
    """
    srows, drows = _both(spark, sql)
    assert srows == drows == [(64, -64, 365)]


def test_date_cast_string_iso_pins_both_engines(spark):
    """CAST(DATE AS STRING) renders ISO yyyy-MM-dd in both engines —
    the strftime(d, '%Y-%m-%d') replacement — incl. single-digit
    month/day (zero padding is the divergence risk)."""
    sql = """
        SELECT CAST(DATE '2024-01-05' AS STRING) AS a,
               CAST(DATE '1999-12-31' AS STRING) AS b
    """
    srows, drows = _both(spark, sql)
    assert srows == drows == [("2024-01-05", "1999-12-31")]


def test_bit_length_utf8_bytes_pins_both_engines(spark):
    """bit_length counts UTF-8 bits in both engines, so
    CAST(bit_length(t)/8 AS BIGINT) is the byte length — checked on
    ASCII, 2-byte, 3-byte, and 4-byte code points, plus ''."""
    sql = """
        SELECT CAST(bit_length(t)/8 AS BIGINT) AS nb, length(t) AS nc
        FROM (SELECT 'abc' AS t
              UNION ALL SELECT 'héllo'
              UNION ALL SELECT '€'
              UNION ALL SELECT '\U0001f600'
              UNION ALL SELECT '')
        ORDER BY nb, nc
    """
    srows, drows = _both(spark, sql)
    assert srows == drows == [(0, 0), (3, 1), (3, 3), (4, 1), (6, 5)]


def test_split_on_space_pins_both_engines(spark):
    """split(t, ' ') — DuckDB's literal-separator alias of
    string_split vs Spark's regex split — agrees on space separators
    including leading/trailing/double spaces (empty elements kept by
    both).  This is the validated-but-deferred conversion from the
    round-10 COMPAT audit; the pin keeps it safe to land later."""
    sql = """
        SELECT split(t, ' ') AS parts
        FROM (SELECT 'a b  c' AS t UNION ALL SELECT ' x'
              UNION ALL SELECT 'y ' UNION ALL SELECT '')
        ORDER BY t
    """
    srows = [tuple(r.parts) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    drows = [tuple(r[0]) for r in con.sql(sql).fetchall()]
    con.close()
    assert srows == drows
    assert ("a", "b", "", "c") in srows
