"""md5-hex-digit integer extraction — the shared deterministic-hash
primitive behind content-addressed shard packing, count-min-sketch
buckets, and Poisson-sampling uniforms.

One implementation per engine side, used everywhere: the Spark column
expression and the DuckDB SQL string compute the identical CASE
arithmetic (hex digits of ``md5`` are '0'-'9'/'a'-'f'; ascii codes of
those ranges are neither contiguous nor uniform under a modulus, so
each digit is parsed explicitly). Oracle parity depends on the two
sides staying bit-identical — which is exactly why this lives in one
place instead of per-operator copies.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _digit(c: Column) -> Column:
    return F.when(c <= "9", F.ascii(c) - 48).otherwise(F.ascii(c) - 87)


def md5_hex_int(h: Column, start: int, n_digits: int) -> Column:
    """Integer value of md5-hex digits ``[start, start + n_digits)``
    (1-based, base 16): n_digits=2 → 0..255, n_digits=4 → 0..65535."""
    out = _digit(F.substring(h, start, 1))
    for i in range(1, n_digits):
        out = out * 16 + _digit(F.substring(h, start + i, 1))
    return out


def md5_hex_int_sql(h_expr: str, start: int, n_digits: int) -> str:
    """DuckDB twin of :func:`md5_hex_int` over the SQL md5 expression."""

    def digit(i: int) -> str:
        c = f"substr({h_expr}, {i}, 1)"
        return (
            f"(CASE WHEN {c} <= '9' THEN ascii({c}) - 48"
            f" ELSE ascii({c}) - 87 END)"
        )

    out = digit(start)
    for i in range(1, n_digits):
        out = f"({out} * 16 + {digit(start + i)})"
    return out


def md5_hex_bigint(h: Column, start: int, n_digits: int) -> Column:
    """BIGINT-accumulating twin of :func:`md5_hex_int` for folds wider
    than 7 hex digits — the int32 variant wraps at 2³¹ (8 digits can
    reach 2³²−1) and Spark's non-ANSI integer arithmetic wraps
    silently instead of erroring, so wide folds MUST accumulate in
    64-bit from the first digit."""
    out = _digit(F.substring(h, start, 1)).cast("bigint")
    for i in range(1, n_digits):
        out = out * 16 + _digit(F.substring(h, start + i, 1))
    return out


def md5_hex_bigint_sql(h_expr: str, start: int, n_digits: int) -> str:
    """DuckDB twin of :func:`md5_hex_bigint` — the first digit is cast
    to BIGINT so wide folds accumulate in 64-bit (DuckDB would
    otherwise fold in INT32 and error/overflow past 7 digits)."""

    def digit(i: int) -> str:
        c = f"substr({h_expr}, {i}, 1)"
        return (
            f"(CASE WHEN {c} <= '9' THEN ascii({c}) - 48"
            f" ELSE ascii({c}) - 87 END)"
        )

    out = f"CAST({digit(start)} AS BIGINT)"
    for i in range(1, n_digits):
        out = f"({out} * 16 + {digit(start + i)})"
    return out
