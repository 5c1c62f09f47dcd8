"""Text-decomposition column expressions (shingles, tokens) shared by
the dedup and text-analysis operators.

All helpers are pure Column expressions (whole-stage-codegen
friendly) built so the equivalent DuckDB SQL produces *identical*
values: word splitting is a plain single-space split, hashes are
``md5`` hex strings (lexicographically comparable in both engines),
and list indices are handled per each engine's base (Spark arrays are
0-based, DuckDB lists 1-based — the oracle strings mirror that).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def words(text_col: str = "text") -> Column:
    """Whitespace word split (single-space corpus)."""
    return F.split(F.col(text_col), " ")


def word_shingles(words_col: str = "w", k: int = 3) -> Column:
    """``k``-word shingles as space-joined strings; empty array for
    docs shorter than ``k`` words (guards Spark's descending
    ``sequence`` when ``size-k < 0``)."""
    joined = " || ' ' || ".join(f"{words_col}[i + {j}]" for j in range(k))
    return F.expr(
        f"CASE WHEN size({words_col}) >= {k} THEN "
        f"transform(sequence(0, size({words_col}) - {k}), "
        f"i -> {joined}) ELSE array() END"
    )


def shingles_sql_duckdb(k: int = 3, words_expr: str = "w") -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing)."""
    joined = " || ' ' || ".join(f"{words_expr}[i + {j}]" for j in range(k))
    return (
        f"list_transform(range(1, len({words_expr}) - {k - 2}), "
        f"i -> {joined})"
    )


def seeded_md5(seed: int, col: Column) -> Column:
    """Family of independent hash functions from one md5: prefix the
    input with the seed. Identical in DuckDB: ``md5('<seed>|' || x)``."""
    return F.md5(F.concat(F.lit(f"{seed}|"), col))
