"""Vector column expressions over ``array<float>`` embeddings.

All math is expressed with Spark's higher-order array functions
(``zip_with`` + ``aggregate``) so it runs JVM-side inside codegen —
no Python UDF in the hot path. Elements are cast to double *before*
any arithmetic so the sequential fold is bit-compatible with DuckDB's
``list_*`` double math (both promote the same float32 values and
accumulate left-to-right).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe via the engines' shared
    double-division-by-zero → NULL? No — guard explicitly: zero-norm
    vectors yield NULL (matches DuckDB list_cosine_similarity's NaN
    avoided by the same guard in the oracle SQL)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot(a, b) / denom)


def cosine_with_norms(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """:func:`cosine` with the two norms supplied as precomputed
    columns. Higher-order array functions run INTERPRETED (no
    codegen), so in a broadcast pair loop the plain helper folds
    THREE array passes per PAIR — dot(a,b), dot(a,a), dot(b,b) — of
    which two depend on only one side. Hoisting ``norm()`` into a
    projection below the join folds each side's norm once per ROW and
    leaves one array pass per pair. Bit-compatible with
    :func:`cosine`: ``na``/``nb`` must be ``norm(a)``/``norm(b)`` —
    the same expression over the same doubles yields the same double
    wherever it is evaluated, and ``na * nb`` then reproduces the
    in-line denominator exactly (the hoisted-norms discipline
    ``matryoshka_truncation_fidelity`` measured at 3× on its pair
    loop)."""
    denom = na * nb
    return F.when(denom == 0, F.lit(None)).otherwise(dot(a, b) / denom)
