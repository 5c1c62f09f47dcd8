"""Spark-SQL dialect-compat sweep over the DuckDB oracle strings.

Every registered query carries an ANSI-SQL oracle written for DuckDB.
This tool feeds each oracle string to ``spark.sql(...)`` with the ten
test tables registered as temp views, and buckets the outcome:

- ``match``      — parses, runs, and the result equals the DataFrame
                   query's own output (exact multiset after the same
                   column-name sort the driver gate uses);
- ``mismatch``   — runs on Spark but differs (a real dialect
                   semantics divergence — worth reading);
- ``error``      — Spark rejects the string (DuckDB-only syntax:
                   ``ANTI JOIN``, ``MATERIALIZED`` CTE hints,
                   recursive-CTE forms, list comprehensions, …).

The point is evidence that the engine's *SQL entry path* (not just
the DataFrame API) answers the same questions: a user who speaks SQL
can run the portable subset verbatim. Usage:

    python tools/sql_compat.py [sf_dir] [name ...]

Writes COMPAT.md at the repo root with the bucket counts and the
error-category histogram.
"""

from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_INTEGRAL_DTYPES = {"tinyint", "smallint", "int", "bigint"}

#: Root-caused dialect divergences (diagnosed by running the oracle
#: text in both engines and diffing rows). These queries' DataFrame
#: implementations DO hash-match their DuckDB oracles — the driver's
#: actual gate — the divergence below appears only when the oracle
#: TEXT is executed by Spark's SQL frontend.
#: name → (note, rel_tol). rel_tol is the DIAGNOSED numeric scale of
#: the divergence: when set, the sweep re-compares the two results
#: cell-wise (rows in each side's own collected ORDER BY order) and
#: only accepts the "known" explanation if every float agrees within
#: that relative tolerance — so a future change that makes the
#: SQL-text path diverge GROSSLY under the same query name is
#: re-flagged as unexplained instead of riding an old diagnosis
#: (round-10 ADVICE). rel_tol=None marks structural divergences
#: (label numbering) where no numeric closeness claim applies.
_KNOWN_DIVERGENCES = {
    "order_seasonality": (
        "EXTRACT(dow): DuckDB numbers Sunday=0..Saturday=6, Spark's "
        "DOW field is dayofweek's Sunday=1..Saturday=7 — same row "
        "partition, labels shifted by one",
        None,
    ),
    "dow_seasonal_decomposition": (
        "EXTRACT(dow): DuckDB Sunday=0..6 vs Spark Sunday=1..7 "
        "(same divergence as order_seasonality)",
        None,
    ),
    "event_hour_mi_terms": (
        "one-ULP libm-vs-JVM Math.log difference in the MI log term "
        "flips the 6th rounded decimal on a handful of rows (e.g. "
        "-0.115353 vs -0.115354); values agree to ~1e-6 relative",
        1e-5,
    ),
    "decayed_event_scores": (
        "double summation order: SUM(cents/100.0 * pow(0.5, age/7)) "
        "accumulates in a different partition order under the SQL-text "
        "plan than the DataFrame plan; pre-ROUND sums agree to ~3e-8 "
        "relative but ROUND(,4) exposes the 4th decimal (e.g. "
        "34417.6317 vs 34417.6328)",
        1e-6,
    ),
}


def _within_rel_tol(cols_a, rows_a, cols_b, rows_b, rel_tol) -> bool:
    """Cell-wise closeness check for a known numeric divergence: both
    queries end in a deterministic ORDER BY, so rows align by
    collected position; floats must agree within rel_tol (plus a
    matching absolute floor for near-zero cells), everything else
    exactly. Any shape mismatch fails closed."""
    if len(rows_a) != len(rows_b) or sorted(cols_a) != sorted(cols_b):
        return False
    ia = {c: i for i, c in enumerate(cols_a)}
    ib = {c: i for i, c in enumerate(cols_b)}
    for ra, rb in zip(rows_a, rows_b):
        for c in cols_a:
            va, vb = ra[ia[c]], rb[ib[c]]
            fa = isinstance(va, (int, float)) and not isinstance(va, bool)
            fb = isinstance(vb, (int, float)) and not isinstance(vb, bool)
            if fa and fb:
                if abs(float(va) - float(vb)) > rel_tol * max(
                    1.0, abs(float(va)), abs(float(vb))
                ):
                    return False
            elif va != vb:
                return False
    return True


def _int_exact_cols(a_df, b_df) -> set:
    """Column names whose Spark dtype is integral on BOTH sides —
    those compare exactly (round-6 ADVICE item: blanket int→float
    coercion made >1e9 checksums compare lossily at 9 significant
    digits, hiding genuine low-digit divergences). Coercion to float
    remains only where the two sides genuinely disagree on type
    (int vs float/Decimal — the dialect split the coercion exists
    to normalize)."""
    da, db = dict(a_df.dtypes), dict(b_df.dtypes)
    return {
        c
        for c in da
        if da.get(c) in _INTEGRAL_DTYPES and db.get(c) in _INTEGRAL_DTYPES
    }


def _norm_rows(cols, rows, int_exact=frozenset()):
    from decimal import Decimal

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if (
                cols[i] in int_exact
                and isinstance(v, int)
                and not isinstance(v, bool)
            ):
                # both sides integral: exact BIGINT compare, no
                # significant-digit bucketing
                vals.append(repr(v))
                continue
            # Spark-SQL execution of the oracle strings can return
            # DecimalType for ROUND/literal arithmetic where the
            # DataFrame side returns double — coerce Decimal (and the
            # int-vs-float repr split) to float BEFORE the 9-sig-digit
            # normalization so numerically-equal results don't land in
            # the dialect-divergence list (round-5 ADVICE item)
            if isinstance(v, Decimal) or (
                isinstance(v, int) and not isinstance(v, bool)
            ):
                v = float(v)
            if isinstance(v, float):
                # same tolerance discipline as the driver gate: floats
                # compare at 9 significant digits
                v = float(f"{v:.9g}")
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def _err_category(msg: str) -> str:
    m = next((l for l in msg.splitlines() if l.strip()), "unknown")
    for pat, cat in [
        (r"ANTI JOIN|SEMI JOIN", "duckdb-anti/semi-join-syntax"),
        (r"MATERIALIZED", "materialized-cte-hint"),
        (r"RECURSIVE|recursion", "recursive-cte"),
        (r"UNNEST|unnest", "unnest-form"),
        (r"PARSE_SYNTAX_ERROR", "parse-error-other"),
        (r"UNRESOLVED_ROUTINE|Undefined function|cannot resolve", "function-missing"),
        (r"DATATYPE_MISMATCH|CAST_INVALID", "type-rules"),
    ]:
        if re.search(pat, msg, re.IGNORECASE):
            return cat
    return "other: " + m[:80]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from tableau_dashboard_performance_etl_automation_spark.catalog import register_views
    from tableau_dashboard_performance_etl_automation_spark.session import get_spark

    spark = get_spark("tdpe-sql-compat")
    spark.sparkContext.setLogLevel("ERROR")
    # the engine's own SQL entry path: normalized views (engine confs,
    # nanosecond-timestamp conversion) — the same catalog every
    # DataFrame operator reads through
    register_views(spark, sf_dir)

    queries = entry.queries()
    oracles = entry.oracle_sql()
    buckets: dict[str, list[str]] = {"match": [], "mismatch": [], "error": []}
    regrown: list[str] = []  # known-divergent names exceeding their tol
    err_hist: Counter = Counter()
    err_detail: dict[str, tuple] = {}
    t0 = time.time()
    names = [n for n in queries if n in oracles and (not only or n in only)]
    for i, name in enumerate(names):
        sql = oracles[name]
        try:
            odf = spark.sql(sql)
            ocols = odf.columns
            orows = odf.collect()
        except Exception as exc:  # noqa: BLE001 — bucketing all engine rejections
            buckets["error"].append(name)
            cat = _err_category(str(exc))
            err_hist[cat] += 1
            first = next(
                (l for l in str(exc).splitlines() if l.strip()), "unknown"
            )
            err_detail[name] = (cat, first[:200])
            continue
        sdf = queries[name](spark, sf_dir)
        int_exact = _int_exact_cols(sdf, odf)
        srows = sdf.collect()
        same = sorted(sdf.columns) == sorted(ocols) and _norm_rows(
            sdf.columns, srows, int_exact
        ) == _norm_rows(ocols, orows, int_exact)
        buckets["match" if same else "mismatch"].append(name)
        if not same:
            # known numeric divergences carry their diagnosed scale:
            # re-verify the mismatch is still WITHIN it, else strip
            # the "known" status so the sweep re-flags a regrowth
            note_tol = _KNOWN_DIVERGENCES.get(name)
            if note_tol and note_tol[1] is not None and not _within_rel_tol(
                sdf.columns, srows, ocols, orows, note_tol[1]
            ):
                regrown.append(name)
                print(f"MISMATCH {name} (EXCEEDS diagnosed tol {note_tol[1]})")
            else:
                print(f"MISMATCH {name}")
        if (i + 1) % 25 == 0:
            print(
                f"[{i+1}/{len(names)}] match={len(buckets['match'])} "
                f"mismatch={len(buckets['mismatch'])} "
                f"error={len(buckets['error'])} ({time.time()-t0:.0f}s)"
            )

    n = len(names)
    lines = [
        "# COMPAT — Spark-SQL portability of the oracle strings",
        "",
        f"Each registered query's DuckDB oracle SQL fed verbatim to "
        f"`spark.sql(...)` over the same parquet views ({sf_dir}), "
        f"compared (exact multiset, 9-sig-digit floats) against the "
        f"DataFrame query's own output.",
        "",
        f"| bucket | count | share |",
        f"|---|---|---|",
    ]
    for b in ("match", "mismatch", "error"):
        lines.append(f"| {b} | {len(buckets[b])} | {len(buckets[b])/max(n,1):.0%} |")
    lines += ["", "## Spark-rejection categories", ""]
    for cat, c in err_hist.most_common():
        lines.append(f"- {c} × {cat}")
    if buckets["mismatch"]:
        lines += ["", "## Mismatches (dialect semantics divergences)", ""]
        for m in buckets["mismatch"]:
            note_tol = _KNOWN_DIVERGENCES.get(m)
            if note_tol and m in regrown:
                lines.append(
                    f"- {m} — REGROWN past diagnosed tol "
                    f"{note_tol[1]:g}: old diagnosis no longer "
                    f"explains it ({note_tol[0]})"
                )
            elif note_tol:
                tol = (
                    f" (verified within {note_tol[1]:g} rel tol)"
                    if note_tol[1] is not None
                    else ""
                )
                lines.append(f"- {m} — {note_tol[0]}{tol}")
            else:
                lines.append(f"- {m}")
        unexplained = [
            m
            for m in buckets["mismatch"]
            if m not in _KNOWN_DIVERGENCES or m in regrown
        ]
        if unexplained:
            lines.append("")
            lines.append(
                f"UNEXPLAINED: {unexplained} — diagnose and add to "
                f"_KNOWN_DIVERGENCES in tools/sql_compat.py"
            )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COMPAT.md"
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # per-name rejection detail (category + first error line) beside
    # the histogram, so "is a portable spelling free here?" is
    # answerable without re-running the sweep
    import json

    # sibling path derived structurally — string-replace on the
    # report filename would silently alias detail_out to out (and
    # overwrite the markdown with JSON) if the name ever changed
    detail_out = os.path.join(os.path.dirname(out), "COMPAT_ERRORS.json")
    with open(detail_out, "w") as fh:
        json.dump(
            {k: {"category": c, "error": e} for k, (c, e) in sorted(err_detail.items())},
            fh,
            indent=1,
        )
    print(f"\n{len(buckets['match'])}/{n} portable-and-equal; wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
