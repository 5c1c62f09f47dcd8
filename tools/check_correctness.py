"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` and its
``oracle_sql()`` twin on the same parquet tables, then compares
row count + column names + an order-insensitive value multiset
(floats rounded to 9 significant digits before hashing, stricter than
the queries' own rounding). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def row_multiset(cols: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive fingerprint: sort columns by name, render
    each row, sort rows (mirrors the driver's compare contract)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from tableau_dashboard_performance_etl_automation_spark.session import get_spark

    spark = get_spark("check-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only check, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sm, om = row_multiset(scols, srows), row_multiset(ocols, orows)
            if sm != om:
                diffs = [
                    (a, b) for a, b in zip(sm, om) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
