"""Part-table scale-up probe for the record-linkage operators.

The corpus tool scales documents/embeddings and the fact tool scales
orders/lineitem/events — neither grows ``part``, the record table the
linkage family (blocking, sorted-neighborhood, Fellegi-Sunter)
compares against itself.  Linkage cost is bounded by BLOCK volume
(Σ per-block-pair counts), not table rows — this probe materializes
replicated ``part`` tables and measures whether wall time tracks that
bound as the table grows.

Replication shifts ``p_partkey`` by r × (max key + 1) and tags every
replica's ``p_name`` with a replica token (same decorrelation idea as
bench_scaleup's documents): name-token blocking keys then stay
replica-local, so block COUNT grows ~linearly with the factor while
per-block depth stays fixed — the realistic growth direction for a
catalog (new products, not deeper name collisions).  All other tables
symlink to the base corpus.

Usage::

    python tools/bench_partscale.py [base_sf_dir] [factor ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tableau_dashboard_performance_etl_automation_spark.catalog import TABLES, load_table  # noqa: E402
from tableau_dashboard_performance_etl_automation_spark.session import get_spark  # noqa: E402

SCALE_ROOT = "/tmp/tdpe-partscale"
FACTORS = [1, 4, 16, 64]

PROBES = [
    "part_fs_linkage",
    "part_record_linkage",
    "part_sorted_neighborhood",
    # round-6 flagship: FS matches -> CC -> survivorship; the match
    # labels persist per corpus, so min-of-2 reports the warm read
    "part_golden_records",
]


def build_scaled(spark, base_dir: str, factor: int) -> str:
    base_dir = os.path.abspath(base_dir)
    out = f"{SCALE_ROOT}/{factor}x"
    if factor == 1:
        return base_dir
    base_rows = load_table(spark, base_dir, "part").count()
    meta_path = f"{out}/meta.json"
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == {
                    "base_part_rows": base_rows,
                    "factor": factor,
                }:
                    return out
        except (OSError, ValueError):
            pass
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        if name == "part":
            continue
        os.symlink(f"{base_dir}/{name}.parquet", f"{out}/{name}.parquet")
    part = load_table(spark, base_dir, "part")
    shift = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    reps = [
        part.withColumn("p_partkey", F.col("p_partkey") + F.lit(r * shift))
        .withColumn(
            "p_name",
            F.when(
                F.lit(r) == 0, F.col("p_name")
            ).otherwise(F.concat(F.lit(f"r{r} "), F.col("p_name"))),
        )
        for r in range(factor)
    ]
    scaled = reps[0]
    for p in reps[1:]:
        scaled = scaled.unionByName(p)
    scaled.write.mode("overwrite").parquet(f"{out}/part.parquet")
    with open(meta_path, "w") as fh:
        json.dump({"base_part_rows": base_rows, "factor": factor}, fh)
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or FACTORS
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("tdpe-partscale")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    probes = [p for p in PROBES if p in queries]
    report: dict = {"base": base, "scales": {}}
    for factor in factors:
        sf_dir = build_scaled(spark, base, factor)
        row: dict = {
            "part_rows": load_table(spark, sf_dir, "part").count()
        }
        for name in probes:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = queries[name](spark, sf_dir).count()
                best = min(best, time.time() - t0)
            row[name] = round(best, 2)
            row[f"{name}_rows"] = n
        report["scales"][f"{factor}x"] = row
        print(json.dumps({f"{factor}x": row}), flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
