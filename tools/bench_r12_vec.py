"""Round-12 probes for the two heaviest audited-untouched operators
(r11 VERDICT item 5): `embedding_maha_outliers` and
`neardup_link_prediction`.

1. **maha**: A/B the shipped two-scan shape (posexplode → per-dim
   stats broadcast → second posexplode scoring pass) against a
   one-scan variant that materializes the exploded (vec_id, dim, u)
   stream behind a lazy localCheckpoint so stats and scoring share
   one corpus read. The r11 VERDICT asked for "one two-level
   aggregate, NOT an interpreted HOF"; a true single-aggregate form
   does not exist for Mahalanobis (per-dim weights multiply
   per-(vec,dim) values — the second pass is algebraically required),
   so the one-scan candidate is the checkpoint barrier, measured
   honestly. Equality of results is asserted before timing.
2. **link_pred**: the wedge-join volume audit the VERDICT asked for —
   |edges|, max/mean degree, Σ deg(b)² (the wedge join's exact
   candidate count), grouped-wedge rows, output rows — at 1× and on
   the decorrelated corpus replicas (tools/bench_scaleup.py build),
   plus interleaved timing of the shipped shape.

Usage::

    python tools/bench_r12_vec.py [base_sf_dir] [corpus_factor ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from bench_scaleup import build_scaled  # noqa: E402

from tableau_dashboard_performance_etl_automation_spark.catalog import (  # noqa: E402
    load_table,
)
from tableau_dashboard_performance_etl_automation_spark.operators import (  # noqa: E402
    clustering,
    similarity,
)
from tableau_dashboard_performance_etl_automation_spark.session import (  # noqa: E402
    get_spark,
)


def maha_one_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan variant: lazy localCheckpoint of the exploded
    micro-unit stream; stats and scoring both read the checkpoint.
    Labels ride along so the final label join disappears too."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = (
        emb.select(
            "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
        )
        .select(
            "vec_id",
            "label",
            "dim",
            F.round(F.col("x").cast("double") * 1e6)
            .cast("bigint")
            .alias("u"),
        )
        .localCheckpoint(eager=False)
    )
    stats = F.broadcast(
        flat.groupBy("dim").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("u").alias("s"),
            F.sum(F.col("u") * F.col("u")).alias("s2"),
        )
    )
    mu = F.col("s") / F.col("n")
    var_u = F.col("s2") / F.col("n") - mu * mu
    term = (F.col("u") - mu) * (F.col("u") - mu) / var_u
    scored = (
        flat.join(stats, "dim")
        .filter(var_u > 0)
        .groupBy("vec_id", "label")
        .agg(F.sum(term).alias("maha_raw"))
    )
    return (
        scored.select(
            "vec_id",
            "label",
            F.round(F.col("maha_raw"), 4).alias("maha_sq"),
        )
        .orderBy(F.round(F.col("maha_raw"), 6).desc(), F.col("vec_id"))
        .limit(similarity.MAHA_TOP_N)
    )


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 16]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("tdpe-r12-vec")
    spark.sparkContext.setLogLevel("ERROR")

    # equality gate before any timing
    a = sorted(map(tuple, similarity.embedding_maha_outliers(spark, base).collect()))
    b = sorted(map(tuple, maha_one_scan(spark, base).collect()))
    assert a == b, "maha one-scan variant diverges at 1x"
    print(json.dumps({"maha_equivalence_1x": "pass"}), flush=True)

    report: dict = {}
    for factor in factors:
        sf_dir = build_scaled(spark, base, factor)
        row: dict = {}
        # ---- maha A/B, interleaved ----
        twos, ones = [], []
        for _ in range(3):
            t0 = time.time()
            _noop(similarity.embedding_maha_outliers(spark, sf_dir))
            twos.append(time.time() - t0)
            t0 = time.time()
            _noop(maha_one_scan(spark, sf_dir))
            ones.append(time.time() - t0)
        row["maha"] = {
            "two_scan_shipped": round(min(twos), 2),
            "one_scan_ckpt": round(min(ones), 2),
        }
        # ---- link_pred volume audit + timing ----
        edges = clustering.lsh_pair_table(spark, sf_dir)
        sym = edges.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionAll(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        vol = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").alias("sym_rows"),
            F.max("d").alias("max_deg"),
            F.sum(F.col("d") * F.col("d")).alias("wedge_candidates"),
        ).collect()[0]
        out_rows = clustering.neardup_link_prediction(spark, sf_dir).count()
        ts = []
        for _ in range(3):
            t0 = time.time()
            _noop(clustering.neardup_link_prediction(spark, sf_dir))
            ts.append(time.time() - t0)
        row["link_pred"] = {
            "n_nodes": vol["n_nodes"],
            "n_sym_edges": vol["sym_rows"],
            "max_deg": vol["max_deg"],
            "wedge_candidates": vol["wedge_candidates"],
            "output_rows": out_rows,
            "steady_sec": round(min(ts), 2),
        }
        report[f"{factor}x"] = row
        print(json.dumps({f"{factor}x": row}), flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
