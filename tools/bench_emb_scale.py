"""Embedding-corpus scale probe for the ANN paths (the 1M-vector
story): replicate the base embeddings table by a factor (cyclic
rotation per replica — norm-preserving, decorrelates projections,
same transform as tools/bench_scaleup.py), then time

  1. the IVF codebook train (Lloyd rounds on the sampled fraction),
  2. the full-corpus posting assignment (index build),
  3. the exact brute-force top-k scan (Arrow scorer).

This reproduces the PERF.md "Round 7 (continued)" measurements
(512× sf0.1 = 1.024M vectors, K=1008: codebook ~38 s, build total
~186 s, exact scan ~10 s on local[32]). Usage:

    python tools/bench_emb_scale.py [base_sf_dir] [factor]

The scaled corpus is cached under /tmp/tdpe-embscale/{factor}x; the
probe wipes this corpus' codebook/postings artifacts first so the
build is always timed cold.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table  # noqa: E402
from tableau_dashboard_performance_etl_automation_spark.operators import similarity  # noqa: E402
from tableau_dashboard_performance_etl_automation_spark.session import get_spark  # noqa: E402

SCALE_ROOT = "/tmp/tdpe-embscale"


def build_scaled(spark, base_dir: str, factor: int) -> str:
    base_dir = os.path.abspath(base_dir)
    if factor == 1:
        return base_dir
    out = f"{SCALE_ROOT}/{factor}x"
    done = f"{out}/_done"
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    emb = load_table(spark, base_dir, "embeddings")
    n_vec = emb.count()
    dim = similarity.EMB_DIM
    reps = F.broadcast(
        spark.range(factor).select(F.col("id").cast("int").alias("r"))
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r").cast("bigint") * F.lit(n_vec))
            .alias("vec_id"),
            "label",
            F.expr(
                f"concat(slice(embedding, (r % {dim}) + 1, "
                f"{dim} - (r % {dim})), "
                f"slice(embedding, 1, r % {dim}))"
            ).alias("embedding"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("tdpe-embscale")
    spark.sparkContext.setLogLevel("ERROR")
    out = build_scaled(spark, base, factor)
    # always time the build COLD for this corpus
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    corpus = os.path.basename(out.rstrip("/"))
    for art in ("ivf_codebook", "ivf_postings"):
        root = os.path.join(wh, art)
        if os.path.isdir(root):
            for kdir in os.listdir(root):
                tgt = os.path.join(root, kdir, corpus)
                shutil.rmtree(tgt, ignore_errors=True)
                shutil.rmtree(tgt + "_meta", ignore_errors=True)
    e = similarity._emb(spark, out)
    n = e.count()
    t0 = time.time()
    cent = similarity._codebook(spark, out, e)
    t1 = time.time()
    k = cent.count()
    similarity._assignments(spark, out, e, cent).write.format(
        "noop"
    ).mode("overwrite").save()
    t2 = time.time()
    similarity.ann_cosine_topk(spark, out).write.format("noop").mode(
        "overwrite"
    ).save()
    t3 = time.time()
    report = {
        "n_vectors": n,
        "k_centroids": k,
        "codebook_train_sec": round(t1 - t0, 1),
        "postings_assign_sec": round(t2 - t1, 1),
        "index_build_total_sec": round(t2 - t0, 1),
        "exact_scan_sec": round(t3 - t2, 1),
    }
    spark.stop()
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
