"""Similarity search over the ``embeddings`` table: embedding
near-dup pairs, brute-force cosine top-k (the correctness baseline),
and an IVF-pruned variant (the 100 TB scale path).

Scale design:

- the query set / centroid set are the ONLY broadcast sides; the
  corpus never shuffles for brute-force scoring (each partition scores
  its local vectors against the broadcast queries — exactly the
  distributed brute-force layout on a 1000-executor cluster);
- IVF assigns every vector to its nearest centroid (one broadcast
  join), then searches only the query's cluster: a K-way partition
  prune that cuts scored candidates by ~1/K. Assignment shuffles on
  ``cent_id`` once, which is also the layout you'd persist (bucketed
  by centroid) for repeated query workloads;
- vector math is JVM-side ``zip_with``/``aggregate`` (functions/
  vectors.py) — no Python in the hot path.

Determinism: ranking uses ``ROUND(cos, 6)`` with an id tiebreak in
both engines; reported cosines round to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.functions.vectors import (
    as_double_array,
    cosine,
    dot,
    norm,
)

#: Near-dup threshold for embedding pairs (within-label blocking).
NEARDUP_COSINE = 0.35
#: ANN parameters: fixed deterministic query/centroid sets + top-k.
N_QUERIES = 10
N_CENTROIDS = 8
TOP_K = 5

_COS_SQL = (
    "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("vec")
    )


def neardup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: label acts as the blocking key
    (a stand-in for an LSH bucket — pairs are only scored within a
    block, never across the full corpus), cosine ≥ threshold confirms.
    """
    e = _emb(spark, sf_dir)
    # Precompute each vector's norm once (O(n) folds) instead of per
    # pair (O(pairs)); the pair step is then a single dot product.
    # dot/(norm_a*norm_b) evaluates the exact same doubles as the
    # inline cosine, so the oracle comparison is unaffected.
    en = e.withColumn("nrm", norm(F.col("vec")))
    a = en.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = en.select(
        F.col("label"),
        F.col("vec_id").alias("vec_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.round(
                F.when(F.col("na") * F.col("nb") == 0, F.lit(None)).otherwise(
                    dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
                ),
                4,
            ),
        )
        .filter(F.col("cos") >= NEARDUP_COSINE)
        .select("label", "vec_a", "vec_b", F.col("cos").alias("cosine"))
        .orderBy("label", "vec_a", "vec_b")
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, score every
    corpus partition locally, rank per query. The exact baseline any
    approximate index is measured against."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos6").desc(), F.col("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos6", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos6"), 4).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _assignments(e: DataFrame, nprobe: int = 1) -> DataFrame:
    """Nearest-centroid assignment: one broadcast join against the
    centroid set + a per-vector rank window. ``nprobe=1`` gives the
    storage assignment; ``nprobe>1`` keeps the n best centroids (used
    on the *query* side to widen the search at higher recall)."""
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    return (
        e.crossJoin(F.broadcast(cent))
        .withColumn("ccos", F.round(cosine(F.col("vec"), F.col("cvec")), 6))
        .withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= nprobe)
        .select("vec_id", "cent_id", "vec")
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """IVF-pruned top-k: search the query's ``nprobe`` best centroid
    clusters. Trades recall for a ~nprobe/K candidate cut — the scale
    path when the corpus is billions of vectors."""
    e = _emb(spark, sf_dir)
    assign = _assignments(e)
    q = _assignments(e, nprobe=nprobe).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cent_id"),
        F.col("vec").alias("qvec"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos6").desc(), F.col("neighbor_id")
    )
    return (
        assign.select(
            "cent_id", F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec")
        )
        .join(F.broadcast(q), "cent_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos6", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos6"), 4).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "neardup_embedding_cosine": neardup_embedding_cosine,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
}

_cos_ab = _COS_SQL.format(a="a.embedding", b="b.embedding")
_cos_qc = _COS_SQL.format(a="q.embedding", b="c.embedding")
_cos_vc = _COS_SQL.format(a="v.embedding", b="cent.embedding")

ORACLE_SQL = {
    "neardup_embedding_cosine": f"""
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND({_cos_ab}, 4) AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND({_cos_ab}, 4) >= {NEARDUP_COSINE}
        ORDER BY a.label, vec_a, vec_b
    """,
    "ann_cosine_topk": f"""
        SELECT query_id, neighbor_id, ROUND(cos6, 4) AS cosine, rank
        FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_cos_qc}, 6) AS cos6,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({_cos_qc}, 6) DESC, c.vec_id
                   ) AS rank
            FROM embeddings q
            JOIN embeddings c ON c.vec_id != q.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    "ann_ivf_topk": f"""
        WITH assign AS (
            SELECT vec_id, cent_id, embedding FROM (
                SELECT v.vec_id, cent.vec_id AS cent_id, v.embedding,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY ROUND({_cos_vc}, 6) DESC, cent.vec_id
                       ) AS crn
                FROM embeddings v
                JOIN embeddings cent ON cent.vec_id < {N_CENTROIDS}
            )
            WHERE crn = 1
        )
        SELECT query_id, neighbor_id, ROUND(cos6, 4) AS cosine, rank
        FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_COS_SQL.format(a="q.embedding", b="c.embedding")}, 6)
                       AS cos6,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(
                           {_COS_SQL.format(a="q.embedding", b="c.embedding")}, 6
                       ) DESC, c.vec_id
                   ) AS rank
            FROM assign q
            JOIN assign c ON c.cent_id = q.cent_id
                         AND c.vec_id != q.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
}
