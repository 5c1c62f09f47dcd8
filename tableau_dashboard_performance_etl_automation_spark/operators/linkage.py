"""Blocked fuzzy record linkage — entity resolution over dirty
catalog names, the classic warehouse dedup that content hashing
cannot do (reference analogue: the reject-path's tolerance for dirty
rows, tabjolt_email.py:33-56, generalized to fuzzy key matching).

Scale shape: the all-pairs edit-distance matrix is O(n²) and never
materialized — candidates come from an equi-join on a blocking key
(first name token), so pair production is bounded by block sizes,
exactly like the LSH band joins in dedup.py. Edit distance runs only
inside blocks, JVM-side (``levenshtein`` is a codegen'd built-in,
no Python). At 100 TB you widen to multi-key blocking (first token,
soundex, length band) and union the candidate sets; the per-block
shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table


def part_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best fuzzy match for every part name within its blocking
    bucket: block on the first name token, score candidates by
    normalized Levenshtein similarity ``1 - lev/max(len)``, keep the
    top match per part (ties broken by the smaller candidate key).

    Similarity is a ratio of exact integers (edit distance / string
    length), so cross-engine values are bit-identical and the
    ``ROW_NUMBER`` tie order is deterministic.
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ")[0].alias("blk"),
    )
    a, b = parts.alias("a"), parts.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_partkey") != F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("p_partkey"),
        F.col("b.p_partkey").alias("match_key"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev_dist"),
        F.greatest(
            F.length(F.col("a.p_name")), F.length(F.col("b.p_name"))
        ).alias("max_len"),
    )
    scored = cand.withColumn(
        "sim",
        F.round(1.0 - F.col("lev_dist") / F.col("max_len"), 4),
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("sim").desc(), F.col("match_key").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "match_key", "lev_dist", "sim")
        .orderBy("p_partkey")
    )


QUERIES = {"part_record_linkage": part_record_linkage}

ORACLE_SQL = {
    "part_record_linkage": """
        WITH p AS (
            SELECT p_partkey, p_name,
                   split_part(p_name, ' ', 1) AS blk
            FROM part
        ),
        cand AS (
            SELECT a.p_partkey,
                   b.p_partkey AS match_key,
                   levenshtein(a.p_name, b.p_name) AS lev_dist,
                   GREATEST(length(a.p_name), length(b.p_name)) AS max_len
            FROM p a JOIN p b
              ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
        ),
        scored AS (
            SELECT p_partkey, match_key, lev_dist,
                   ROUND(1.0 - lev_dist * 1.0 / max_len, 4) AS sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_partkey
                       ORDER BY ROUND(1.0 - lev_dist * 1.0 / max_len, 4)
                                DESC,
                                match_key ASC
                   ) AS rn
            FROM cand
        )
        SELECT p_partkey, match_key,
               CAST(lev_dist AS INTEGER) AS lev_dist, sim
        FROM scored
        WHERE rn = 1
        ORDER BY p_partkey
    """,
}
