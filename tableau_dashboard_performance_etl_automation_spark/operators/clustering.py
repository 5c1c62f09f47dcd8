"""Duplicate-cluster resolution: connected components over candidate
pairs — the pass that turns pairwise dedup output (minhash/simhash
pairs) into per-document cluster assignments ("keep one per
component").

This is the engine's genuinely *iterative* operator: min-label
propagation to fixpoint, implemented as a driver-side loop over
distributed joins (the standard large-graph CC shape — GraphX/
GraphFrames do the same under the hood). Each round is one equi-join
+ one aggregate; rounds needed = graph diameter (tiny for dedup
graphs, which are near-cliques). Only the single convergence *count*
crosses to the driver per round, never data. localCheckpoint truncates
the growing lineage so round N's plan doesn't replay rounds 1..N-1.

The DuckDB oracle expresses the same fixpoint as a recursive CTE —
one of the few operators here where the two engines use genuinely
different execution strategies for the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.operators.dedup import (
    ORACLE_SQL as _DEDUP_ORACLE_SQL,
    dedup_minhash_lsh,
)

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Min-label propagation over an undirected edge list
    (columns ``doc_a``, ``doc_b``) → (doc_id, cluster_id) where
    cluster_id is the component's minimum doc id."""
    if max_rounds < 1:
        # max_rounds=0 would skip the loop and silently return the
        # identity labeling — the exact silent-wrong-answer the
        # non-convergence RuntimeError below exists to prevent
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = edges.selectExpr("doc_a AS src", "doc_b AS dst").union(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    sym = sym.distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    changed = 0
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neighbor_min"))
        )
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("neighbor_min"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # pointer jumping: relabel through the mapping itself
        # (cluster_id := label(cluster_id)), which shortcuts long
        # chains — rounds become O(log diameter) instead of
        # O(diameter). Every cluster_id is a doc_id in the mapping,
        # so the self-join is total; least() keeps monotonicity.
        mapping = propagated.selectExpr(
            "doc_id AS m_id", "cluster_id AS m_cluster"
        )
        updated = (
            propagated.join(
                mapping, propagated.cluster_id == mapping.m_id
            )
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.col("m_cluster")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        # an unconverged mapping silently mislabels downstream dedup
        # (wrong survivors dropped) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds ({changed} labels still changing); raise "
            f"max_rounds — rounds needed is O(log diameter) with "
            f"pointer jumping"
        )
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignments for every document that appears in a
    MinHash-LSH candidate pair, plus per-cluster survivor stats."""
    edges = dedup_minhash_lsh(spark, sf_dir)
    labels = connected_components(edges)
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("keep_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("cluster_id")
    )


QUERIES = {"dedup_clusters": dedup_clusters}

# The recursive-CTE fixpoint: reach(doc, root) holds every label a doc
# can see along any path; MIN(root) per doc is the component label.
# (UNION deduplicates, so the recursion is bounded by nodes × labels.)
# The minhash pair pipeline is inlined as a derived table so the
# oracle runs against the driver's base views alone.
_PAIRS_SQL = f"({_DEDUP_ORACLE_SQL['dedup_minhash_lsh']})"

ORACLE_SQL = {
    "dedup_clusters": f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM {_PAIRS_SQL} t),
        sym AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(doc_id, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.src, r.root
            FROM sym s JOIN reach r ON s.dst = r.doc_id
        ),
        labels AS (
            SELECT doc_id, MIN(root) AS cluster_id
            FROM reach GROUP BY doc_id
        )
        SELECT cluster_id,
               COUNT(*) AS cluster_size,
               MIN(doc_id) AS keep_id,
               MAX(doc_id) AS max_doc_id
        FROM labels
        GROUP BY cluster_id
        ORDER BY cluster_id
    """,  # noqa: E501
}
