"""Round-7b contracts: the Arrow-batched cosine scorer's margin
pruning must be EXACT under the 6-decimal ranking — these tests
attack the two places where an off-by-one-ULP or a pruning-boundary
bug would silently change results: rounded ties between candidates,
and argmax ties between centroids. The reference computation in each
test is the ORIGINAL HOF-expression pipeline the scorer replaced, so
any divergence (value or tie-break) fails loudly on constructed
adversarial data rather than waiting for a real corpus to hit it."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F


def _adversarial_vectors(n: int, dim: int = 8) -> list:
    """Corpus with exact duplicates (forced rounded ties), near-ties
    differing ~1e-9 in one coordinate (straddles the 6-decimal
    rounding), and zero vectors (NULL-cosine guard)."""
    rng = random.Random(71)
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, base))
    # exact duplicates of vector 3 at several ids → identical cosine,
    # tie-break must go to the smaller neighbor_id
    for j, src in ((n, 3), (n + 1, 3), (n + 2, 5)):
        rows.append((j, list(rows[src][1])))
    # near-ties: vector 7 nudged by 1e-9 in one coordinate
    nudged = list(rows[7][1])
    nudged[0] += 1e-9
    rows.append((n + 3, nudged))
    # zero vectors → NULL cosine against every query
    rows.append((n + 4, [0.0] * dim))
    rows.append((n + 5, [0.0] * dim))
    return rows


def test_arrow_topk_matches_hof_reference_on_ties(spark):
    from tableau_dashboard_performance_etl_automation_spark.functions.vectors import cosine
    from tableau_dashboard_performance_etl_automation_spark.operators.similarity import (
        _arrow_scored_candidates,
    )

    top_k = 4
    rows = _adversarial_vectors(40)
    e = spark.createDataFrame(rows, "vec_id BIGINT, vec ARRAY<DOUBLE>")
    queries = [(r["vec_id"], r["vec"]) for r in e.filter("vec_id < 6").collect()]

    # reference: the original crossJoin + HOF cosine + window pipeline
    q = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos6").desc(), F.col("neighbor_id")
    )
    ref = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos6", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cos6", "rank")
    )
    got = (
        _arrow_scored_candidates(c, queries, top_k)
        .withColumn("cos6", F.round(F.col("cos"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cos6", "rank")
    )
    ref_rows = {tuple(r) for r in ref.collect()}
    got_rows = {tuple(r) for r in got.collect()}
    assert got_rows == ref_rows


def test_nearest_arrow_matches_hof_argmax_on_ties(spark):
    from tableau_dashboard_performance_etl_automation_spark.functions.vectors import cosine
    from tableau_dashboard_performance_etl_automation_spark.operators.similarity import (
        _nearest_arrow,
    )

    rows = _adversarial_vectors(30)
    e = spark.createDataFrame(rows, "vec_id BIGINT, vec ARRAY<DOUBLE>")
    # centroids: two DUPLICATED vectors (every corpus row ties between
    # cent 0/1 → argmax must pick cent_id 0), one zero centroid
    cvec = rows[2][1]
    cent_rows = [
        (0, list(cvec)),
        (1, list(cvec)),
        (2, [0.0] * len(cvec)),
        (3, rows[9][1]),
    ]
    cent = spark.createDataFrame(cent_rows, "cent_id BIGINT, cvec ARRAY<DOUBLE>")

    # reference: the original broadcast crossJoin + rounded argmax
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", F.round(cosine(F.col("vec"), F.col("cvec")), 6)
    )
    ref = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    "ccos",
                    (-F.col("cent_id")).alias("neg_cent"),
                )
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.neg_cent")).alias("cent_id"))
    )
    got = _nearest_arrow(e, cent_rows).select("vec_id", "cent_id")
    ref_map = {r["vec_id"]: r["cent_id"] for r in ref.collect()}
    got_map = {r["vec_id"]: r["cent_id"] for r in got.collect()}
    assert got_map == ref_map
