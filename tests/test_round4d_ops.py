"""Semantic tests for the round-4d operators: char entropy,
quantile-normalized quality, embedding covariance, cluster-size
histogram, minhash estimator calibration, seasonality, lead times."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.operators import (
    analytics,
    clustering,
    dedup,
    similarity,
    textops,
)
from tableau_dashboard_performance_etl_automation_spark.plans import (
    has_cartesian_product,
)


def test_char_entropy_bounds(spark, sf_dir):
    rows = textops.doc_char_entropy(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # 0 <= H <= log2(alphabet size actually used)
        assert -1e-9 <= r.entropy_bits
        assert r.entropy_bits <= math.log2(r.n_distinct_chars) + 1e-9
        assert r.n_distinct_chars <= r.n_chars


def test_quantile_normalized_rank_range_per_source(spark, sf_dir):
    out = textops.quantile_normalized_quality(spark, sf_dir)
    stats = (
        out.groupBy("source")
        .agg(
            F.min("q_rank").alias("lo"),
            F.max("q_rank").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in stats:
        assert r.lo == 0.0  # percent_rank of the first row
        assert r.hi == 1.0 or r.n == 1


def test_covariance_diagonal_is_variance_nonnegative(spark, sf_dir):
    rows = similarity.embedding_covariance(spark, sf_dir).collect()
    dims = {r.dim_i for r in rows} | {r.dim_j for r in rows}
    d = len(dims)
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        if r.dim_i == r.dim_j:
            assert r.cov >= -1e-12  # variance can't be negative
        assert r.dim_i <= r.dim_j


def test_cluster_histogram_conserves_docs(spark, sf_dir):
    hist = clustering.dup_cluster_size_histogram(spark, sf_dir).collect()
    edges = dedup.dedup_minhash_lsh(spark, sf_dir)
    labels = clustering.connected_components(edges)
    assert sum(r.n_docs for r in hist) == labels.count()
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.cluster_size >= 2  # every clustered doc came from a pair


def test_minhash_estimator_rows_and_bounds(spark, sf_dir):
    df = dedup.minhash_estimate_error(spark, sf_dir)
    assert not has_cartesian_product(df)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.matching <= dedup.MINHASH_HASHES
        assert abs(r.est_jaccard - r.matching / dedup.MINHASH_HASHES) < 1e-6
        assert 0.0 <= r.avg_exact_jaccard <= 1.0
        assert r.mean_abs_err >= 0.0


def test_seasonality_cells_conserve_orders(spark, sf_dir):
    rows = analytics.order_seasonality(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert 1 <= r.month_of_year <= 12
        assert 0 <= r.day_of_week <= 6


def test_lead_time_percentiles_ordered(spark, sf_dir):
    rows = analytics.supplier_lead_time_percentiles(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_shipments for r in rows) == li
    for r in rows:
        assert r.lead_p50 <= r.lead_p90
