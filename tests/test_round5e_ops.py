"""Invariant tests for the round-5e operators. Value-level parity
with DuckDB is the mirror/driver gate's job; these pin the
mathematical invariants each operator must satisfy on ANY input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.operators import statstests

SF = "/root/testdata/sf0.001"


def test_calibration_partitions_corpus_and_decomposes(spark):
    rows = statstests.quality_score_calibration(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # every document lands in exactly one bin
    assert sum(r.n_docs for r in rows) == n_docs
    bins = [r.bin for r in rows]
    assert bins == sorted(bins)
    assert all(0 <= b < statstests.CALIB_BINS for b in bins)
    for r in rows:
        # midpoint confidence is a constant of the bin id
        assert abs(r.conf_mid - (r.bin + 0.5) / statstests.CALIB_BINS) < 1e-9
        assert 0.0 <= r.acc <= 1.0
        # |gap| consistency and term signs
        assert abs(r.abs_gap - abs(r.conf_mid - r.acc)) < 5e-4
        assert r.ece_term >= 0 and r.rel_term >= 0 and r.res_term >= 0
        # rel term is the squared gap times the bin weight: bounded
        # by the ece term (|gap| <= 1 so gap^2 <= |gap|)
        assert r.rel_term <= r.ece_term + 1e-6
    # resolution never exceeds uncertainty (Murphy decomposition
    # bound): sum res <= ybar*(1-ybar)
    y_all = sum(r.acc * r.n_docs for r in rows)
    ybar = y_all / n_docs
    assert sum(r.res_term for r in rows) <= ybar * (1 - ybar) + 1e-6
