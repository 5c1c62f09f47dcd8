"""Composite curation pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.operators import curation
from tableau_dashboard_performance_etl_automation_spark.operators.textops import (
    text_quality,
)


def test_survivors_are_subset_and_deduped(spark, sf_dir):
    out = curation.curate_corpus(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    n_quality = text_quality(spark, sf_dir).filter(F.col("keep") == 1).count()
    n_out = out.count()
    assert 0 < n_out <= n_quality <= n_docs
    # unique doc ids (dedup stages can't emit a doc twice)
    assert out.select("doc_id").distinct().count() == n_out


def test_summary_totals_match_detail(spark, sf_dir):
    detail = curation.curate_corpus(spark, sf_dir)
    summary = curation.curation_summary(spark, sf_dir)
    want = detail.agg(F.sum("ws_tokens")).collect()[0][0]
    got = summary.agg(F.sum("total_ws_tokens")).collect()[0][0]
    assert got == want
