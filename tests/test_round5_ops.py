"""Invariant tests for the round-5 operators (cohorts, textstats,
graph stats). Value-level parity with DuckDB is the mirror/driver
gate's job; these pin the semantic invariants that must hold on ANY
corpus, so a refactor that keeps hash parity on one fixture but
breaks the operator's meaning still fails."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.operators import (
    clustering,
    cohorts,
    textstats,
)

SF = "/root/testdata/sf0.001"


def test_cohort_week0_equals_cohort_size(spark):
    rows = cohorts.weekly_cohort_retention(spark, SF).collect()
    assert rows, "expected cohorts"
    by_cohort: dict = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active
    # every user is active in their own first week, and no later week
    # can exceed the cohort's size
    for cells in by_cohort.values():
        assert 0 in cells
        assert all(n <= cells[0] for n in cells.values())


def test_funnel_counts_are_monotone(spark):
    r = cohorts.session_funnel_conversion(spark, SF).collect()[0]
    assert r.n_sessions >= r.n_view >= r.n_view_click >= r.n_full_funnel
    assert r.n_sessions > 0


def test_pareto_curve_is_monotone_and_covers_threshold(spark):
    rows = cohorts.customer_revenue_pareto(spark, SF).collect()
    assert [r.threshold_pct for r in rows] == cohorts.PARETO_THRESHOLDS
    prev_n = 0
    for r in rows:
        # achieved share must reach the threshold, with the minimal
        # customer count non-decreasing across thresholds
        assert r.achieved_pct >= r.threshold_pct
        assert r.n_customers >= prev_n
        prev_n = r.n_customers
        assert 0 < r.customer_pct <= 100.0


def test_skyline_is_mutually_nondominated_and_complete(spark):
    sky = cohorts.skyline_orders(spark, SF).collect()
    assert sky
    pts = [(r.order_date, r.price) for r in sky]
    for d, p in pts:
        for d2, p2 in pts:
            dominated = d2 <= d and p2 >= p and (d2 < d or p2 > p)
            assert not dominated, f"skyline point ({d},{p}) dominated"
    # completeness spot-check: the global max-price order is always
    # on the frontier
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    mx = orders.agg(F.max(F.round("o_totalprice", 2))).collect()[0][0]
    assert any(abs(p - mx) < 1e-9 for _, p in pts)


def test_mode_is_maximal_per_user(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    cnts = {
        (r.user_id, r.event_type): r.n
        for r in e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in cohorts.mode_event_type_per_user(spark, SF).collect():
        assert cnts[(r.user_id, r.mode_type)] == r.n_events
        others = [
            n for (u, _t), n in cnts.items() if u == r.user_id
        ]
        assert r.n_events == max(others)


def test_novelty_first_doc_is_fully_novel(spark):
    rows = textstats.doc_ngram_novelty(spark, SF).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles
    assert first.novelty_pct == 100.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles


def test_zipf_head_is_sorted_and_share_monotone(spark):
    rows = textstats.zipf_rank_frequency(spark, SF).collect()
    assert rows
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    shares = [r.cum_share_pct for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] <= 100.0


def test_tfidf_terms_have_valid_df_and_nonnegative_score(spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = textstats.tfidf_top_terms(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.df <= n_docs
        assert r.total_tf >= r.df  # a term occurs >= once per doc
        assert r.tfidf >= 0.0


def test_correlation_is_bounded(spark):
    r = textstats.quality_length_correlation(spark, SF).collect()[0]
    assert -1.0 <= r.r_chars_tokens <= 1.0
    # chars and tokens of the same text must correlate positively
    assert r.r_chars_tokens > 0


def test_graph_stats_satisfy_graph_identities(spark):
    r = clustering.neardup_graph_stats(spark, SF).collect()[0]
    # handshake: wedges and edges consistent with degree sums
    assert r.n_edges >= 0 and r.n_nodes >= 0
    if r.n_wedges:
        assert 0.0 <= r.transitivity <= 1.0
        assert 3 * r.n_triangles <= r.n_wedges
    hist = clustering.neardup_degree_histogram(spark, SF).collect()
    assert sum(h.degree * h.n_docs for h in hist) == 2 * r.n_edges
    assert sum(h.n_docs for h in hist) == r.n_nodes


def test_segment_interarrival_p90_dominates_median(spark):
    for r in cohorts.segment_interarrival_stats(spark, SF).collect():
        assert r.median_gap_days <= r.p90_gap_days
        assert r.n_gaps > 0


def test_token_savings_consistent_with_cluster_histogram(spark):
    r = clustering.dedup_policy_token_savings(spark, SF).collect()[0]
    hist = clustering.dup_cluster_size_histogram(spark, SF).collect()
    assert r.n_clusters == sum(h.n_clusters for h in hist)
    assert r.n_clustered_docs == sum(h.n_docs for h in hist)
    # keep-2 never recovers more than keep-1
    assert r.tokens_recovered_keep2 <= r.tokens_recovered_keep1
    assert r.tokens_recovered_keep1 <= r.clustered_tokens
    assert 0 <= r.corpus_pct_recovered <= 100.0


def test_shard_report_shares_sum_to_whole_corpus(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import sampling

    rows = sampling.shard_skew_report(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.token_share_pct for r in rows) - 100.0) < 0.01
    # doc-count balance is by construction: shards differ by <= 1...
    # (contiguous rank ranges of an n-row permutation)
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1


def test_fertility_is_positive_and_consistent(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import textstats as ts

    rows = ts.tokenizer_fertility_by_lang(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.chars_per_token > 0
        assert r.tokens_per_doc > 0
        assert r.total_chars >= r.total_tokens  # token >= 1 char + space
