"""Invariant tests for the round-5f operators (inequality curves and
mutual information). Value-level parity with DuckDB is the
mirror/driver gate's job; these pin the mathematical invariants each
operator must satisfy on ANY input."""

from __future__ import annotations

import math

from tableau_dashboard_performance_etl_automation_spark.operators import cohorts, statstests

SF = "/root/testdata/sf0.001"


def test_gini_matches_direct_rank_formula(spark):
    rows = {r.n_name: r for r in cohorts.nation_revenue_gini(spark, SF).collect()}
    # recompute per-nation Gini driver-side from raw values (sf0.001
    # is small enough) and compare against the compaction form
    rev = spark.sql(
        f"""
        SELECT n.n_name, COALESCE(r.rev, CAST(0 AS BIGINT)) AS rev
        FROM parquet.`{SF}/customer.parquet` c
        LEFT JOIN (
            SELECT o_custkey, CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)
                   AS rev
            FROM parquet.`{SF}/orders.parquet` GROUP BY o_custkey
        ) r ON r.o_custkey = c.c_custkey
        JOIN parquet.`{SF}/nation.parquet` n ON c.c_nationkey = n.n_nationkey
        """
    ).collect()
    by_nation: dict[str, list[int]] = {}
    for r in rev:
        by_nation.setdefault(r.n_name, []).append(r.rev)
    assert set(by_nation) == set(rows)
    total_customers = 0
    for name, xs in by_nation.items():
        xs.sort()
        n, s1 = len(xs), sum(xs)
        got = rows[name]
        assert got.n_customers == n
        if s1 == 0:
            # gini undefined for an all-zero population: NULL, not 0
            assert got.gini is None
        else:
            si = sum(i * x for i, x in enumerate(xs, start=1))
            want = (2 * si - (n + 1) * s1) / (n * s1)
            assert abs(got.gini - want) < 5e-7
            assert 0.0 <= got.gini < 1.0
        total_customers += n
    assert sum(r.n_customers for r in rows.values()) == total_customers


def test_lorenz_curve_shape(spark):
    rows = cohorts.customer_revenue_lorenz(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # curve is non-decreasing, convex-ish (below the diagonal), and
    # reaches exactly 100% at the top decile
    prev = 0.0
    for r in rows:
        assert r.cum_rev_pct >= prev - 1e-9
        assert r.cum_rev_pct <= r.cum_pop_pct + 1e-6
        prev = r.cum_rev_pct
    assert abs(rows[-1].cum_pop_pct - 100.0) < 1e-9
    assert abs(rows[-1].cum_rev_pct - 100.0) < 1e-9
    # decile boundaries are floor(n*d/10) of the customer count
    n = rows[-1].n_customers
    for r in rows:
        assert r.n_customers == (n * r.decile) // 10


def test_mi_terms_decompose_and_sum_nonnegative(spark):
    rows = statstests.event_hour_mi_terms(spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_xy for r in rows) == n_events
    # each term is (p_xy)·pmi at round-6; their sum is I(X;Y) >= 0
    mi = sum(r.mi_term for r in rows)
    assert mi >= -1e-4
    n_all = sum(r.n_xy for r in rows)
    for r in rows:
        assert abs(r.mi_term - (r.n_xy / n_all) * r.pmi_bits) < 5e-6
    # marginal consistency: per-type mass of p_xy sums to p_x, so
    # Σ_h 2^pmi·p_h·p_x mass stays a probability — spot-check via
    # the identity Σ_xy p_xy = 1 (already checked) and PMI bounds:
    # pmi <= -log2(p_x) for every cell
    from collections import defaultdict

    per_type = defaultdict(int)
    for r in rows:
        per_type[r.event_type] += r.n_xy
    for r in rows:
        p_x = per_type[r.event_type] / n_all
        assert r.pmi_bits <= -math.log2(p_x) + 1e-6


def test_ltv_curve_reconciles_with_total_purchase_revenue(spark):
    rows = cohorts.cohort_ltv_curve(spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    import pyspark.sql.functions as F

    want = (
        e.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")))
        .collect()[0][0]
    )
    got = round(sum(r.period_revenue for r in rows) * 100)
    assert got == want
    # cumulative LTV is non-decreasing within each cohort
    by_cohort: dict[str, float] = {}
    for r in rows:
        prev = by_cohort.get(r.cohort_week, -1.0)
        assert r.cum_ltv_per_user >= prev - 1e-9
        by_cohort[r.cohort_week] = r.cum_ltv_per_user
        assert r.week_offset >= 0
        assert r.n_buyers >= 1


def test_erasure_audit_cascade_counts(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import scrubbing

    rows = {r.table_name: r for r in scrubbing.customer_erasure_audit(spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    purged = {
        r.c_custkey
        for r in cust.select("c_custkey").collect()
        if r.c_custkey % scrubbing.ERASURE_MOD == 0
    }
    assert rows["customer"].n_purged == len(purged)
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).collect()
    purged_orders = {r.o_orderkey for r in orders if r.o_custkey in purged}
    assert rows["orders"].n_purged == len(purged_orders)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey").collect()
    assert rows["lineitem"].n_purged == sum(
        1 for r in li if r.l_orderkey in purged_orders
    )
    for r in rows.values():
        assert 0 <= r.n_purged <= r.n_total
        assert abs(r.purge_pct - r.n_purged * 100.0 / r.n_total) < 5e-7


def test_kcore_trajectory_matches_reference_peel(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import clustering
    from tableau_dashboard_performance_etl_automation_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    rows = clustering.neardup_kcore_rounds(spark, SF).collect()
    assert [r.round for r in rows] == list(range(1, clustering.KCORE_ROUNDS + 1))
    # reference peel in plain python over the same LSH pair set
    edges = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF).select("doc_a", "doc_b").collect()
    }
    for r in rows:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        surv = {v for v, d in deg.items() if d >= clustering.KCORE_K}
        edges = {(a, b) for a, b in edges if a in surv and b in surv}
        assert (r.n_nodes, r.n_edges) == (len(surv), len(edges))
    # fixpoint reached inside the round budget: last two rounds agree
    assert (rows[-1].n_nodes, rows[-1].n_edges) == (
        rows[-2].n_nodes,
        rows[-2].n_edges,
    )
    # trajectory is monotone non-increasing
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_nodes <= prev.n_nodes and cur.n_edges <= prev.n_edges


def test_prefix_filter_join_is_complete_and_exact(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import dedup

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_prefix_filter_pairs(spark, SF).collect()
    }
    # brute-force ALL pairs at sf0.001 — the completeness oracle the
    # prefix filter must never miss against
    sh_rows = dedup._doc_shingles(spark, SF).collect()
    sets: dict[int, set] = {}
    for r in sh_rows:
        sets.setdefault(r.doc_id, set()).add(r.sh)
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * dedup.PREFIX_T_DEN >= dedup.PREFIX_T_NUM * union:
                want[(a, b)] = inter / union
    # same pair SET exactly; values within half an ulp of the 4-dp
    # rounding (Spark F.round is HALF_UP, python round() is
    # half-even — exact equality would spuriously fail on a .00005
    # boundary value)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) <= 5.0001e-5


def test_multi_touch_credits_conserve_100_per_purchase(spark):
    import pyspark.sql.functions as F

    from tableau_dashboard_performance_etl_automation_spark.operators import asof

    rows = asof.multi_touch_attribution(spark, SF).collect()
    for r in rows:
        assert (
            r.unattributed
            + r.only_credit
            + r.first_credit
            + r.middle_credit
            + r.last_credit
            == 100 * r.n_purchases
        )
    # EVERY purchase is accounted, clickless ones included
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_all_purchases = e.filter(F.col("event_type") == "purchase").count()
    assert sum(r.n_purchases for r in rows) == n_all_purchases
    # pair count cross-checks the raw window join exactly
    pairs = asof.purchase_click_window_join(spark, SF).collect()
    assert sum(r.n_click_pairs for r in rows) == len(pairs)
    # purchases with >=1 window click carry all non-unattributed mass
    attributed = {p.purchase_id for p in pairs}
    assert sum(100 * r.n_purchases - r.unattributed for r in rows) == 100 * len(
        attributed
    )


def test_hhi_bounds_and_sole_source(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import (
        relational_ext,
    )

    rows = relational_ext.part_supplier_hhi(spark, SF).collect()
    assert rows, "no brands"
    n_parts_total = sum(r.n_parts for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert n_parts_total == li.select("l_partkey").distinct().count()
    for r in rows:
        # HHI lives in (0, 10000]; integer floor-div can undershoot
        # 10000/k by at most 1 but never exceed 10000
        assert 0 < r.min_hhi <= r.max_hhi <= 10000
        assert r.min_hhi - 1e-9 <= r.avg_hhi <= r.max_hhi + 1e-9
        assert 0 <= r.n_sole_sourced <= r.n_parts
        # a sole-sourced part has HHI exactly 10000
        if r.n_sole_sourced == r.n_parts:
            assert r.min_hhi == r.max_hhi == 10000


def test_readability_counts_match_python_reference(spark):
    import re

    from tableau_dashboard_performance_etl_automation_spark.operators import textops

    rows = textops.doc_readability(spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got_ids = {r.doc_id for r in rows}
    for did, text in docs.items():
        w = len(re.findall(r"[^ ]+", text))
        assert (did in got_ids) == (w > 0)
    for r in rows:
        text = docs[r.doc_id]
        w = len(re.findall(r"[^ ]+", text))
        s = max(1, len(re.findall(r"[.!?]+", text)))
        syl = len(re.findall(r"[aeiouy]+", text.lower()))
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, syl)
        want = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert abs(r.flesch - want) <= 5.0001e-5


def test_prefix_vs_lsh_agreement_consistency(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import dedup

    row = dedup.prefix_vs_lsh_agreement(spark, SF).collect()[0]
    n_exact = dedup.dedup_prefix_filter_pairs(spark, SF).count()
    n_lsh = dedup.dedup_minhash_lsh(spark, SF).count()
    assert row.n_exact_pairs == n_exact
    assert row.n_lsh_pairs == n_lsh
    assert 0 <= row.n_common <= min(n_exact, n_lsh)
    assert abs(row.lsh_recall_at_06 - row.n_common / n_exact) <= 5.1e-5


def test_decile_lift_matches_reference_ranking(spark):
    rows = statstests.quality_decile_lift(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # python reference: exact grouped lift with pro-rata boundary runs
    from tableau_dashboard_performance_etl_automation_spark.operators.textops import STOPWORDS

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "text", "lang"
    ).collect()
    groups: dict[float, list[int]] = {}
    for d in docs:
        words = d.text.split(" ")
        p = min(
            sum(1 for x in words if x in STOPWORDS)
            * float(statstests.CALIB_DENSITY_SCALE)
            / len(words),
            1.0,
        )
        cnt_pos = groups.setdefault(p, [0, 0])
        cnt_pos[0] += 1
        cnt_pos[1] += int(d.lang == "en")
    runs = sorted(groups.items(), key=lambda kv: -kv[0])
    n = sum(c for _, (c, _) in runs)
    pos_all = sum(s for _, (_, s) in runs)
    for r in rows:
        k = (n * r.decile) // 10
        assert r.n_docs == k
        lo = 0
        pos_lo = 0.0
        for _, (c, s) in runs:
            if lo < k <= lo + c:
                cum_pos = pos_lo + s * (k - lo) / c
                break
            lo += c
            pos_lo += s
        want_capture = cum_pos * 100.0 / pos_all
        want_lift = (cum_pos / k) / (pos_all / n)
        assert abs(r.capture_pct - want_capture) <= 5.1e-5
        assert abs(r.lift - want_lift) <= 5.1e-5
    # capture is monotone and hits 100% at decile 10
    caps = [r.capture_pct for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 100.0) < 1e-6


def test_kruskal_rank_sums_match_scipy_style_reference(spark):
    rows = statstests.returnflag_quantity_kruskal(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).collect()
    vals = sorted((int(r.l_quantity), r.l_returnflag) for r in li)
    n = len(vals)
    # tie-averaged ranks per value
    from collections import Counter, defaultdict

    cnt = Counter(v for v, _ in vals)
    lo = {}
    run = 0
    for v in sorted(cnt):
        lo[v] = run
        run += cnt[v]
    rank_x2 = defaultdict(int)
    n_g = defaultdict(int)
    for v, g in vals:
        rank_x2[g] += 2 * lo[v] + cnt[v] + 1
        n_g[g] += 1
    assert {r.l_returnflag for r in rows} == set(n_g)
    h = 0.0
    for r in rows:
        assert r.n_rows == n_g[r.l_returnflag]
        assert int(r.rank_sum_x2) == rank_x2[r.l_returnflag]
        num = 3 * rank_x2[r.l_returnflag] ** 2 * 1_000_000
        den = n * (n + 1) * n_g[r.l_returnflag]
        # exact half-up e6 quantization — no float anywhere
        assert r.h_term_e6 == (2 * num + den) // (2 * den)
        h += num / 1e6 / den
    # identity check: H = sum(h_term) - 3(N+1); total rank sum fixed
    assert sum(rank_x2.values()) == n * (n + 1)
    assert h - 3 * (n + 1) >= -1e-9


def test_rolling_p95_matches_spark_percentile_over_raw_window(spark):
    import datetime

    import pyspark.sql.functions as F

    from tableau_dashboard_performance_etl_automation_spark.operators import intervals

    rows = intervals.rolling_p95_value_7d(spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .collect()
    )
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r.d, []).append(r.cents)
    assert {r.event_date for r in rows} == {
        d.strftime("%Y-%m-%d") for d in by_day
    }
    for r in rows:
        t = datetime.date.fromisoformat(r.event_date)
        window = []
        for off in range(intervals.ROLLP_DAYS):
            window.extend(by_day.get(t - datetime.timedelta(days=off), []))
        assert r.n_events_7d == len(window)
        # Spark's own exact interpolated percentile as the reference
        want = (
            spark.createDataFrame([(c,) for c in window], "c BIGINT")
            .agg(F.expr(f"percentile(c, {intervals.ROLLP_Q})"))
            .collect()[0][0]
        )
        assert abs(r.p95_7d - round(want / 100.0, 4)) <= 5.1e-5
