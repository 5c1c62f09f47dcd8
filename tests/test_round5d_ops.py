"""Invariant tests for the round-5d statistical testing layer
(``operators/statstests.py``). Value-level parity with DuckDB is the
mirror/driver gate's job; these pin the mathematical invariants each
test statistic must satisfy on ANY input, plus small brute-force
Python oracles for the rank statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.operators import statstests

SF = "/root/testdata/sf0.001"


def test_cusum_closes_at_zero_and_covers_every_day(spark):
    rows = statstests.daily_cusum_drift(spark, SF).collect()
    n_days = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days
    # the cumulative deviation from the uniform rate is identically
    # zero at the last day: cum_S - D * (S/D) == 0
    assert rows[-1].cusum_dev == 0.0
    assert rows[-1].dev_share_pct == 0.0
    # days ascend
    ds = [r.d for r in rows]
    assert ds == sorted(ds)


def test_ewma_starts_at_first_mean_and_stays_in_prefix_hull(spark):
    rows = statstests.daily_value_ewma(spark, SF).collect()
    assert rows[0].ewma == rows[0].day_mean
    lo = hi = rows[0].day_mean
    for r in rows[1:]:
        lo, hi = min(lo, r.day_mean), max(hi, r.day_mean)
        # convexity: an EWMA is a weighted mean of prefix day means
        assert lo - 1e-3 <= r.ewma <= hi + 1e-3


def test_mannwhitney_matches_bruteforce_ranks(spark):
    row = statstests.quality_mannwhitney_sources(spark, SF).collect()[0]
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(
            F.col("source").isin(statstests.MW_SRC_A, statstests.MW_SRC_B)
        )
        .select("source", "n_chars")
        .collect()
    )
    vals = sorted((d.n_chars, d.source) for d in docs)
    # average ranks with ties, brute force
    ranks: dict[int, float] = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        ranks[vals[i][0]] = avg
        i = j
    ra = sum(
        ranks[v] for v, s in vals if s == statstests.MW_SRC_A
    )
    na = sum(1 for _, s in vals if s == statstests.MW_SRC_A)
    nb = len(vals) - na
    u_a = ra - na * (na + 1) / 2.0
    assert row.na == na and row.nb == nb
    assert abs(row.u_a - u_a) < 0.51
    assert 0.0 <= row.u_a <= na * nb


def test_ks_matches_bruteforce_ecdf(spark):
    row = statstests.daily_value_ks_test(spark, SF).collect()[0]
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("d"), "value")
        .collect()
    )
    days = sorted({r.d for r in ev})
    pivot = days[0] + __import__("datetime").timedelta(
        days=statstests.KS_SPLIT_DAYS - 1
    )
    a = sorted(round(r.value * 100) for r in ev if r.d <= pivot)
    b = sorted(round(r.value * 100) for r in ev if r.d > pivot)
    assert row.na == len(a) and row.nb == len(b)
    grid = sorted(set(a) | set(b))
    import bisect

    d_int = max(
        abs(
            bisect.bisect_right(a, v) * len(b)
            - bisect.bisect_right(b, v) * len(a)
        )
        for v in grid
    )
    assert abs(row.ks_d - d_int / (len(a) * len(b))) < 1e-6
    assert 0.0 <= row.ks_d <= 1.0


def test_effective_rank_bounded_by_dims(spark):
    row = statstests.embedding_effective_rank(spark, SF).collect()[0]
    # participation ratio lives in [1, n_dims] by Cauchy-Schwarz
    assert 1.0 <= row.effective_rank <= row.n_dims
    assert row.trace_cov > 0


def test_ab_arms_partition_users_and_rates_consistent(spark):
    row = statstests.conversion_ab_ztest(spark, SF).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_a + row.n_b == n_users
    assert 0 <= row.conv_a <= row.n_a
    assert 0 <= row.conv_b <= row.n_b
    assert abs(row.rate_a - round(row.conv_a / row.n_a, 4)) < 1e-9
    assert abs(row.rate_b - round(row.conv_b / row.n_b, 4)) < 1e-9


def test_kappa_bounded_and_consistent_with_confusion(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators.textops import (
        text_lang_id,
    )

    row = statstests.lang_id_cohens_kappa(spark, SF).collect()[0]
    assert -1.0 <= row.kappa <= 1.0
    pred = text_lang_id(spark, SF)
    agree = pred.filter(
        F.col("lang") == F.col("predicted_lang")
    ).count()
    total = pred.count()
    assert row.n_docs == total
    assert abs(row.agreement_pct - round(agree * 100.0 / total, 4)) < 1e-9
    # kappa never exceeds raw agreement share
    assert row.kappa <= row.agreement_pct / 100.0 + 1e-9


def test_water_filling_exhausts_budget_within_caps(spark):
    rows = statstests.mixture_water_filling(spark, SF).collect()
    total = sum(r.available_tokens for r in rows)
    budget = total * statstests.WATERFILL_BUDGET_PCT // 100
    alloc = sum(r.alloc_tokens for r in rows)
    # rounding each of K allocations to 2 decimals
    assert abs(alloc - budget) <= 0.01 * len(rows)
    for r in rows:
        assert r.alloc_tokens <= r.available_tokens + 1e-9
        if r.at_cap:
            assert r.alloc_tokens == r.water_level
        else:
            assert r.alloc_tokens == float(r.available_tokens)
    # somebody must sit at the water level when the budget binds
    assert any(r.at_cap for r in rows)


def test_benford_shares_close(spark):
    rows = statstests.benford_price_digits(spark, SF).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") >= 1)
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.obs_pct for r in rows) - 100.0) < 0.01
    assert abs(sum(r.benford_pct for r in rows) - 100.0) < 0.01
    assert all(r.chi_term >= 0 for r in rows)


def test_changepoint_sits_between_segment_means(spark):
    row = statstests.daily_changepoint(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.to_date("ts").alias("d"), "value"
    )
    dmin, dmax = ev.agg(F.min("d"), F.max("d")).collect()[0]
    assert dmin <= row.split_day < dmax
    assert row.between_var_gain >= 0
    # the global mean is a convex combination of the two segment means
    gmean = ev.agg(F.avg("value")).collect()[0][0]
    lo, hi = sorted([row.mean_before, row.mean_after])
    assert lo - 0.01 <= gmean <= hi + 0.01


def test_leadlag_zero_lag_matches_bruteforce_pearson(spark):
    rows = statstests.event_type_leadlag(spark, SF).collect()
    assert [r.lag for r in rows] == list(
        range(-statstests.LEADLAG_MAX, statstests.LEADLAG_MAX + 1)
    )
    per_day = {}
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                (F.col("event_type") == statstests.LEADLAG_X).cast("int")
            ).alias("x"),
            F.sum(
                (F.col("event_type") == statstests.LEADLAG_Y).cast("int")
            ).alias("y"),
        )
        .collect()
    ):
        per_day[r.d] = (r.x, r.y)
    xs = [v[0] for _, v in sorted(per_day.items())]
    ys = [v[1] for _, v in sorted(per_day.items())]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    r0 = [r for r in rows if r.lag == 0][0]
    assert abs(r0.r - round(num / den, 6)) < 1e-6
    assert all(r.r is None or -1.0 <= r.r <= 1.0 for r in rows)


def test_dow_effects_weighted_sum_to_zero(spark):
    rows = statstests.dow_seasonal_decomposition(spark, SF).collect()
    n_days = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == n_days
    weighted = sum(r.n_days * r.effect for r in rows)
    assert abs(weighted) < 0.01 * n_days
    assert all(r.within_var >= 0 for r in rows)


def test_runs_test_counts_match_bruteforce(spark):
    row = statstests.daily_runs_test(spark, SF).collect()[0]
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("s"),
        )
        .collect()
    )
    mus = sorted(
        (round(r.s * 1e4 / r.n), r.d) for r in daily
    )
    dd = len(mus)
    med = (mus[(dd + 1) // 2 - 1][0] + mus[(dd + 2) // 2 - 1][0]) / 2.0
    seq = [
        mu > med
        for mu, _ in sorted(mus, key=lambda p: p[1])
        if mu != med
    ]
    runs = 1 + sum(a != b for a, b in zip(seq, seq[1:]))
    assert row.n_runs == runs
    assert row.n_above == sum(seq)
    assert row.n_below == len(seq) - sum(seq)
    assert 1 <= row.n_runs <= row.n_above + row.n_below


def test_nation_trend_matches_bruteforce_ols(spark):
    rows = statstests.nation_revenue_trend(spark, SF).collect()
    nations = spark.read.parquet(f"{SF}/nation.parquet").count()
    assert len(rows) == nations
    # brute-force the slope for the first nation
    target = rows[0].n_name
    monthly = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == target)
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "m"
            )
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("y")
        )
        .collect()
    )
    m0 = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(F.min(F.year("o_orderdate") * 12 + F.month("o_orderdate")))
        .collect()[0][0]
    )
    pts = [(r.m - m0, r.y) for r in monthly]
    n = len(pts)
    st = sum(t for t, _ in pts)
    stt = sum(t * t for t, _ in pts)
    sy = sum(y for _, y in pts)
    sty = sum(t * y for t, y in pts)
    slope = (n * sty - st * sy) / (n * stt - st * st) / 100.0
    assert abs(rows[0].slope_per_month - round(slope, 4)) < 1e-6


def test_hamming_topk_matches_bruteforce_signatures(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import similarity

    rows = similarity.ann_hamming_topk(spark, SF).collect()
    vecs = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def sig(v):
        return sum(1 << d for d in range(64) if v[d] > 0)

    sigs = {i: sig(v) for i, v in vecs.items()}
    by_query: dict = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == set(range(similarity.N_QUERIES))
    for qid, lst in by_query.items():
        want = sorted(
            (
                bin(sigs[qid] ^ sigs[nid]).count("1"),
                nid,
            )
            for nid in vecs
            if nid != qid
        )[: similarity.TOP_K]
        got = [(r.hamming, r.neighbor_id) for r in sorted(lst, key=lambda r: r.rank)]
        assert got == want, f"query {qid}"


def test_matryoshka_fidelity_improves_with_budget(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import similarity

    rows = similarity.matryoshka_truncation_fidelity(spark, SF).collect()
    assert [r.m for r in rows] == similarity.MRL_BUDGETS
    full = [r for r in rows if r.m == similarity.EMB_DIM][0]
    # at m = full dimension the truncation is the identity
    assert full.r_vs_full == 1.0
    assert full.mae_cosine == 0.0
    # fidelity is monotone in the budget on this corpus
    maes = [r.mae_cosine for r in rows]
    assert maes == sorted(maes, reverse=True)
    rs = [r.r_vs_full for r in rows]
    assert rs == sorted(rs)
    assert all(r.n_pairs == rows[0].n_pairs for r in rows)


def test_fs_linkage_weights_match_bruteforce(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import linkage

    rows = linkage.part_fs_linkage(spark, SF).collect()
    assert len(rows) <= linkage.FS_TOP_N
    ws = [r.fs_weight for r in rows]
    assert ws == sorted(ws, reverse=True)
    parts = {
        r.p_partkey: r
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    # blocking invariant: every candidate shares the first name token
    # AND (brand,size) or (type,size)  (tok1 added round 6 — fixed
    # domains deepen blocks quadratically on a growing catalog)
    def tok1(p):
        return p.p_name.split(" ")[0]

    for r in rows:
        a, b = parts[r.partkey_a], parts[r.partkey_b]
        assert tok1(a) == tok1(b)
        assert (a.p_brand == b.p_brand and a.p_size == b.p_size) or (
            a.p_type == b.p_type and a.p_size == b.p_size
        )
        assert r.f_brand == int(a.p_brand == b.p_brand)
        assert r.f_type == int(a.p_type == b.p_type)
        assert r.f_size == int(a.p_size == b.p_size)

    # recompute u-probabilities and the top pair's weight brute force
    import collections
    import math

    n = len(parts)

    def u_of(attr):
        c = collections.Counter(getattr(p, attr) for p in parts.values())
        return sum(v * (v - 1) for v in c.values()) / (n * (n - 1))

    u = {
        "f_name": u_of("p_name"),
        "f_brand": u_of("p_brand"),
        "f_type": u_of("p_type"),
        "f_size": u_of("p_size"),
    }

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct),
                    )
                )
            prev = cur
        return prev[-1]

    # candidate set brute force (needed for the m-estimates)
    keys = sorted(parts)
    cand = set()
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            a, b = parts[ka], parts[kb]
            if tok1(a) == tok1(b) and (
                (a.p_brand == b.p_brand and a.p_size == b.p_size)
                or (a.p_type == b.p_type and a.p_size == b.p_size)
            ):
                cand.add((ka, kb))

    def flags(ka, kb):
        a, b = parts[ka], parts[kb]
        sim = round(
            1.0 - lev(a.p_name, b.p_name) / max(len(a.p_name), len(b.p_name)),
            4,
        )
        return {
            "f_name": int(sim >= linkage.FS_MATCH_SIM),
            "f_brand": int(a.p_brand == b.p_brand),
            "f_type": int(a.p_type == b.p_type),
            "f_size": int(a.p_size == b.p_size),
        }

    proxy = [p for p in cand if flags(*p)["f_name"] == 1]
    pn = len(proxy)
    m = {"f_name": (pn + 1) / (pn + 2)}
    for f in ("f_brand", "f_type", "f_size"):
        m[f] = (sum(flags(*p)[f] for p in proxy) + 1) / (pn + 2)

    top = rows[0]
    fl = flags(top.partkey_a, top.partkey_b)
    w = sum(
        math.log2(m[f] / u[f])
        if fl[f]
        else math.log2((1 - m[f]) / (1 - u[f]))
        for f in ("f_name", "f_brand", "f_type", "f_size")
    )
    assert abs(top.fs_weight - round(w, 4)) < 1e-6


def test_theilsen_matches_bruteforce_median(spark):
    rows = statstests.nation_theilsen_trend(spark, SF).collect()
    target = rows[0].n_name
    monthly = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            spark.read.parquet(f"{SF}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == target)
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "m"
            )
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("y")
        )
        .collect()
    )
    pts = sorted((r.m, r.y) for r in monthly)

    def half_away(n: int, d: int) -> int:
        # round(n/d) half away from zero in exact integers (d > 0) —
        # the operator's round-11 quantization spec (Python's round()
        # is banker's and would disagree on .5 boundaries)
        return (2 * n + d) // (2 * d) if n >= 0 else -((2 * -n + d) // (2 * d))

    sus = sorted(
        half_away(100 * (y2 - y1), m2 - m1)
        for i, (m1, y1) in enumerate(pts)
        for (m2, y2) in pts[i + 1 :]
    )
    k = len(sus)
    lo, hi = sus[(k + 1) // 2 - 1], sus[(k + 2) // 2 - 1]
    med_scaled = lo if lo == hi else half_away(lo + hi, 2)
    assert rows[0].n_pairs == k
    assert abs(rows[0].theilsen_slope - med_scaled / 1e4) < 1e-9


def test_backtest_naive1_matches_bruteforce(spark):
    rows = {
        r.model: r
        for r in statstests.seasonal_naive_backtest(spark, SF).collect()
    }
    daily = {
        r.d: round(r.s * 1e4 / r.n)
        for r in (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy(F.to_date("ts").alias("d"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.round(F.col("value") * 100).cast("bigint")
                ).alias("s"),
            )
            .collect()
        )
    }
    import datetime

    aes = [
        abs(mu - daily[d - datetime.timedelta(days=1)])
        for d, mu in daily.items()
        if d - datetime.timedelta(days=1) in daily
    ]
    assert rows["naive1"].n_days == len(aes)
    assert (
        abs(rows["naive1"].mae - round(sum(aes) / len(aes) / 1e6, 4))
        < 1e-6
    )
    assert rows["snaive7"].n_days < rows["naive1"].n_days


def test_sequence_perplexity_covers_active_users(spark):
    rows = statstests.user_sequence_perplexity(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    multi = (
        ev.groupBy("user_id")
        .count()
        .filter(F.col("count") >= 2)
        .count()
    )
    assert len(rows) == multi
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # total transitions = events - users-with-at-least-one-event
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    assert all(r.avg_nll_bits >= 0 for r in rows)


def test_kn_scores_are_valid_probabilities(spark):
    from tableau_dashboard_performance_etl_automation_spark.operators import textops

    rows = textops.word_bigram_kn_scores(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with_bigrams = docs.filter(
        F.size(F.split("text", " ")) >= 2
    ).count()
    assert len(rows) == with_bigrams
    # NLL of a probability is positive; interpolated KN never assigns
    # p >= 1 to an observed bigram in a non-degenerate corpus
    assert all(r.kn_avg_nll_bits > 0 for r in rows)
    total_bigrams = (
        docs.select(
            F.greatest(
                F.size(F.split("text", " ")) - 1, F.lit(0)
            ).alias("nb")
        )
        .agg(F.sum("nb"))
        .collect()[0][0]
    )
    assert sum(r.n_bigrams for r in rows) == total_bigrams


def test_qq_shift_deciles_are_exact_quantiles(spark):
    rows = statstests.length_qq_shift(spark, SF).collect()
    assert [r.decile for r in rows] == list(
        range(1, statstests.QQ_DECILES + 1)
    )
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(
            F.col("source").isin(statstests.MW_SRC_A, statstests.MW_SRC_B)
        )
        .select("source", "n_chars")
        .collect()
    )
    for src, col in ((statstests.MW_SRC_A, "q_a"), (statstests.MW_SRC_B, "q_b")):
        vals = sorted(d.n_chars for d in docs if d.source == src)
        n = len(vals)
        for r in rows:
            want = vals[-(-r.decile * n // 10) - 1]
            assert getattr(r, col) == want, (src, r.decile)
    for r in rows:
        assert r.shift == r.q_a - r.q_b
    # quantiles are nondecreasing in the decile
    for col in ("q_a", "q_b"):
        qs = [getattr(r, col) for r in rows]
        assert qs == sorted(qs)


def test_entropy_rate_bounded_by_uniform(spark):
    row = statstests.markov_entropy_rate(spark, SF).collect()[0]
    assert 0.0 <= row.entropy_rate_bits <= row.max_entropy_bits + 1e-9
    assert row.n_cells <= row.n_states * row.n_states
    # the synthetic events are near-uniform: the chain is high-entropy
    assert row.entropy_rate_bits > 0.5 * row.max_entropy_bits


def test_did_cells_partition_user_periods(spark):
    row = statstests.conversion_did_estimate(spark, SF).collect()[0]
    # every (user, period-with-activity) pair lands in exactly one cell
    import datetime

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.to_date("ts").alias("d"), "user_id")
        .collect()
    )
    d0 = min(r.d for r in ev)
    pivot = d0 + datetime.timedelta(days=statstests.KS_SPLIT_DAYS - 1)
    pre = {r.user_id for r in ev if r.d <= pivot}
    post = {r.user_id for r in ev if r.d > pivot}
    assert row.n_a_pre + row.n_b_pre == len(pre)
    assert row.n_a_post + row.n_b_post == len(post)
    # DiD identity over the reported (rounded) rates within rounding
    did = (row.rate_b_post - row.rate_b_pre) - (
        row.rate_a_post - row.rate_a_pre
    )
    assert abs(row.did - did) < 5e-4
