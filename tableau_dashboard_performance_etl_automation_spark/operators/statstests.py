"""Statistical testing & monitoring — the hypothesis-test /
drift-detection layer a production data pipeline runs on top of its
marts (reference scope: tabjolt_email.py:385,387 flags regressions
with a fixed ±% threshold; these are the same comparisons done with
real test statistics: CUSUM excursions, EWMA smoothing, Mann-Whitney
rank tests, Kolmogorov-Smirnov distribution drift, two-proportion
z-tests, and chance-corrected agreement).

Numeric discipline shared by the file (the
``analytics.daily_anomaly_scores`` contract): every engine-side
reduction is an EXACT integer (cents, counts, rank sums that are
exact half-integers, micro-unit covariance cells) so accumulation
order can never differ between Spark and the DuckDB oracle; each test
statistic is ONE closed-form double expression of those integers,
rounded once.  Scale shape shared by the file: raw tables are touched
once by a map-side-combinable hash aggregate onto a BOUNDED domain
(days, sources, arms, label pairs, value compactions); windows only
ever order that bounded/compacted domain, never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.functions.text import words
from tableau_dashboard_performance_etl_automation_spark.operators.sampling import (
    _bucket,
)

#: EWMA decay per day (1 - lambda). 0.5 = one-day half-life, chosen
#: because 2^t weight scaling is EXACT in binary floating point
#: (computed as a shifted integer, not libm pow), so both engines
#: build bit-identical weights.
EWMA_R_INV = 2  # 1 / (1 - lambda)

#: Mann-Whitney comparison pair (two document sources).
MW_SRC_A = "src0"
MW_SRC_B = "src1"

#: KS drift split: days 1..KS_SPLIT_DAYS after the corpus min date
#: form the reference period, the rest the current period.
KS_SPLIT_DAYS = 14

#: Water-filling token budget as a percent of the corpus total.
WATERFILL_BUDGET_PCT = 60


def daily_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift series: per day, the cumulative deviation of event
    value volume from a uniform daily rate (``cum(s_d) - t*S/D``) —
    the control-chart curve whose excursions localize WHEN a rate
    change happened (a fixed-threshold daily alarm like the
    reference's ±20% flag cannot).

    The day aggregate is one map-side-combinable hash aggregate onto
    the bounded day domain; the cumulative window orders those ~30
    day rows, never events. ``cum_s`` is an exact BIGINT cents sum;
    the deviation subtracts one double product per row."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("s"))
    )
    totals = F.broadcast(
        daily.agg(
            F.sum("s").alias("grand_s"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    t = F.row_number().over(Window.orderBy("d"))
    return (
        daily.crossJoin(totals)
        .select(
            "d",
            F.round(F.col("s") / 100.0, 2).alias("daily_value"),
            F.sum("s").over(w).alias("cum_s"),
            t.alias("t"),
            "grand_s",
            "n_days",
        )
        .select(
            "d",
            "daily_value",
            F.round(
                (
                    F.col("cum_s")
                    - F.col("t") * (F.col("grand_s") / F.col("n_days"))
                )
                / 100.0,
                4,
            ).alias("cusum_dev"),
            F.round(
                (
                    F.col("cum_s")
                    - F.col("t") * (F.col("grand_s") / F.col("n_days"))
                )
                * 100.0
                / F.col("grand_s"),
                4,
            ).alias("dev_share_pct"),
        )
        .orderBy("d")
    )


def daily_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily mean value (pandas ``adjust=True``
    semantics: ``ewma_t = sum(r^(t-i) x_i) / sum(r^(t-i))``) — the
    denoised trend line the drift tests compare against.

    The r^t scaling cancels between numerator and denominator, so
    each is a cumulative sum of ``x_i * 2^i`` / ``2^i`` — and the
    weights are built by integer shift (``1 << t``), EXACT in both
    engines, never libm ``pow`` whose last ulp may differ. The window
    orders the ~30 aggregated day rows."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").alias("s"),
        )
    )
    t = F.row_number().over(Window.orderBy("d"))
    mean = F.col("s") / F.col("n") / 100.0
    # SQL shiftleft accepts a column shift amount (the Python API
    # wrapper does not) — 1<<t stays an exact BIGINT power of two
    wt = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(t AS INT)) AS DOUBLE)")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("t", t)
        .withColumn("day_mean", mean)
        .withColumn("u", F.col("day_mean") * wt)
        .withColumn("v", wt)
        .select(
            "d",
            F.round("day_mean", 4).alias("day_mean"),
            F.round(
                F.sum("u").over(w) / F.sum("v").over(w), 4
            ).alias("ewma"),
        )
        .orderBy("d")
    )


def quality_mannwhitney_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test on document length (``n_chars``) between
    sources ``MW_SRC_A`` and ``MW_SRC_B`` — the nonparametric "is
    this source systematically longer?" check that a mean-difference
    test gets wrong on heavy-tailed length distributions.

    Rank arithmetic runs on the VALUE-DOMAIN compaction (per distinct
    n_chars: counts per group), so the ordering window sorts distinct
    lengths, never documents. Tied ranks use the average-rank
    convention; every rank sum is an exact half-integer (exact in
    doubles), the tie correction an exact BIGINT, and z one final
    closed-form expression."""
    docs = load_table(spark, sf_dir, "documents")
    both = docs.filter(F.col("source").isin(MW_SRC_A, MW_SRC_B))
    comp = both.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum((F.col("source") == MW_SRC_A).cast("bigint")).alias("ca"),
        F.sum((F.col("source") == MW_SRC_B).cast("bigint")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = comp.withColumn("ct", F.col("ca") + F.col("cb")).withColumn(
        "avg_rank",
        (F.sum(F.col("ca") + F.col("cb")).over(w) - (F.col("ca") + F.col("cb")))
        + (F.col("ca") + F.col("cb") + 1) / 2.0,
    )
    sums = ranked.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("ra"),
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        ).cast("bigint").alias("tie3"),
    )
    n = F.col("na") + F.col("nb")
    u_a = F.col("ra") - F.col("na") * (F.col("na") + 1) / 2.0
    var = (
        F.col("na")
        * F.col("nb")
        / 12.0
        * ((n + 1) - F.col("tie3") / (n * (n - 1.0)))
    )
    z = (u_a - F.col("na") * F.col("nb") / 2.0) / F.sqrt(var)
    return sums.select(
        "na",
        "nb",
        F.round(u_a, 1).alias("u_a"),
        F.round(F.when(var > 0, z), 4).alias("z"),
    )


def daily_value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the event
    value distribution of the first ``KS_SPLIT_DAYS`` days and the
    rest of the period — the distribution-level drift test that
    catches shape changes PSI's fixed bins smear out.

    The ECDF sup-difference is maximized in EXACT integers: per
    distinct cent value, cross-multiplied cumulative counts
    ``|cum_a*nb - cum_b*na|`` (BIGINT; headroom to ~3e9 rows per
    side, then move to DECIMAL(38,0)) — so the argmax value is
    deterministic and D divides once at the end. The window orders
    the cents compaction, never events; the pivot date derives from
    the data (broadcast 1-row aggregate), never the wall clock."""
    events = load_table(spark, sf_dir, "events")
    pivot = F.broadcast(
        events.agg(
            F.date_add(F.min(F.to_date("ts")), KS_SPLIT_DAYS - 1).alias(
                "pivot_d"
            )
        )
    )
    comp = (
        events.crossJoin(pivot)
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.to_date("ts") <= F.col("pivot_d")).cast("bigint").alias(
                "in_a"
            ),
        )
        .groupBy("cents")
        .agg(
            F.sum("in_a").alias("ca"),
            F.sum(1 - F.col("in_a")).alias("cb"),
        )
    )
    totals = F.broadcast(
        comp.agg(
            F.sum("ca").cast("bigint").alias("na"),
            F.sum("cb").cast("bigint").alias("nb"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    diffs = (
        comp.crossJoin(totals)
        .select(
            "cents",
            "na",
            "nb",
            F.abs(
                F.sum("ca").over(w) * F.col("nb")
                - F.sum("cb").over(w) * F.col("na")
            ).alias("diff_int"),
        )
    )
    peak = F.broadcast(diffs.agg(F.max("diff_int").alias("max_diff")))
    return (
        diffs.crossJoin(peak)
        .filter(F.col("diff_int") == F.col("max_diff"))
        .groupBy("na", "nb", "max_diff")
        .agg(F.min("cents").alias("at_cents"))
        .select(
            "na",
            "nb",
            F.round(
                F.col("max_diff") / (F.col("na") * F.col("nb") * 1.0), 6
            ).alias("ks_d"),
            F.round(F.col("at_cents") / 100.0, 2).alias("at_value"),
        )
    )


def embedding_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank (participation ratio) of the embedding space:
    ``trace(C)^2 / ||C||_F^2`` — a closed-form spectral-concentration
    diagnostic (how many dimensions carry the variance) that needs NO
    eigendecomposition, so it stays a pure aggregate at any corpus
    size.  A collapsing embedding model shows up here as eff_rank
    falling toward 1 long before retrieval metrics degrade.

    Composes :func:`similarity.embedding_covariance` (upper-triangle
    covariance from exact micro-unit moments, rounded to 8): the
    rounded cells are re-quantized to exact 1e-8 integer units, so
    trace and Frobenius sums are exact BIGINTs (off-diagonal cells
    count twice) and the ratio is one final division."""
    from tableau_dashboard_performance_etl_automation_spark.operators.similarity import (
        embedding_covariance,
    )

    cov = embedding_covariance(spark, sf_dir)
    u = cov.select(
        "dim_i",
        "dim_j",
        F.round(F.col("cov") * 1e8).cast("bigint").alias("cu"),
    )
    diag = F.col("dim_i") == F.col("dim_j")
    sums = u.agg(
        F.sum(F.when(diag, 1).otherwise(0)).cast("int").alias("n_dims"),
        F.sum(F.when(diag, F.col("cu")).otherwise(0)).alias("tr_u"),
        F.sum(
            F.when(diag, F.col("cu") * F.col("cu")).otherwise(
                2 * F.col("cu") * F.col("cu")
            )
        ).alias("fro2_u"),
    )
    return sums.select(
        "n_dims",
        F.round(F.col("tr_u") / 1e8, 8).alias("trace_cov"),
        F.round(
            F.col("tr_u") * F.col("tr_u") / (F.col("fro2_u") * 1.0), 4
        ).alias("effective_rank"),
    )


def conversion_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between two
    deterministically hash-assigned user arms — the A/B readout every
    experimentation pipeline ends in.  Arm assignment replays the
    engine's split primitive (md5 bucket parity,
    ``sampling._bucket``), so assignment is stable across runs,
    engines, and cluster sizes.

    Per-user conversion is one map-side-combinable aggregate on
    ``user_id``; arms collapse to a 2-row table; z is a closed form
    of four exact integers."""
    events = load_table(spark, sf_dir, "events")
    users = (
        events.groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("bigint")
            ).alias("converted")
        )
        .select(
            F.when(_bucket(F.col("user_id")) % 2 == 0, "A")
            .otherwise("B")
            .alias("arm"),
            "converted",
        )
    )
    arms = users.groupBy().agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p1, 4).alias("rate_a"),
        F.round(p2, 4).alias("rate_b"),
        F.round(F.when(se > 0, (p1 - p2) / se), 4).alias("z"),
    )


def lang_id_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the language-ID heuristic and the
    labeled ``lang`` column — chance-corrected agreement, the honest
    version of the raw accuracy `lang_id_confusion` reports (a
    degenerate labeler that answers the majority class every time
    scores high accuracy but kappa ~ 0).

    Kappa reduces to EXACT integers: ``(N*agree - sum(rt*ct)) /
    (N^2 - sum(rt*ct))`` over the bounded label domain — marginals
    are two tiny aggregates joined on the 5-value label key, then one
    final division."""
    from tableau_dashboard_performance_etl_automation_spark.operators.textops import (
        text_lang_id,
    )

    pred = text_lang_id(spark, sf_dir).select("lang", "predicted_lang")
    overall = pred.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            (F.col("lang") == F.col("predicted_lang")).cast("bigint")
        ).alias("agree"),
    )
    rt = pred.groupBy(F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("row_tot")
    )
    ct = pred.groupBy(F.col("predicted_lang").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("col_tot")
    )
    chance = F.broadcast(
        rt.join(ct, "label").agg(
            F.sum(F.col("row_tot") * F.col("col_tot")).alias("exp_agree")
        )
    )
    return (
        F.broadcast(overall)
        .crossJoin(chance)
        .select(
            "n_docs",
            F.round(F.col("agree") * 100.0 / F.col("n_docs"), 4).alias(
                "agreement_pct"
            ),
            F.round(
                (F.col("n_docs") * F.col("agree") - F.col("exp_agree"))
                / (
                    F.col("n_docs") * F.col("n_docs")
                    - F.col("exp_agree")
                    * 1.0
                ),
                6,
            ).alias("kappa"),
        )
    )


def mixture_water_filling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget water-filling across sources: allocate a budget
    of ``WATERFILL_BUDGET_PCT``% of corpus tokens uniformly, capped
    at each source's available tokens (``alloc_s = min(c_s, theta)``
    with theta chosen so allocations sum to the budget) — the
    mixture-balancing step of training-data budgeting (uniform
    sampling with per-source availability caps).

    The breakpoint search is integer-exact: on the source compaction
    sorted by availability, position i is a valid cap boundary iff
    ``budget - cum_i >= c_i * (K - i)`` (all BIGINT); theta divides
    once at the argmax boundary.  Every window orders the BOUNDED
    source domain (~20 rows after one map-side-combining aggregate
    over the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(words()).cast("bigint").alias("toks"))
        .groupBy("source")
        .agg(F.sum("toks").alias("c"))
    )
    totals = F.broadcast(
        per_src.agg(
            F.sum("c").alias("total_toks"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    wo = Window.orderBy("c", "source")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        per_src.crossJoin(totals)
        .withColumn(
            "budget",
            F.expr(f"total_toks * {WATERFILL_BUDGET_PCT} DIV 100"),
        )
        .withColumn("i", F.row_number().over(wo).cast("bigint"))
        .withColumn("cum", F.sum("c").over(wc))
    )
    # boundary i is valid iff capping sources 1..i leaves a water
    # level still above c_i; i=0 (nothing capped) is always valid
    boundary = F.broadcast(
        ranked.filter(
            F.col("budget") - F.col("cum")
            >= F.col("c") * (F.col("k") - F.col("i"))
        )
        .agg(
            F.coalesce(F.max("i"), F.lit(0).cast("bigint")).alias("i_star")
        )
    )
    cut = F.broadcast(
        ranked.crossJoin(boundary)
        .filter(F.col("i") <= F.col("i_star"))
        .agg(
            F.coalesce(F.sum("c"), F.lit(0).cast("bigint")).alias(
                "cum_star"
            )
        )
    )
    theta = (F.col("budget") - F.col("cum_star")) / (
        F.col("k") - F.col("i_star") * 1.0
    )
    return (
        ranked.crossJoin(boundary)
        .crossJoin(cut)
        .select(
            "source",
            F.col("c").alias("available_tokens"),
            (F.col("i") > F.col("i_star")).cast("int").alias("at_cap"),
            F.round(
                F.when(F.col("i") <= F.col("i_star"), F.col("c")).otherwise(
                    theta
                ),
                2,
            ).alias("alloc_tokens"),
            F.round(theta, 2).alias("water_level"),
        )
        .orderBy("source")
    )


def _cov_oracle() -> str:
    """The embedding_covariance oracle, reused as a subquery (DuckDB
    allows a full WITH...SELECT inside a CTE body)."""
    from tableau_dashboard_performance_etl_automation_spark.operators.similarity import (
        ORACLE_SQL as _SIM_ORACLE,
    )

    return _SIM_ORACLE["embedding_covariance"]


QUERIES = {
    "daily_cusum_drift": daily_cusum_drift,
    "daily_value_ewma": daily_value_ewma,
    "quality_mannwhitney_sources": quality_mannwhitney_sources,
    "daily_value_ks_test": daily_value_ks_test,
    "embedding_effective_rank": embedding_effective_rank,
    "conversion_ab_ztest": conversion_ab_ztest,
    "lang_id_cohens_kappa": lang_id_cohens_kappa,
    "mixture_water_filling": mixture_water_filling,
}


def _oracle_sql() -> dict[str, str]:
    from tableau_dashboard_performance_etl_automation_spark.operators.textops import (
        _lang_oracle,
    )

    return {
        "daily_cusum_drift": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS d,
                       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s
                FROM events GROUP BY 1
            ),
            tot AS (
                SELECT SUM(s) AS grand_s, COUNT(*) AS n_days FROM daily
            ),
            cum AS (
                SELECT d,
                       s,
                       SUM(s) OVER (ORDER BY d
                           ROWS UNBOUNDED PRECEDING) AS cum_s,
                       CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
                FROM daily
            )
            SELECT d,
                   ROUND(s / 100.0, 2) AS daily_value,
                   ROUND((cum_s - t * (CAST(grand_s AS DOUBLE) / n_days))
                         / 100.0, 4) AS cusum_dev,
                   ROUND((cum_s - t * (CAST(grand_s AS DOUBLE) / n_days))
                         * 100.0 / grand_s, 4) AS dev_share_pct
            FROM cum CROSS JOIN tot
            ORDER BY d
        """,
        "daily_value_ewma": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS d,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s
                FROM events GROUP BY 1
            ),
            r AS (
                SELECT d,
                       CAST(s AS DOUBLE) / n / 100.0 AS day_mean,
                       CAST(1::BIGINT << ROW_NUMBER() OVER (ORDER BY d)
                            AS DOUBLE) AS wt
                FROM daily
            )
            SELECT d,
                   ROUND(day_mean, 4) AS day_mean,
                   ROUND(SUM(day_mean * wt) OVER w / SUM(wt) OVER w, 4)
                       AS ewma
            FROM r
            WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
            ORDER BY d
        """,
        "quality_mannwhitney_sources": f"""
            WITH comp AS (
                SELECT n_chars AS v,
                       SUM(CASE WHEN source = '{MW_SRC_A}' THEN 1
                                ELSE 0 END) AS ca,
                       SUM(CASE WHEN source = '{MW_SRC_B}' THEN 1
                                ELSE 0 END) AS cb
                FROM documents
                WHERE source IN ('{MW_SRC_A}', '{MW_SRC_B}')
                GROUP BY n_chars
            ),
            ranked AS (
                SELECT ca, cb, ca + cb AS ct,
                       (SUM(ca + cb) OVER (ORDER BY v
                            ROWS UNBOUNDED PRECEDING) - (ca + cb))
                           + (ca + cb + 1) / 2.0 AS avg_rank
                FROM comp
            ),
            s AS (
                SELECT CAST(SUM(ca) AS BIGINT) AS na,
                       CAST(SUM(cb) AS BIGINT) AS nb,
                       SUM(ca * avg_rank) AS ra,
                       CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie3
                FROM ranked
            )
            SELECT na, nb,
                   ROUND(ra - na * (na + 1) / 2.0, 1) AS u_a,
                   ROUND(CASE WHEN na * nb / 12.0
                             * ((na + nb + 1)
                                - tie3 / ((na + nb) * (na + nb - 1.0))) > 0
                        THEN (ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                             / sqrt(na * nb / 12.0
                                    * ((na + nb + 1)
                                       - tie3 / ((na + nb)
                                                 * (na + nb - 1.0))))
                        END, 4) AS z
            FROM s
        """,
        "daily_value_ks_test": f"""
            WITH piv AS (
                SELECT MIN(CAST(ts AS DATE))
                           + INTERVAL {KS_SPLIT_DAYS - 1} DAY AS pivot_d
                FROM events
            ),
            comp AS (
                SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                       SUM(CASE WHEN CAST(ts AS DATE) <= pivot_d
                                THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN CAST(ts AS DATE) <= pivot_d
                                THEN 0 ELSE 1 END) AS cb
                FROM events CROSS JOIN piv
                GROUP BY 1
            ),
            tot AS (
                SELECT CAST(SUM(ca) AS BIGINT) AS na,
                       CAST(SUM(cb) AS BIGINT) AS nb
                FROM comp
            ),
            diffs AS (
                SELECT cents, na, nb,
                       ABS(SUM(ca) OVER w * nb - SUM(cb) OVER w * na)
                           AS diff_int
                FROM comp CROSS JOIN tot
                WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
            ),
            peak AS (SELECT MAX(diff_int) AS max_diff FROM diffs)
            SELECT na, nb,
                   ROUND(max_diff / (na * nb * 1.0), 6) AS ks_d,
                   ROUND(MIN(cents) / 100.0, 2) AS at_value
            FROM diffs CROSS JOIN peak
            WHERE diff_int = max_diff
            GROUP BY na, nb, max_diff
        """,
        "embedding_effective_rank": f"""
            WITH cov AS ({_cov_oracle()}),
            u AS (
                SELECT dim_i, dim_j,
                       CAST(ROUND(cov * 1e8) AS BIGINT) AS cu
                FROM cov
            ),
            s AS (
                SELECT CAST(SUM(CASE WHEN dim_i = dim_j THEN 1
                                     ELSE 0 END) AS INTEGER) AS n_dims,
                       SUM(CASE WHEN dim_i = dim_j THEN cu
                                ELSE 0 END) AS tr_u,
                       SUM(CASE WHEN dim_i = dim_j THEN cu * cu
                                ELSE 2 * cu * cu END) AS fro2_u
                FROM u
            )
            SELECT n_dims,
                   ROUND(tr_u / 1e8, 8) AS trace_cov,
                   ROUND(tr_u * tr_u / (fro2_u * 1.0), 4)
                       AS effective_rank
            FROM s
        """,
        "conversion_ab_ztest": """
            WITH users AS (
                SELECT user_id,
                       MAX(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS converted,
                       CASE WHEN (ascii(substr(md5(
                                      CAST(user_id AS VARCHAR)), 1, 1)) * 256
                                  + ascii(substr(md5(
                                      CAST(user_id AS VARCHAR)), 2, 1)))
                                 % 100 % 2 = 0
                            THEN 'A' ELSE 'B' END AS arm
                FROM events GROUP BY user_id
            ),
            arms AS (
                SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_a,
                       CAST(SUM(CASE WHEN arm = 'A' THEN converted
                                     ELSE 0 END) AS BIGINT) AS conv_a,
                       CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_b,
                       CAST(SUM(CASE WHEN arm = 'B' THEN converted
                                     ELSE 0 END) AS BIGINT) AS conv_b
                FROM users
            )
            SELECT n_a, conv_a, n_b, conv_b,
                   ROUND(conv_a * 1.0 / n_a, 4) AS rate_a,
                   ROUND(conv_b * 1.0 / n_b, 4) AS rate_b,
                   ROUND(CASE WHEN
                         sqrt((conv_a + conv_b) * 1.0 / (n_a + n_b)
                              * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)) > 0
                         THEN (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                              / sqrt((conv_a + conv_b) * 1.0 / (n_a + n_b)
                                     * (1 - (conv_a + conv_b) * 1.0
                                            / (n_a + n_b))
                                     * (1.0 / n_a + 1.0 / n_b))
                         END, 4) AS z
            FROM arms
        """,
        "lang_id_cohens_kappa": f"""
            WITH pred AS ({_lang_oracle()}),
            overall AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(CASE WHEN lang = predicted_lang
                                     THEN 1 ELSE 0 END) AS BIGINT) AS agree
                FROM pred
            ),
            rt AS (
                SELECT lang AS label, CAST(COUNT(*) AS BIGINT) AS row_tot
                FROM pred GROUP BY lang
            ),
            ct AS (
                SELECT predicted_lang AS label,
                       CAST(COUNT(*) AS BIGINT) AS col_tot
                FROM pred GROUP BY predicted_lang
            ),
            chance AS (
                SELECT SUM(row_tot * col_tot) AS exp_agree
                FROM rt JOIN ct USING (label)
            )
            SELECT n_docs,
                   ROUND(agree * 100.0 / n_docs, 4) AS agreement_pct,
                   ROUND((n_docs * agree - exp_agree)
                         / (n_docs * n_docs - exp_agree * 1.0), 6) AS kappa
            FROM overall CROSS JOIN chance
        """,
        "mixture_water_filling": f"""
            WITH per_src AS (
                SELECT source,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                           AS c
                FROM documents GROUP BY source
            ),
            tot AS (
                SELECT SUM(c) AS total_toks,
                       CAST(COUNT(*) AS BIGINT) AS k
                FROM per_src
            ),
            ranked AS (
                SELECT source, c, total_toks, k,
                       total_toks * {WATERFILL_BUDGET_PCT} // 100
                           AS budget,
                       CAST(ROW_NUMBER() OVER (ORDER BY c, source)
                            AS BIGINT) AS i,
                       SUM(c) OVER (ORDER BY c, source
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM per_src CROSS JOIN tot
            ),
            boundary AS (
                SELECT COALESCE(MAX(i), 0) AS i_star
                FROM ranked
                WHERE budget - cum >= c * (k - i)
            ),
            cut AS (
                SELECT COALESCE(SUM(c), 0) AS cum_star
                FROM ranked CROSS JOIN boundary
                WHERE i <= i_star
            )
            SELECT source,
                   c AS available_tokens,
                   CAST(CASE WHEN i > i_star THEN 1 ELSE 0 END
                        AS INTEGER) AS at_cap,
                   ROUND(CASE WHEN i <= i_star THEN CAST(c AS DOUBLE)
                              ELSE (budget - cum_star)
                                   / (k - i_star * 1.0) END, 2)
                       AS alloc_tokens,
                   ROUND((budget - cum_star) / (k - i_star * 1.0), 2)
                       AS water_level
            FROM ranked CROSS JOIN boundary CROSS JOIN cut
            ORDER BY source
        """,
    }


class _LazyOracle(dict):
    """Defer oracle assembly (it imports sibling modules) to first
    access, keeping import order cycle-free."""

    def _fill(self) -> None:
        if not self:
            self.update(_oracle_sql())

    def __getitem__(self, key):  # noqa: D105
        self._fill()
        return super().__getitem__(key)

    def keys(self):  # noqa: D102
        self._fill()
        return super().keys()

    def items(self):  # noqa: D102
        self._fill()
        return super().items()

    def __iter__(self):  # noqa: D105
        self._fill()
        return super().__iter__()


ORACLE_SQL = _LazyOracle()
