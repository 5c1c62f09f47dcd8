"""Interval operators: keyless binned range join, sweep-line
concurrency, and hypertable-style gap-filled rollup.

The reference engine has no interval machinery at all (SURVEY.md §2.6:
its one join is a single equi self-join, `tabjolt_email.py:385`);
these are the time-interval primitives a large-scale event pipeline
needs and that Spark has no built-in operator for.

Scale notes, per operator:

* ``events_in_anomaly_windows`` — a point-in-interval join with **no
  equi key**. Naively that is a nested-loop/broadcast theta join —
  quadratic and non-negotiable at 100 TB. The scalable shape is the
  **binned range join**: explode each interval into the fixed-width
  time bins it covers (here 1-day bins, 3 per window), equi-join
  points to intervals on the bin, then apply the exact residual
  range predicate. Each point carries exactly one bin, so a
  (point, interval) pair can match in at most one bin — no dedup
  pass. Cost is |points| + Σ bins(interval), both linear, and the
  join is a plain shuffled equi-join Catalyst can plan with AQE.
* ``daily_peak_concurrency`` — the classic "max concurrent sessions"
  interval-stabbing problem, solved with a sweep line (+1 at start,
  −1 at end, running sum). A single global sweep would serialize into
  one partition; instead each session explodes into the days it
  overlaps with clamped endpoints, and the sweep runs **per day**
  (`Window.partitionBy(day)`), so days sweep in parallel and no
  partition ever holds more than one day of boundary events.
* ``gapfilled_daily_counts`` — the hypertable rollup: a calendar
  spine (``sequence()`` between the corpus min/max day, exploded)
  cross-joined with the (tiny, broadcast) dimension of event types,
  left-joined to the daily aggregate, zeros for missing counts and
  last-observation-carried-forward for the value column via
  ``last(..., ignorenulls=True)``. The window runs over the DAILY
  aggregate (≤ one row per day per type), never the raw stream.

Cross-engine determinism: all value sums run on exact integer cents;
the sweep orders by (t, delta DESC) so equal-(t, delta) rows are
interchangeable and the running-sum sequence is permutation-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.operators.analytics import (
    SESSION_GAP_MS,
    with_session_ids,
)

#: Days a detected anomaly window extends before/after its anchor day.
_WIN_BEFORE_DAYS = 1
_WIN_AFTER_DAYS = 2  # exclusive end: [anchor-1, anchor+2)


def _cents(col: str = "value") -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


def events_in_anomaly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless binned range join: traffic stats inside each anomaly
    window.

    Windows are derived from the data — each day whose total event
    value exceeds the exact p95 of daily totals anchors a 3-day window
    [anchor−1 d, anchor+2 d). Every event falling inside any window is
    attributed to that window via the binned equi-join described in
    the module docstring, then aggregated per anchor.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.to_date("ts").alias("d"), _cents().alias("cents"))
        .groupBy("d")
        .agg(F.sum("cents").alias("day_cents"))
    )
    thr = F.broadcast(
        daily.agg(F.expr("percentile(day_cents, 0.95)").alias("thr"))
    )
    windows = (
        daily.crossJoin(thr)
        .filter(F.col("day_cents") > F.col("thr"))
        .select(
            F.col("d").alias("anchor"),
            F.date_sub("d", _WIN_BEFORE_DAYS).alias("w_start"),
            F.date_add("d", _WIN_AFTER_DAYS).alias("w_end"),  # exclusive
        )
    )
    # Explode each window into its covered 1-day bins; a point's bin is
    # its own date, so the range join becomes a plain equi-join on bin.
    win_bins = windows.select(
        "anchor",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(F.col("w_start"), F.date_sub("w_end", 1))
        ).alias("bin"),
    )
    pts = e.select(
        F.to_date("ts").alias("bin"),
        F.col("ts"),
        F.col("user_id"),
        _cents().alias("cents"),
    )
    joined = pts.join(win_bins, "bin").filter(
        # exact residual range predicate (redundant at day granularity,
        # load-bearing for any finer bin width)
        (F.col("ts") >= F.col("w_start").cast("timestamp"))
        & (F.col("ts") < F.col("w_end").cast("timestamp"))
    )
    return (
        joined.groupBy("anchor", "w_start", "w_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("cents") / 100.0, 2).alias("window_value"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("anchor_date"),
            F.date_format("w_start", "yyyy-MM-dd").alias("window_start"),
            F.date_format("w_end", "yyyy-MM-dd").alias("window_end"),
            "n_events",
            "n_users",
            "window_value",
        )
        .orderBy("anchor_date")
    )


def _session_spans(e: DataFrame) -> DataFrame:
    """(user_id, session_id, s_start, s_end) — the one shared
    sessionizer (`analytics.with_session_ids`) reduced to spans."""
    return with_session_ids(e).groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )


def daily_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency per calendar day.

    Each session span [s_start, s_end] (inclusive both ends) explodes
    into the days it overlaps; endpoints clamp to the day's bounds, so
    a midnight-spanning session contributes full coverage to both
    days. Within a day the sweep orders (+1 before −1 at equal
    instants — touching sessions count as concurrent) and the peak is
    the max of the running sum. ``n_sessions`` counts sessions active
    at any point in the day.

    Both sweep points of a span come out of ONE pass: a 2-element
    struct-array explode (plain array construction — codegen'd, not
    an interpreted HOF) instead of a self-union whose two branches
    each re-ran the sessionization window + day explode subtree.
    Same (day, t, delta) multiset, so the day-partitioned sweep is
    untouched.
    """
    e = load_table(spark, sf_dir, "events")
    spans = _session_spans(e)
    days = spans.select(
        "s_start",
        "s_end",
        F.explode(
            F.sequence(F.to_date("s_start"), F.to_date("s_end"))
        ).alias("day"),
    )
    lo = F.greatest(F.col("s_start"), F.col("day").cast("timestamp"))
    hi = F.least(F.col("s_end"), F.date_add("day", 1).cast("timestamp"))
    pts = days.select(
        "day",
        F.explode(
            F.array(
                F.struct(lo.alias("t"), F.lit(1).alias("delta")),
                F.struct(hi.alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("pt"),
    ).select(
        "day", F.col("pt.t").alias("t"), F.col("pt.delta").alias("delta")
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("running", F.sum("delta").over(w))
    return (
        run.groupBy("day")
        .agg(
            F.max("running").cast("bigint").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sessions"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("event_date"),
            "n_sessions",
            "peak_concurrent",
        )
        .orderBy("event_date")
    )


def gapfilled_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: daily event counts per type on a
    complete calendar spine, zero-filled, with the daily mean value
    carried forward (LOCF) across silent days.

    ``locf_avg`` is NULL until a type's first observed day, exactly as
    ``last_value IGNORE NULLS`` leaves it.
    """
    e = load_table(spark, sf_dir, "events")
    bounds = F.broadcast(
        e.agg(
            F.min(F.to_date("ts")).alias("d0"),
            F.max(F.to_date("ts")).alias("d1"),
        )
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    types = F.broadcast(e.select("event_type").distinct())
    grid = spine.crossJoin(types)
    daily = (
        e.select(
            "event_type", F.to_date("ts").alias("day"), _cents().alias("cents")
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .withColumn(
            # exact-integer half-up ROUND(sum_cents/(100 n), 4): the
            # scaled quotient sum_cents·100/n rounds half-up in pure
            # BIGINT — (200·s + n) div (2n) — then one exact /10⁴.
            # The double spelling ROUND(s/(100.0·n), 4) diverged
            # between engines on x.xxxx5-boundary quotients (38.37875
            # → 38.3788 vs 38.3787 at sf0.001; PERF.md round-10
            # probe); cents are ≥0 so div==floor on both engines.
            "day_avg",
            F.expr("(200 * sum_cents + n) DIV (2 * n)") / F.lit(1e4),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        grid.join(daily, ["event_type", "day"], "left")
        .withColumn(
            "locf_avg", F.last("day_avg", ignorenulls=True).over(w)
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("event_date"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            "locf_avg",
        )
    )
    return filled.orderBy("event_type", "event_date")


QUERIES = {
    "events_in_anomaly_windows": events_in_anomaly_windows,
    "daily_peak_concurrency": daily_peak_concurrency,
    "gapfilled_daily_counts": gapfilled_daily_counts,
}

_SESS_CTES = f"""
        tagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER uw IS NULL
                             OR epoch_ms(ts) - epoch_ms(lag(ts) OVER uw)
                                > {SESSION_GAP_MS}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess0 AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM tagged
        ),
        spans AS (
            SELECT user_id, session_id,
                   MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM sess0 GROUP BY user_id, session_id
        )
"""

ORACLE_SQL = {
    # The oracle runs the range join directly (DuckDB plans an IEJoin);
    # the Spark side uses the binned equi-join — two genuinely
    # different algorithms validating each other.
    "events_in_anomaly_windows": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents
            FROM events GROUP BY 1
        ),
        thr AS (SELECT percentile_cont(0.95) WITHIN GROUP (ORDER BY day_cents) AS t FROM daily),
        win AS (
            SELECT d AS anchor,
                   d - INTERVAL {_WIN_BEFORE_DAYS} DAY AS w_start,
                   d + INTERVAL {_WIN_AFTER_DAYS} DAY AS w_end
            FROM daily, thr WHERE day_cents > t
        )
        SELECT CAST(CAST(w.anchor AS DATE) AS STRING) AS anchor_date,
               CAST(CAST(w.w_start AS DATE) AS STRING) AS window_start,
               CAST(CAST(w.w_end AS DATE) AS STRING) AS window_end,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               ROUND(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0, 2)
                   AS window_value
        FROM win w
        JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.anchor, w.w_start, w.w_end
        ORDER BY anchor_date
    """,
    "daily_peak_concurrency": """
        WITH
"""
    + _SESS_CTES
    + """,
        days AS (
            SELECT s_start, s_end,
                   UNNEST(generate_series(CAST(s_start AS DATE),
                                          CAST(s_end AS DATE),
                                          INTERVAL 1 DAY))::DATE AS day
            FROM spans
        ),
        pts AS (
            SELECT day,
                   GREATEST(s_start, CAST(day AS TIMESTAMP)) AS t,
                   1 AS delta
            FROM days
            UNION ALL
            SELECT day,
                   LEAST(s_end, CAST(day + 1 AS TIMESTAMP)) AS t,
                   -1 AS delta
            FROM days
        ),
        run AS (
            SELECT day, delta,
                   SUM(delta) OVER (
                       PARTITION BY day ORDER BY t ASC, delta DESC
                       ROWS UNBOUNDED PRECEDING) AS running
            FROM pts
        )
        SELECT strftime(day, '%Y-%m-%d') AS event_date,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions,
               CAST(MAX(running) AS BIGINT) AS peak_concurrent
        FROM run GROUP BY day ORDER BY event_date
    """,
    "gapfilled_daily_counts": """
        WITH bounds AS (
            SELECT MIN(CAST(ts AS DATE)) AS d0,
                   MAX(CAST(ts AS DATE)) AS d1
            FROM events
        ),
        spine AS (
            SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
                   AS day
            FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT t.event_type, s.day FROM spine s CROSS JOIN types t),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   COUNT(*) AS n,
                   -- exact-integer half-up round to 4 places (cents
                   -- are non-negative; // == floor): matches the
                   -- Spark side's (200s + n) DIV (2n) / 10000.0
                   ((200 * SUM(CAST(ROUND(value * 100) AS BIGINT))
                     + COUNT(*)) // (2 * COUNT(*))) / 10000.0 AS day_avg
            FROM events GROUP BY 1, 2
        )
        SELECT g.event_type,
               strftime(g.day, '%Y-%m-%d') AS event_date,
               COALESCE(d.n, 0) AS n_events,
               LAST_VALUE(d.day_avg IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.day
                   ROWS UNBOUNDED PRECEDING) AS locf_avg
        FROM grid g
        LEFT JOIN daily d
          ON d.event_type = g.event_type AND d.day = g.day
        ORDER BY g.event_type, event_date
    """,
}


#: Rolling window width (days, inclusive of the target day) for the
#: exact rolling-percentile series.
ROLLP_DAYS = 7
ROLLP_Q = 0.95


def rolling_p95_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated p95 of event value over a trailing 7-day
    window, per day — the rolling twin of ``daily_p95_series``
    (per-day p95 + max-flag) and ``rolling_value_7d`` (rolling AVG):
    SLO dashboards want the rolling tail, and a rolling percentile
    cannot be assembled from per-day percentiles (quantiles don't
    merge) — it needs the window's full value DISTRIBUTION.

    Scale-safe exact form: each day compacts to (cents, count) — the
    distribution, mergeable where the quantile isn't — each day's
    compaction fans out to the ≤``ROLLP_DAYS`` target days it serves
    (an equi-join on the exploded offset, no range join), the window
    multisets re-aggregate per (target, cents), and one cumulative
    window over DISTINCT cents per target finds the two ranks that
    type-7 interpolation touches: ``idx = q·(n−1)``, values at
    ``⌊idx⌋``/``⌈idx⌉`` via pure integer rank arithmetic, then ONE
    pinned-order interpolation in double — bit-identical in both
    engines, and verified in pytest against Spark's own
    ``percentile()`` over the raw window rows. Work per target day is
    bounded by the value domain, never the row count."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    comp = (
        e.select(F.to_date("ts").alias("d"), cents.alias("cents"))
        .groupBy("d", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # a target day is VALID iff it has its own events (the old spelling
    # semi-joined against a distinct-days table, which re-ran the comp
    # aggregate and paid a join exchange); the same fact rides along
    # the fan-out as a per-row flag — max'd per (t, cents) group and
    # then per t — so one corpus compaction feeds everything.
    fanned = comp.withColumn(
        "t",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), ROLLP_DAYS - 1)
            )
        ),
    )
    merged = fanned.groupBy("t", "cents").agg(
        F.sum("cnt").alias("cnt"),
        F.max((F.col("d") == F.col("t")).cast("int")).alias("own"),
    )
    w = Window.partitionBy("t").orderBy("cents")
    wk = Window.partitionBy("t")
    cum = (
        merged.withColumn("hi", F.sum("cnt").over(w))
        .withColumn("lo", F.col("hi") - F.col("cnt"))
        # per-target total and day-validity from the SAME t-partition
        # the cumulative window established — no groupBy + join-back
        .withColumn("n", F.sum("cnt").over(wk))
        .withColumn("has_own", F.max("own").over(wk))
    )
    idx = F.lit(ROLLP_Q) * (F.col("n") - 1)
    j_f = F.floor(idx).cast("bigint")
    j_c = j_f + (idx > j_f.cast("double")).cast("bigint")
    picked = (
        cum.filter(F.col("has_own") == 1)
        .withColumn("j_f", j_f)
        .withColumn("j_c", j_c)
        .groupBy("t", "n")
        .agg(
            F.max(
                F.when(
                    (F.col("lo") <= F.col("j_f"))
                    & (F.col("j_f") < F.col("hi")),
                    F.col("cents"),
                )
            ).alias("v_f"),
            F.max(
                F.when(
                    (F.col("lo") <= F.col("j_c"))
                    & (F.col("j_c") < F.col("hi")),
                    F.col("cents"),
                )
            ).alias("v_c"),
        )
    )
    frac = F.lit(ROLLP_Q) * (F.col("n") - 1) - F.floor(
        F.lit(ROLLP_Q) * (F.col("n") - 1)
    )
    return picked.select(
        F.date_format("t", "yyyy-MM-dd").alias("event_date"),
        F.col("n").cast("bigint").alias("n_events_7d"),
        F.round(
            (F.col("v_f") + (F.col("v_c") - F.col("v_f")) * frac)
            / 100.0,
            4,
        ).alias("p95_7d"),
    ).orderBy("event_date")


QUERIES["rolling_p95_value_7d"] = rolling_p95_value_7d

ORACLE_SQL["rolling_p95_value_7d"] = f"""
    WITH comp AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT d AS t FROM comp),
    fanned AS (
        SELECT c.d + o.o * INTERVAL 1 DAY AS t, c.cents, c.cnt
        FROM comp c
        CROSS JOIN (SELECT UNNEST(range(0, {ROLLP_DAYS})) AS o) o
    ),
    merged AS (
        SELECT f.t, f.cents, SUM(f.cnt) AS cnt
        FROM fanned f
        WHERE f.t IN (SELECT t FROM days)
        GROUP BY f.t, f.cents
    ),
    cum AS (
        SELECT t, cents, cnt,
               SUM(cnt) OVER w AS hi,
               (SUM(cnt) OVER w) - cnt AS lo
        FROM merged
        WINDOW w AS (PARTITION BY t ORDER BY cents
                     ROWS UNBOUNDED PRECEDING)
    ),
    totals AS (SELECT t, SUM(cnt) AS n FROM merged GROUP BY t),
    picked AS (
        SELECT c.t, x.n,
               MAX(CASE WHEN c.lo <= FLOOR({ROLLP_Q} * (x.n - 1))
                         AND FLOOR({ROLLP_Q} * (x.n - 1)) < c.hi
                        THEN c.cents END) AS v_f,
               MAX(CASE WHEN c.lo <= FLOOR({ROLLP_Q} * (x.n - 1))
                             + CAST({ROLLP_Q} * (x.n - 1)
                                    > FLOOR({ROLLP_Q} * (x.n - 1))
                                    AS BIGINT)
                         AND FLOOR({ROLLP_Q} * (x.n - 1))
                             + CAST({ROLLP_Q} * (x.n - 1)
                                    > FLOOR({ROLLP_Q} * (x.n - 1))
                                    AS BIGINT) < c.hi
                        THEN c.cents END) AS v_c
        FROM cum c JOIN totals x USING (t)
        GROUP BY c.t, x.n
    )
    SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS event_date,
           CAST(n AS BIGINT) AS n_events_7d,
           ROUND((v_f + (v_c - v_f)
                  * ({ROLLP_Q} * (n - 1) - FLOOR({ROLLP_Q} * (n - 1))))
                 / 100.0, 4) AS p95_7d
    FROM picked
    ORDER BY event_date
"""
