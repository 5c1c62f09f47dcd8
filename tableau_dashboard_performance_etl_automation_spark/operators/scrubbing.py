"""PII / denylist scrubbing over the ``documents`` corpus — the
redaction pass every training-data pipeline runs before tokenization.

Three pattern families, applied in one projection:

- EMAIL / PHONE — classic PII, replaced with ``<PII>``;
- a term DENYLIST (word-boundary alternation) — contamination or
  policy strings, replaced with ``<TERM>``.

Scale design (100 TB): the whole pass is a narrow per-row projection
(regexp_count + regexp_replace + md5) — no shuffle, no UDF, fully
inside whole-stage codegen; it pipelines with whatever scan feeds it
and the parquet reader prunes to (doc_id, text). The corpus here has
no real PII, so the email/phone patterns exercise the zero-match
path (pytest covers synthetic hits); the denylist terms DO occur,
making the driver's oracle row non-trivial.

Pattern language is the RE2/Java-regex common subset (character
classes, bounded repeats, word boundaries, alternation — no
lookaround, no backreferences) so Spark (Java regex) and the DuckDB
oracle (RE2) match identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table

#: RE2-and-Java-safe patterns (no lookaround / backreferences).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
DENYLIST_RE = r"\b(spark|vector|stream)\b"

PII_TOKEN = "<PII>"
TERM_TOKEN = "<TERM>"


def scrubbed(text: Column) -> Column:
    """The redaction projection itself — email/phone → <PII>, then
    denylist terms → <TERM> — as a reusable Column expression, so a
    write-the-clean-corpus job and the audit query share one
    definition."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, PII_TOKEN),
            PHONE_RE,
            PII_TOKEN,
        ),
        DENYLIST_RE,
        TERM_TOKEN,
    )


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document scrub accounting: match counts per pattern family,
    the redacted text's md5 fingerprint, and the length delta.

    The fingerprint (not the redacted text itself) is the output —
    at 100 TB you audit the scrub with a 16-byte column, not by
    hauling the corpus through the result set; the scrubbed corpus
    itself would be written table-to-table by the same projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    clean = scrubbed(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
            .cast("bigint")
            .alias("n_email"),
            F.regexp_count(F.col("text"), F.lit(PHONE_RE))
            .cast("bigint")
            .alias("n_phone"),
            F.regexp_count(F.col("text"), F.lit(DENYLIST_RE))
            .cast("bigint")
            .alias("n_denylist"),
            F.md5(clean).alias("clean_hash"),
            (F.length(clean) - F.length("text"))
            .cast("bigint")
            .alias("len_delta"),
        )
        .orderBy("doc_id")
    )


QUERIES = {"pii_scrub_stats": pii_scrub_stats}

# DuckDB single-quoted literals pass backslashes through verbatim,
# so the Python pattern strings embed as-is — no escape doubling.
_SCRUB_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{EMAIL_RE}', '{PII_TOKEN}', 'g'), "
    f"'{PHONE_RE}', '{PII_TOKEN}', 'g'), "
    f"'{DENYLIST_RE}', '{TERM_TOKEN}', 'g')"
)

ORACLE_SQL = {
    "pii_scrub_stats": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
                   AS n_phone,
               CAST(len(regexp_extract_all(text, '{DENYLIST_RE}')) AS BIGINT)
                   AS n_denylist,
               md5({_SCRUB_SQL}) AS clean_hash,
               CAST(length({_SCRUB_SQL}) - length(text) AS BIGINT)
                   AS len_delta
        FROM documents
        ORDER BY doc_id
    """,
}


#: k-anonymity threshold: a quasi-identifier cell backed by fewer
#: than this many distinct users is a re-identification risk and gets
#: flagged for suppression.
K_ANON = 5


def small_cell_suppression_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-anonymity audit over the events stream: for every
    quasi-identifier cell — (event_type, Monday=0 weekday, value decade) —
    count the distinct users behind it and flag cells below
    ``K_ANON`` for suppression. This is the other half of the privacy
    pass next to the PII regex scrub: redaction removes direct
    identifiers, small-cell suppression catches combinations of
    innocuous attributes that single out individuals (the standard
    release-audit rule in k-anonymity / statistical-disclosure
    control).

    Scale shape: one hash aggregate over a narrow projection — cell
    cardinality is bounded by |types|·7·|decades| regardless of event
    volume, and COUNT(DISTINCT user) partial-aggregates per cell.
    The decade binning is exact integer FLOOR division (both engines
    floor identically on non-negative values).

    Returns (event_type, dow, value_decade, n_users, n_events,
    suppress) ordered by cell.
    """
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            # Monday=0 weekday (Spark F.weekday == DuckDB isodow-1)
            F.weekday("ts").cast("int").alias("dow"),
            F.floor(F.col("value") / 10).cast("bigint").alias(
                "value_decade"
            ),
            "user_id",
        )
        .groupBy("event_type", "dow", "value_decade")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return cells.select(
        "event_type",
        "dow",
        "value_decade",
        "n_users",
        "n_events",
        (F.col("n_users") < K_ANON).cast("int").alias("suppress"),
    ).orderBy("event_type", "dow", "value_decade")


QUERIES["small_cell_suppression_report"] = small_cell_suppression_report

ORACLE_SQL["small_cell_suppression_report"] = f"""
    SELECT event_type,
           CAST(isodow(ts) - 1 AS INTEGER) AS dow,
           CAST(FLOOR(value / 10) AS BIGINT) AS value_decade,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) < {K_ANON} AS INTEGER)
               AS suppress
    FROM events
    GROUP BY event_type, dow, value_decade
    ORDER BY event_type, dow, value_decade
"""


#: Right-to-erasure denylist: every ERASURE_MOD-th customer key — the
#: deterministic stand-in for an uploaded deletion-request list.
ERASURE_MOD = 20


def customer_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-cascade accounting for a right-to-erasure (GDPR
    art. 17) batch: given a customer denylist, how many rows would be
    purged from each table in the customer→orders→lineitem cascade,
    and what share of each table that is — the dry-run report a
    governance pipeline emits BEFORE running the destructive pass.

    The denylist here is the deterministic ``c_custkey %
    ERASURE_MOD == 0`` set (a stand-in for an uploaded request
    file; swap the filter for a broadcast semi-join against the real
    list). Cascade joins are the star schema's own keys: orders
    filters on ``o_custkey`` (pushed to the scan — no join needed at
    the orders level), lineitem semi-joins the purged order keys on
    ``l_orderkey`` — hash-partitioned both sides, co-located, and at
    100 TB the purged-orders side is ~1/MOD of orders so a runtime
    bloom/broadcast applies. Totals come from per-table counts; all
    integers, one final division per row."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    purged_cust = customer.filter(
        F.col("c_custkey") % ERASURE_MOD == 0
    ).select("c_custkey")
    purged_orders = orders.join(
        purged_cust,
        orders.o_custkey == purged_cust.c_custkey,
        "left_semi",
    ).select("o_orderkey")
    purged_li = lineitem.join(
        purged_orders,
        lineitem.l_orderkey == purged_orders.o_orderkey,
        "left_semi",
    )

    def _row(name: str, purged: DataFrame, total: DataFrame) -> DataFrame:
        return purged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purged")
        ).crossJoin(
            F.broadcast(
                total.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
            )
        ).select(
            F.lit(name).alias("table_name"), "n_purged", "n_total"
        )

    out = (
        _row("customer", purged_cust, customer)
        .unionByName(_row("orders", purged_orders, orders))
        .unionByName(_row("lineitem", purged_li, lineitem))
    )
    return out.select(
        "table_name",
        "n_purged",
        "n_total",
        F.round(F.col("n_purged") * 100.0 / F.col("n_total"), 6).alias(
            "purge_pct"
        ),
    ).orderBy("table_name")


QUERIES["customer_erasure_audit"] = customer_erasure_audit

ORACLE_SQL["customer_erasure_audit"] = f"""
    WITH pc AS (
        SELECT c_custkey FROM customer
        WHERE c_custkey % {ERASURE_MOD} = 0
    ),
    po AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM pc)
    ),
    rows_ AS (
        SELECT 'customer' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM pc) AS n_purged,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM po),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM po)),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
    )
    SELECT table_name, n_purged, n_total,
           ROUND(n_purged * 100.0 / n_total, 6) AS purge_pct
    FROM rows_
    ORDER BY table_name
"""


# ---------------------------------------------------------------------------
# Differential privacy: Laplace-noised release counts
# ---------------------------------------------------------------------------

#: ε for the Laplace mechanism (sensitivity of a per-day count under
#: add/remove-one-EVENT neighboring is 1, so scale b = 1/ε).
DP_EPSILON = 1.0

#: Hex digits of the md5 uniform driving the noise draw (48 bits).
_DP_HEX = 12


def dp_noisy_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the daily purchase-count
    series via the Laplace mechanism: ``noisy = n + Lap(1/ε)``, noise
    drawn by inverse-CDF from a deterministic md5 uniform keyed on
    the release cell (the day), so both engines — and any re-run —
    draw the identical noise (seeded-release discipline: the noise
    must be fixed per release or repeated queries average it away).

    Inverse CDF: with u ∈ (0,1), p = u − ½,
    ``noise = −b · sign(p) · ln(1 − 2·|p|)``.  The uniform is
    ``(fold48 + 0.5) / 16^12`` — the +0.5 keeps u strictly inside
    (0,1) so the log argument never hits 0.  ``n_true`` stays in the
    output for the calibration audit (|noisy − true| quantiles are
    how a release is sized); the released column is ``noisy_count``.

    Scale shape: one hash aggregate onto the bounded day domain, then
    a per-row noise projection — the mechanism costs nothing beyond
    the count query itself.  ROUND(...,4) keeps the ln() within
    cross-engine double parity (repo-wide float discipline).

    **DETERMINISM/PARITY MOCK — NOT A PRIVATE RELEASE.** As
    implemented this provides NO privacy: the noise is derived
    deterministically from ``md5(day)`` with no secret salt, so
    anyone can recompute and subtract it exactly, and ``n_true`` is
    emitted alongside the noised value anyway. The query exists to
    benchmark the MECHANISM'S ARITHMETIC (inverse-CDF Laplace,
    sensitivity scaling) bit-identically across engines. A real
    release needs a secret, per-release random seed and must DROP
    the true-count column."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "n_true")
    )
    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_bigint,
    )

    u = (
        md5_hex_bigint(F.md5(F.col("day")), 1, _DP_HEX).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**_DP_HEX))
    p = u - F.lit(0.5)
    b = F.lit(1.0 / DP_EPSILON)
    noise = (
        -b
        * F.signum(p)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(p))
    )
    return counts.select(
        "day",
        "n_true",
        F.round(F.col("n_true") + noise, 4).alias("noisy_count"),
    ).orderBy("day")


QUERIES["dp_noisy_daily_counts"] = dp_noisy_daily_counts


def _dp_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_bigint_sql,
    )

    fold = md5_hex_bigint_sql("md5(day)", 1, _DP_HEX)
    return f"""
        WITH counts AS (
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_true
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        withu AS (
            SELECT day, n_true,
                   (CAST({fold} AS DOUBLE) + 0.5)
                       / CAST(power(16.0, {_DP_HEX}) AS DOUBLE) AS u
            FROM counts
        )
        SELECT day, n_true,
               ROUND(n_true + (
                   -(1.0 / {DP_EPSILON}) * sign(u - 0.5)
                   * ln(1.0 - 2.0 * abs(u - 0.5))
               ), 4) AS noisy_count
        FROM withu
        ORDER BY day
    """


ORACLE_SQL["dp_noisy_daily_counts"] = _dp_oracle()


#: User-level DP: each user's counted events are capped at this many
#: (contribution bounding). One user then shifts the whole released
#: histogram by at most DP_USER_CAP rows (L1 sensitivity), so Laplace
#: noise of scale DP_USER_CAP/ε per cell gives USER-level ε-DP —
#: the stronger adjacency (add/remove a whole user, not one event).
DP_USER_CAP = 20


def dp_user_level_daily_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User-level differentially-private daily purchase counts:
    contribution bounding (keep each user's ``DP_USER_CAP`` earliest
    purchase events — deterministic (ts, event_id) order) followed by
    the Laplace mechanism at scale ``DP_USER_CAP/ε``. The companion
    of :func:`dp_noisy_daily_counts` under the stronger user-level
    adjacency: without the cap a single heavy user makes the
    sensitivity — and therefore the noise — unbounded; with it the
    noise scale is what hiding any one user WOULD cost under a real
    mechanism.

    **DETERMINISM/PARITY MOCK — NOT A PRIVATE RELEASE** (same caveat
    as :func:`dp_noisy_daily_counts`): the seeded ``md5(day)`` noise
    is publicly recomputable and ``n_capped`` is emitted in the
    output, so no privacy is provided as written. What this query
    demonstrates for real is the CONTRIBUTION-BOUNDING plan shape
    and the sensitivity arithmetic; a real release needs a secret
    per-release seed and must drop the true-count column.

    Scale shape: the cap is ``row_number ≤ C`` over
    ``Window.partitionBy(user_id)`` — Spark's WindowGroupLimit keeps
    a C-row heap per user map-side (no per-user full sort
    materializes); then one hash aggregate onto the bounded day
    domain and the same seeded md5 inverse-CDF noise draw as the
    event-level release (deterministic per release cell)."""
    from pyspark.sql.window import Window

    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_bigint,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DP_USER_CAP)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_capped"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "n_capped"
        )
    )
    u = (
        md5_hex_bigint(F.md5(F.col("day")), 1, _DP_HEX).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**_DP_HEX))
    p = u - F.lit(0.5)
    b = F.lit(float(DP_USER_CAP) / DP_EPSILON)
    noise = -b * F.signum(p) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(p))
    return capped.select(
        "day",
        "n_capped",
        F.round(F.col("n_capped") + noise, 4).alias("noisy_count"),
    ).orderBy("day")


QUERIES["dp_user_level_daily_counts"] = dp_user_level_daily_counts


def _dp_user_oracle() -> str:
    from tableau_dashboard_performance_etl_automation_spark.functions.hashing import (
        md5_hex_bigint_sql,
    )

    fold = md5_hex_bigint_sql("md5(day)", 1, _DP_HEX)
    return f"""
        WITH capped AS (
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
            FROM (
                SELECT ts,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn <= {DP_USER_CAP}
        ),
        counts AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_capped
            FROM capped GROUP BY day
        ),
        withu AS (
            SELECT day, n_capped,
                   (CAST({fold} AS DOUBLE) + 0.5)
                       / CAST(power(16.0, {_DP_HEX}) AS DOUBLE) AS u
            FROM counts
        )
        SELECT day, n_capped,
               ROUND(n_capped + (
                   -({DP_USER_CAP}.0 / {DP_EPSILON}) * sign(u - 0.5)
                   * ln(1.0 - 2.0 * abs(u - 0.5))
               ), 4) AS noisy_count
        FROM withu
        ORDER BY day
    """


ORACLE_SQL["dp_user_level_daily_counts"] = _dp_user_oracle()


#: k-anonymity threshold the generalization ladder must satisfy.
K_ANON_TARGET = 5

#: Generalization levels, coarsest-last: each drops the most
#: identifying quasi-identifier of the previous level. Level 0:
#: (nation, segment, $1000-wide balance bucket); level 1: (nation, segment);
#: level 2: (segment) — the classic full-domain generalization
#: lattice walked bottom-up until every cell reaches k.
KANON_LEVELS = ("nation_segment_bal1k", "nation_segment", "segment")


def kanon_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full-domain generalization for k-anonymity over the customer
    quasi-identifiers: evaluate each generalization level's cell-size
    profile and mark the FIRST level whose minimum cell reaches
    ``K_ANON_TARGET`` — the level a release pipeline would publish
    at. One row per level: cells, min/max cell size, rows in
    sub-k cells, and the chosen flag. This is the algorithmic step
    ABOVE the suppression audit (`small_cell_suppression_report`):
    instead of flagging violating cells, it finds the coarsening that
    eliminates them.

    Scale shape: one hash aggregate per level onto that level's
    bounded QI domain (map-side combinable; rows never leave the
    executors), then a bounded |levels|-row comparison. The
    balance-bucket QI (``bal_k = floor(cents/100000)``, i.e. fixed
    $1000-wide buckets — NOT deciles) derives from exact integer
    cents — identical binning in both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.round(F.col("c_acctbal") * 100).cast("bigint") / 100000))
        .cast("int")
        .alias("bal_k"),
    )
    qi_cols = {
        "nation_segment_bal1k": ["c_nationkey", "c_mktsegment", "bal_k"],
        "nation_segment": ["c_nationkey", "c_mktsegment"],
        "segment": ["c_mktsegment"],
    }
    legs = []
    for i, level in enumerate(KANON_LEVELS):
        cells = cust.groupBy(*qi_cols[level]).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        legs.append(
            cells.agg(
                F.lit(i).alias("level"),
                F.lit(level).alias("level_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                F.min("n").cast("bigint").alias("min_cell"),
                F.max("n").cast("bigint").alias("max_cell"),
                F.sum(
                    F.when(F.col("n") < K_ANON_TARGET, F.col("n")).otherwise(
                        0
                    )
                )
                .cast("bigint")
                .alias("rows_below_k"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    from pyspark.sql.window import Window

    w = Window.orderBy("level").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # chosen = first satisfying level: satisfies AND no earlier level
    # satisfied (a 3-row window — bounded by the level ladder, not data)
    satisfied = (F.col("min_cell") >= K_ANON_TARGET).cast("int")
    return (
        out.withColumn("ok", satisfied)
        .withColumn(
            "chosen",
            (
                (F.col("ok") == 1)
                & (
                    F.coalesce(F.max("ok").over(w), F.lit(0)) == 0
                )
            ).cast("int"),
        )
        .select(
            "level",
            "level_name",
            "n_cells",
            "min_cell",
            "max_cell",
            "rows_below_k",
            "chosen",
        )
        .orderBy("level")
    )


QUERIES["kanon_generalization_ladder"] = kanon_generalization_ladder

ORACLE_SQL["kanon_generalization_ladder"] = f"""
    WITH cust AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                    / 100000) AS INTEGER) AS bal_k
        FROM customer
    ),
    l0 AS (
        SELECT 0 AS level, 'nation_segment_bal1k' AS level_name,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MIN(n) AS BIGINT) AS min_cell,
               CAST(MAX(n) AS BIGINT) AS max_cell,
               CAST(SUM(CASE WHEN n < {K_ANON_TARGET} THEN n ELSE 0 END)
                    AS BIGINT) AS rows_below_k
        FROM (SELECT COUNT(*) AS n FROM cust
              GROUP BY c_nationkey, c_mktsegment, bal_k)
    ),
    l1 AS (
        SELECT 1, 'nation_segment', CAST(COUNT(*) AS BIGINT),
               CAST(MIN(n) AS BIGINT), CAST(MAX(n) AS BIGINT),
               CAST(SUM(CASE WHEN n < {K_ANON_TARGET} THEN n ELSE 0 END)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM cust
              GROUP BY c_nationkey, c_mktsegment)
    ),
    l2 AS (
        SELECT 2, 'segment', CAST(COUNT(*) AS BIGINT),
               CAST(MIN(n) AS BIGINT), CAST(MAX(n) AS BIGINT),
               CAST(SUM(CASE WHEN n < {K_ANON_TARGET} THEN n ELSE 0 END)
                    AS BIGINT)
        FROM (SELECT COUNT(*) AS n FROM cust GROUP BY c_mktsegment)
    ),
    ladder AS (
        SELECT * FROM l0 UNION ALL SELECT * FROM l1
        UNION ALL SELECT * FROM l2
    )
    SELECT level, level_name, n_cells, min_cell, max_cell,
           rows_below_k,
           CAST(
               min_cell >= {K_ANON_TARGET}
               AND COALESCE(MAX(CASE WHEN min_cell >= {K_ANON_TARGET}
                                     THEN 1 ELSE 0 END) OVER (
                   ORDER BY level
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) = 0 AS INTEGER) AS chosen
    FROM ladder
    ORDER BY level
"""
