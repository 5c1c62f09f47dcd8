"""Warehouse history/maintenance passes: slowly-changing-dimension
interval construction (SCD type 2) from an event log, and a
referential-integrity audit across every foreign-key edge of the star
schema — the jobs that run nightly around the analytic queries.

Scale notes (100 TB): the SCD2 build is the gaps-and-islands pattern
— one window partitioned by the entity key (per-user ordering only;
no global sort, state bounded by one entity's history per task) and
one hash aggregate. The FK audit is a union of LEFT ANTI joins; each
edge's parent side is either a broadcastable dimension or the natural
shuffle key the fact is already organized by, and only per-edge
violation COUNTS survive to the result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table


def _band() -> Column:
    """Spend band for an event value — the SCD2 'attribute' whose
    changes open/close validity intervals. Boundaries are integer
    literals compared against a double, identical in both engines."""
    return (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
    )


_BAND_SQL = (
    "CASE WHEN value < 50 THEN 'low' "
    "WHEN value < 200 THEN 'mid' ELSE 'high' END"
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def scd2_user_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the SCD type-2 history of each user's spend band from the
    raw event log: consecutive same-band events collapse into one
    validity interval [valid_from, valid_to] with its event count.

    Gaps-and-islands: a lag-change marker and its running sum assign a
    segment id inside each user's ordered history, then one aggregate
    per (user, segment). The (ts, event_id) tiebreak makes segment
    boundaries deterministic under equal timestamps. Timestamps are
    rendered as strings so cross-engine type mapping cannot drift.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", _band().alias("band")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(
            F.lag("band").over(w).isNull()
            | (F.lag("band").over(w) != F.col("band")),
            1,
        ).otherwise(0),
    ).withColumn(
        "seg",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("user_id", "seg", "band")
        .agg(
            F.date_format(F.min("ts"), _TS_FMT).alias("valid_from"),
            F.date_format(F.max("ts"), _TS_FMT).alias("valid_to"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("seg").cast("bigint").alias("seg"),
            "band",
            "valid_from",
            "valid_to",
            "n_events",
        )
        .orderBy("user_id", "seg")
    )


#: (edge name, child table, child key, parent table, parent key).
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count referential-integrity violations (orphaned child rows)
    on every FK edge of the star schema — the audit that gates a
    warehouse load. LEFT ANTI join per edge (dimension parents
    broadcast), reduced to counts before the union, so the result is
    always exactly one row per edge regardless of fact size."""
    counts = []
    for edge, child_t, child_k, parent_t, parent_k in _FK_EDGES:
        child = load_table(spark, sf_dir, child_t).select(child_k)
        parent = load_table(spark, sf_dir, parent_t).select(parent_k)
        orphans = child.join(
            parent, child[child_k] == parent[parent_k], "left_anti"
        )
        counts.append(
            orphans.agg(
                F.lit(edge).alias("fk_edge"),
                F.count(F.lit(1)).alias("n_orphans"),
            )
        )
    return reduce(DataFrame.unionAll, counts).orderBy("fk_edge")


QUERIES = {
    "scd2_user_bands": scd2_user_bands,
    "fk_integrity_audit": fk_integrity_audit,
}

ORACLE_SQL = {
    "scd2_user_bands": f"""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   {_BAND_SQL} AS band,
                   CASE WHEN LAG({_BAND_SQL}) OVER w IS NULL
                             OR LAG({_BAND_SQL}) OVER w <> {_BAND_SQL}
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        seg AS (
            SELECT user_id, ts, band,
                   CAST(SUM(chg) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS seg
            FROM marked
        )
        SELECT user_id, seg, band,
               strftime(MIN(ts), '{_TS_FMT_DUCK}') AS valid_from,
               strftime(MAX(ts), '{_TS_FMT_DUCK}') AS valid_to,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM seg
        GROUP BY user_id, seg, band
        ORDER BY user_id, seg
    """,
    "fk_integrity_audit": """
        SELECT * FROM (
            SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
                   CAST(COUNT(*) AS BIGINT) AS n_orphans
            FROM lineitem WHERE l_orderkey NOT IN
                 (SELECT o_orderkey FROM orders)
            UNION ALL
            SELECT 'lineitem.l_partkey->part',
                   CAST(COUNT(*) AS BIGINT)
            FROM lineitem WHERE l_partkey NOT IN
                 (SELECT p_partkey FROM part)
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier',
                   CAST(COUNT(*) AS BIGINT)
            FROM lineitem WHERE l_suppkey NOT IN
                 (SELECT s_suppkey FROM supplier)
            UNION ALL
            SELECT 'orders.o_custkey->customer',
                   CAST(COUNT(*) AS BIGINT)
            FROM orders WHERE o_custkey NOT IN
                 (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'customer.c_nationkey->nation',
                   CAST(COUNT(*) AS BIGINT)
            FROM customer WHERE c_nationkey NOT IN
                 (SELECT n_nationkey FROM nation)
            UNION ALL
            SELECT 'supplier.s_nationkey->nation',
                   CAST(COUNT(*) AS BIGINT)
            FROM supplier WHERE s_nationkey NOT IN
                 (SELECT n_nationkey FROM nation)
            UNION ALL
            SELECT 'nation.n_regionkey->region',
                   CAST(COUNT(*) AS BIGINT)
            FROM nation WHERE n_regionkey NOT IN
                 (SELECT r_regionkey FROM region)
        )
        ORDER BY fk_edge
    """,
}


def cdc_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics (the nightly CDC apply): fold the latest
    order per customer into the customer dimension — WHEN MATCHED →
    'update' rows carrying the new last-order attributes, WHEN NOT
    MATCHED BY SOURCE → 'unchanged' snapshot rows, WHEN NOT MATCHED
    BY TARGET → 'insert' rows for changelog keys absent from the
    snapshot (0 on this corpus — the FK audit proves orders ⊆
    customer — but the branch is real and unit-tested on synthetic
    orphans).

    Plan: the changelog collapses to one row per key with an argmax
    (MAX of a (date, key, …) struct — map-side combinable, no window
    sort), then ONE full-outer equi-join on the dimension key decides
    all three MERGE branches. Both sides shuffle on the same key, so
    at 100 TB this is a single co-partitioned exchange; no branch
    materializes more than its own rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    latest = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.struct("o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice")
            ).alias("m")
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("m.o_orderkey").alias("last_orderkey"),
            F.col("m.o_orderstatus").alias("last_status"),
            F.round(F.col("m.o_totalprice"), 2).alias("last_price"),
        )
    )
    merged = cust.join(
        latest, cust["c_custkey"] == latest["custkey"], "full_outer"
    )
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "unchanged")
        .otherwise("update")
    )
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("custkey")).alias("custkey"),
        action.alias("action"),
        "last_orderkey",
        "last_status",
        "last_price",
    ).orderBy("custkey")


QUERIES["cdc_upsert_customers"] = cdc_upsert_customers

ORACLE_SQL["cdc_upsert_customers"] = """
    WITH latest AS (
        SELECT o_custkey AS custkey,
               o_orderkey AS last_orderkey,
               o_orderstatus AS last_status,
               ROUND(o_totalprice, 2) AS last_price
        FROM (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        WHERE rn = 1
    )
    SELECT COALESCE(c.c_custkey, l.custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN l.custkey IS NULL THEN 'unchanged'
                ELSE 'update' END AS action,
           l.last_orderkey, l.last_status, l.last_price
    FROM customer c FULL OUTER JOIN latest l
      ON c.c_custkey = l.custkey
    ORDER BY custkey
"""


def scd2_point_in_time_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time (PIT) lookup against the SCD2 band history: every
    purchase event joins the band interval that was CURRENT at its
    event time — the temporal-dimension join every warehouse with
    slowly-changing dimensions runs (feature stores call it the
    point-in-time-correct join; ``asof.py`` is its nearest-event
    cousin, this is exact interval membership).

    Scale shape: an equi-join on ``user_id`` with the interval test
    applied inside the join — each user's history rows are few, so
    the pair space per user is events × segments of THAT user, never
    cross-user. Interval bounds compare as ``yyyy-MM-dd HH:mm:ss``
    strings, whose lexicographic order IS chronological order —
    engine-identical with zero timestamp-type drift. Boundary note:
    a purchase whose ts equals the shared boundary of two segments
    (band flip within one timestamp) matches both intervals; the
    predicate is identical in the oracle, so the (deterministic)
    double-count cannot diverge.

    Returns (band, n_purchases, value_cents) ordered by band.
    """
    bands = scd2_user_bands(spark, sf_dir).select(
        "user_id", "band", "valid_from", "valid_to"
    )
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("pts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        p.join(
            bands,
            (p["user_id"] == bands["user_id"])
            & (F.col("pts") >= F.col("valid_from"))
            & (F.col("pts") <= F.col("valid_to")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("value_cents"),
        )
        .orderBy("band")
    )


QUERIES["scd2_point_in_time_purchases"] = scd2_point_in_time_purchases

ORACLE_SQL["scd2_point_in_time_purchases"] = f"""
    WITH hist AS ({ORACLE_SQL["scd2_user_bands"]})
    SELECT h.band AS band,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events e
    JOIN hist h ON h.user_id = e.user_id
               AND strftime(e.ts, '{{duck_fmt}}') >= h.valid_from
               AND strftime(e.ts, '{{duck_fmt}}') <= h.valid_to
    WHERE e.event_type = 'purchase'
    GROUP BY h.band
    ORDER BY band
""".replace("{duck_fmt}", _TS_FMT_DUCK)
