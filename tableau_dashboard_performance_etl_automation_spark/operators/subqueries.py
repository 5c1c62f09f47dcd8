"""Correlated-subquery and disjunctive-predicate query shapes —
the TPC-H Q2 / Q4 / Q9 / Q19 analogs, adapted to the testdata schema
(no ``partsupp`` table, no ``l_commitdate``/``l_shipmode`` columns):
the *shape* each exercises — scalar-min decorrelation, EXISTS
semi-join, multi-dim profit rollup, OR-of-conjunctions residual — is
the point, not the literal TPC-H predicate.

Reference parity: the reference (tabjolt_email.py) delegates every
query to Vertica, whose planner decorrelates these shapes the same
way; a migrating user writing them against this engine gets the
equivalent Spark plans below.

Scale notes (100 TB):

- Q2 shape: the naive correlated form re-scans lineitem per part; the
  decorrelated rewrite here is ONE aggregation over lineitem
  (map-side-combinable MIN(struct) argmax per part) — no join-back,
  no window sort. Supplier (dimension-class) broadcasts; the
  part-name join shuffles on partkey, the natural key.
- Q4 shape: EXISTS becomes LEFT SEMI — Spark dedups build-side keys
  in the hash table, so a 7-lineitem order costs one probe, and the
  returnflag filter is pushed to the lineitem scan.
- Q9 shape: profit = revenue − cost in exact integer units so the
  nation×year SUM is reduction-order-independent (hash-identical
  across partitionings); dims broadcast, fact-fact edges shuffle on
  natural keys.
- Q19 shape: the OR-of-conjunctions stays a RESIDUAL on one equi-join
  on partkey — never a cross join; the shared qty/size envelope
  (qty ≤ 30, size ≤ 15) is pushed to both scans as a bounding filter,
  the classic disjunction-envelope trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.operators.starjoins import (
    REV_UNITS_SQL,
    rev_units,
)


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (min-cost supplier per part), decorrelated.

    TPC-H Q2's correlated ``ps_supplycost = (SELECT MIN …)`` subquery,
    re-expressed over lineitem (the part↔supplier bridge this schema
    has): for each large part (p_size ≥ 40), the supplier with the
    LOWEST total observed spend (exact cents), tiebreak lowest
    suppkey. One aggregation + one argmax — the decorrelated plan a
    good optimizer produces from the subquery form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    sup = load_table(spark, sf_dir, "supplier")

    # semi-join pushdown below the aggregate: the final inner join
    # keeps only groups whose l_partkey survives the p_size filter,
    # and group membership is a pure function of the group key — so
    # dropping non-qualifying rows BEFORE the (partkey, suppkey)
    # aggregate leaves every surviving group's sum untouched while
    # the aggregate (and its shuffle) processes only the selected
    # slice of the fact instead of all of it.
    spend = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("spend_cents")
        )
    )
    # argmax: MIN(struct(spend, suppkey)) orders lexicographically —
    # exactly "min spend, tiebreak min suppkey" — and combines
    # map-side, unlike a join-back or a window sort
    best = spend.groupBy("l_partkey").agg(
        F.min(F.struct("spend_cents", "l_suppkey")).alias("m")
    )
    return (
        best.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("m.l_suppkey").alias("s_suppkey"),
            F.col("m.spend_cents").alias("spend_cents"),
        )
        .join(part.select("p_partkey", "p_name", "p_size"), "p_partkey")
        .join(F.broadcast(sup.select("s_suppkey", "s_name")), "s_suppkey")
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            "s_suppkey",
            "s_name",
            (F.col("spend_cents") / 100.0).alias("min_spend"),
        )
        .orderBy("p_partkey")
    )


def priority_return_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority counts for orders that had at least
    one returned line (EXISTS → LEFT SEMI) inside a one-year window.

    The semi-join probes a hash table of distinct returned orderkeys;
    the returnflag filter reaches the lineitem scan (pushdown), and
    the date window reaches the orders scan.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per order-year for one
    part family (p_name LIKE '%widget%').

    profit_units = revenue_units − cost_units, both exact BIGINTs
    (cents-scale), so the big SUM is associative/commutative and
    hash-identical across engines; the single float op is the final
    display division. supplier+nation broadcast; lineitem⋈part and
    lineitem⋈orders shuffle on their natural keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sup_nat = F.broadcast(
        sup.join(
            nation, sup.s_nationkey == nation.n_nationkey
        ).select("s_suppkey", "n_name")
    )
    # rev_units is cents × discount-percent (1e4 scale); put cost on
    # the same scale: cents × 100 × quantity, so the subtraction is
    # unit-consistent and stays integer
    cost_units = (
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.lit(100)
        * F.round(F.col("l_quantity")).cast("bigint")
    )
    return (
        li.join(part.select("p_partkey", "p_retailprice"),
                li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup_nat, li.l_suppkey == F.col("s_suppkey"))
        .withColumn("profit_units", rev_units() - cost_units)
        .groupBy("n_name", "o_year")
        .agg(
            (F.sum("profit_units") / 10000.0).alias("profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("n_name", F.col("o_year").desc())
    )


def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue from an OR of three (brand, size, quantity)
    conjunctions — the disjunctive-residual join.

    The join stays a single equi-join on partkey; the OR is a residual
    filter on the joined row. The disjunction's shared envelope
    (l_quantity ≤ 30, p_size ≤ 15) is applied to each scan
    separately — the bounding-box pushdown a planner derives by
    factoring the OR.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(branch)
        .groupBy("p_brand")
        .agg(
            (F.sum(rev_units()) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose total line value exceeds 1.4× the
    average part's — the HAVING-against-a-scalar-aggregate-subquery
    pattern (value concentration).

    The scalar is a 1-row broadcast (total + part count), so the
    comparison is a residual on the grouped rows — no second lineitem
    scan, no join-back. The threshold is RELATIVE (×avg), so the
    query means the same thing at every scale factor; the comparison
    ``v·n·10 > total·14`` is pure integer arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "value_cents"
        )
    )
    totals = F.broadcast(
        pv.agg(
            F.sum("value_cents").alias("total_cents"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    return (
        pv.crossJoin(totals)
        .filter(
            F.col("value_cents") * F.col("n_parts") * 10
            > F.col("total_cents") * 14
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100.0).alias("part_value"),
            F.round(
                F.col("value_cents") / F.col("total_cents"), 6
            ).alias("value_share"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped an outsized volume of one part
    family ('red' parts) — an aggregate subquery feeding a semi-join
    chain into the supplier dimension.

    lineitem⋈part('red') aggregates per supplier; the 1-row broadcast
    average makes the cutoff relative (>1.1× the mean supplier's
    red-part volume); the surviving suppkey set then joins supplier +
    nation (both dimension-sized, broadcast). The fact table is
    scanned once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")
    per_sup = (
        li.join(red.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias(
                "red_qty"
            )
        )
    )
    totals = F.broadcast(
        per_sup.agg(
            F.sum("red_qty").alias("total_qty"),
            F.count(F.lit(1)).alias("n_sup"),
        )
    )
    heavy = (
        per_sup.crossJoin(totals)
        .filter(
            F.col("red_qty") * F.col("n_sup") * 10 > F.col("total_qty") * 11
        )
        .select(F.col("l_suppkey").alias("s_suppkey"), "red_qty")
    )
    return (
        heavy.join(F.broadcast(sup), "s_suppkey")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name", "red_qty")
        .orderBy(F.col("red_qty").desc(), "s_suppkey")
    )


#: Q21 lateness horizon: a line shipped more than this many days after
#: its order date counts as late (this schema has no l_commitdate /
#: l_receiptdate; the order-relative horizon keeps Q21's semantics).
LATE_DAYS = 60


def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting), decorrelated.

    TPC-H Q21's EXISTS (another supplier in the order) + NOT EXISTS
    (another LATE supplier in the order) pair, re-expressed as one
    per-(order, supplier) aggregate followed by one per-order
    aggregate — counting suppliers and late suppliers per order
    replaces both correlated probes, which is the decorrelation a good
    planner applies. A supplier "kept the order waiting" when it is
    late in a finished multi-supplier order where nobody else is late.

    Scale shape: lineitem↔orders is the only fact-fact edge (shuffle
    on orderkey, the natural key); both aggregates reuse that
    partitioning (orderkey prefix / orderkey — AQE reuses the
    exchange); supplier and nation broadcast. No window over the
    fact, no correlated re-scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    flagged = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAY")
        )
        .cast("int")
        .alias("is_late"),
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    # per-order totals are window sums over the SAME l_orderkey
    # partitioning the first aggregate established — one pass, no
    # groupBy+join-back (whose divergent partial aggregate re-ran the
    # whole li⋈orders+agg subtree and added a join exchange)
    ow = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("n_supps", F.count(F.lit(1)).over(ow))
        .withColumn("n_late_supps", F.sum("supp_late").over(ow))
        .filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(F.broadcast(sup), "s_suppkey")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(100)
    )


QUERIES = {
    "min_cost_supplier": min_cost_supplier,
    "priority_return_orders": priority_return_orders,
    "nation_year_profit": nation_year_profit,
    "disjunctive_band_revenue": disjunctive_band_revenue,
    "important_parts_value": important_parts_value,
    "excess_stock_suppliers": excess_stock_suppliers,
    "sole_late_suppliers": sole_late_suppliers,
}

ORACLE_SQL = {
    "min_cost_supplier": """
        WITH spend AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS spend_cents
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT l_partkey, l_suppkey, spend_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_partkey
                       ORDER BY spend_cents, l_suppkey
                   ) AS rn
            FROM spend
        )
        SELECT b.l_partkey AS p_partkey, p.p_name, p.p_size,
               b.l_suppkey AS s_suppkey, s.s_name,
               b.spend_cents / 100.0 AS min_spend
        FROM best b
        JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size >= 40
        JOIN supplier s ON s.s_suppkey = b.l_suppkey
        WHERE b.rn = 1
        ORDER BY p_partkey
    """,
    "priority_return_orders": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "nation_year_profit": f"""
        SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({REV_UNITS_SQL}
                        - CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * 100
                          * CAST(ROUND(l.l_quantity) AS BIGINT))
                    AS BIGINT) / 10000.0 AS profit,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE '%widget%'
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, YEAR(o.o_orderdate)
        ORDER BY n.n_name, o_year DESC
    """,
    "disjunctive_band_revenue": f"""
        SELECT p_brand,
               CAST(SUM({REV_UNITS_SQL}) AS BIGINT) / 10000.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
               AND p.p_size BETWEEN 1 AND 5)
           OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#15' AND l.l_quantity BETWEEN 20 AND 30
               AND p.p_size BETWEEN 1 AND 15)
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "important_parts_value": """
        WITH pv AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM lineitem
            GROUP BY l_partkey
        ),
        t AS (
            SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM pv
        )
        SELECT l_partkey AS p_partkey,
               value_cents / 100.0 AS part_value,
               ROUND(value_cents * 1.0 / total_cents, 6) AS value_share
        FROM pv, t
        WHERE value_cents * n_parts * 10 > total_cents * 14
        ORDER BY part_value DESC, p_partkey
    """,
    "excess_stock_suppliers": """
        WITH per_sup AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                       AS red_qty
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_name LIKE '%red%'
            GROUP BY l_suppkey
        ),
        t AS (
            SELECT CAST(SUM(red_qty) AS BIGINT) AS total_qty,
                   CAST(COUNT(*) AS BIGINT) AS n_sup
            FROM per_sup
        )
        SELECT ps.l_suppkey AS s_suppkey, s.s_name, n.n_name, ps.red_qty
        FROM per_sup ps
        CROSS JOIN t
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE ps.red_qty * t.n_sup * 10 > t.total_qty * 11
        ORDER BY ps.red_qty DESC, s_suppkey
    """,
    "sole_late_suppliers": f"""
        WITH flagged AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate >
                             o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                        THEN 1 ELSE 0 END AS is_late
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        per_supp AS (
            SELECT l_orderkey, l_suppkey, MAX(is_late) AS supp_late
            FROM flagged GROUP BY l_orderkey, l_suppkey
        ),
        per_order AS (
            SELECT l_orderkey, COUNT(*) AS n_supps,
                   SUM(supp_late) AS n_late_supps
            FROM per_supp GROUP BY l_orderkey
        )
        SELECT ps.l_suppkey AS s_suppkey, s.s_name, n.n_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_supp ps
        JOIN per_order po ON po.l_orderkey = ps.l_orderkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE ps.supp_late = 1 AND po.n_supps > 1 AND po.n_late_supps = 1
        GROUP BY ps.l_suppkey, s.s_name, n.n_name
        ORDER BY numwait DESC, s_suppkey
        LIMIT 100
    """,
}
