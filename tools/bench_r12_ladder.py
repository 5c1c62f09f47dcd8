"""Round-12 fact-ladder A/B probe (r11 VERDICT items 3 and 4).

Measures, on the bench_factscale replica ladder (facts grow, dims
don't — the realistic 100 TB direction):

1. The five round-11 window-fold rewrites against their round-10
   totals-rejoin shapes (`event_funnel`, `session_funnel_conversion`,
   `value_robust_outlier_rates`, `rolling_p95_value_7d`,
   `daily_value_ks_test`). The fold's claim is "the rejoin
   re-executes the corpus-sized subtree at scale"; sf0.1 could not
   arbitrate it (overhead-bound cells), the ladder can. The OLD
   shapes are embedded verbatim from cd468e2 (round-10 HEAD) — they
   are measurement fixtures only, never registered.
2. `fk_integrity_audit`: the parked one-fact-scan fusion (three
   lineitem FK edges checked in one scan + chained joins against
   distinct parent keys) vs the shipped per-edge anti-joins. Rejected
   at sf0.1 in r11 (1.95 → 2.68 s: 7 parent distincts outweigh 2
   saved scans of an 11 MB table); the fusion's case is a fact table
   whose scan dominates — exactly what the ladder grows.
3. `preferSortMergeJoin=false` (+ AQE SHJ local-map threshold) on the
   shuffle-join-bearing probe queries — the guide §9 knob the r11
   A/Bs could not resolve locally (three contradictory sub-second
   runs).

Every variant pair runs INTERLEAVED (A,B,A,B — min per variant) so
box drift lands on both sides. Old/new result equality is asserted
on the 1× corpus before any timing (collected sorted rows).

Usage::

    python tools/bench_r12_ladder.py [base_sf_dir] [factor ...]

Output: one JSON line per (factor, experiment) plus a final summary
line. Replicas build under /tmp/tdpe-factscale (shared with
bench_factscale.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench_factscale import build_scaled  # noqa: E402

from tableau_dashboard_performance_etl_automation_spark.catalog import (  # noqa: E402
    load_table,
)
from tableau_dashboard_performance_etl_automation_spark.operators.analytics import (  # noqa: E402
    _grouped_median_parts,
    with_session_ids,
)
from tableau_dashboard_performance_etl_automation_spark.operators.history import (  # noqa: E402
    _FK_EDGES,
)
from tableau_dashboard_performance_etl_automation_spark.operators.intervals import (  # noqa: E402
    ROLLP_DAYS,
    ROLLP_Q,
)
from tableau_dashboard_performance_etl_automation_spark.operators.statstests import (  # noqa: E402
    KS_SPLIT_DAYS,
)
from tableau_dashboard_performance_etl_automation_spark.session import (  # noqa: E402
    get_spark,
)

FACTORS = [16, 64, 256]


# ---------------------------------------------------------------------------
# Round-10 shapes, verbatim from cd468e2 (measurement fixtures only)
# ---------------------------------------------------------------------------


def event_funnel_r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stages = None
    for no, (name, df) in enumerate(
        [("view", v), ("view>click", c), ("view>click>purchase", p)], 1
    ):
        s = df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "users"
        )
        stages = s if stages is None else stages.unionByName(s)
    w = Window.orderBy("stage_no").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return stages.withColumn(
        "pct_of_entry",
        F.round(F.col("users") / F.first("users").over(w), 4),
    ).orderBy("stage_no")


def session_funnel_conversion_r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sess = with_session_ids(e).select(
        "user_id", "session_id", "event_type", "ts", "event_id"
    )
    sk = F.struct(F.col("ts"), F.col("event_id"))
    anchors_v = (
        sess.filter(F.col("event_type") == "view")
        .groupBy("user_id", "session_id")
        .agg(F.min(sk).alias("mv"))
    )
    clicks = sess.filter(F.col("event_type") == "click").select(
        "user_id", "session_id", sk.alias("ck")
    )
    anchors_c = (
        clicks.join(anchors_v, ["user_id", "session_id"])
        .filter(F.col("ck") > F.col("mv"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ck").alias("mc"))
    )
    purchases = sess.filter(F.col("event_type") == "purchase").select(
        "user_id", "session_id", sk.alias("pk")
    )
    converted = (
        purchases.join(anchors_c, ["user_id", "session_id"])
        .filter(F.col("pk") > F.col("mc"))
        .select("user_id", "session_id")
        .distinct()
    )
    n_sessions = (
        sess.select("user_id", "session_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    n_view = anchors_v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    n_click = anchors_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view_click")
    )
    n_full = converted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full_funnel")
    )
    return (
        n_sessions.crossJoin(F.broadcast(n_view))
        .crossJoin(F.broadcast(n_click))
        .crossJoin(F.broadcast(n_full))
    )


def value_robust_outlier_rates_r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ec = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    med = _grouped_median_parts(ec, "event_type", "cents").select(
        "event_type", (F.col("m1") + F.col("m2")).alias("med_hc"), "n"
    )
    dev = ec.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.lit(2) * F.col("cents") - F.col("med_hc")).alias("dev_hc"),
    )
    mad = _grouped_median_parts(dev, "event_type", "dev_hc").select(
        "event_type", (F.col("m1") + F.col("m2")).alias("dsum")
    )
    outliers = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.lit(4) * F.col("dev_hc") > F.lit(7) * F.col("dsum"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        med.join(outliers, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.coalesce("n_outliers", F.lit(0).cast("bigint")).alias(
                "n_outliers"
            ),
            F.round(
                F.coalesce("n_outliers", F.lit(0)) / F.col("n"), 4
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


def rolling_p95_value_7d_r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    comp = (
        e.select(F.to_date("ts").alias("d"), cents.alias("cents"))
        .groupBy("d", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    days = comp.select("d").distinct().select(F.col("d").alias("t"))
    fanned = comp.withColumn(
        "t",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), ROLLP_DAYS - 1))
        ),
    ).join(days, "t", "left_semi")
    merged = fanned.groupBy("t", "cents").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy("t").orderBy("cents")
    cum = merged.withColumn("hi", F.sum("cnt").over(w)).withColumn(
        "lo", F.col("hi") - F.col("cnt")
    )
    totals = merged.groupBy("t").agg(F.sum("cnt").alias("n"))
    idx = F.lit(ROLLP_Q) * (F.col("n") - 1)
    j_f = F.floor(idx).cast("bigint")
    j_c = j_f + (idx > j_f.cast("double")).cast("bigint")
    picked = (
        cum.join(totals, "t")
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
            (F.col("v_f") + (F.col("v_c") - F.col("v_f")) * frac) / 100.0,
            4,
        ).alias("p95_7d"),
    ).orderBy("event_date")


def daily_value_ks_test_r10(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    diffs = comp.crossJoin(totals).select(
        "cents",
        "na",
        "nb",
        F.abs(
            F.sum("ca").over(w) * F.col("nb")
            - F.sum("cb").over(w) * F.col("na")
        ).alias("diff_int"),
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
                F.when(
                    F.col("na") * F.col("nb") > 0,
                    F.col("max_diff") / (F.col("na") * F.col("nb") * 1.0),
                ),
                6,
            ).alias("ks_d"),
            F.round(F.col("at_cents") / 100.0, 2).alias("at_value"),
        )
    )


# ---------------------------------------------------------------------------
# fk_integrity_audit: parked single-fact-scan fusion (r11 rejected @sf0.1)
# ---------------------------------------------------------------------------


def fk_integrity_audit_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One lineitem scan for its three FK edges: chained left joins
    against the (already-unique) parent key columns, null-parent
    counts folded into a single aggregate. The four non-lineitem
    edges keep the per-edge anti-join (their children are small)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    ok = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("_ok")
    )
    pk = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("_pk")
        )
    )
    sk = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("_sk")
        )
    )
    fused = (
        li.join(ok, li["l_orderkey"] == ok["_ok"], "left")
        .join(pk, li["l_partkey"] == pk["_pk"], "left")
        .join(sk, li["l_suppkey"] == sk["_sk"], "left")
        .agg(
            F.sum(F.col("_ok").isNull().cast("bigint")).alias("o_orph"),
            F.sum(F.col("_pk").isNull().cast("bigint")).alias("p_orph"),
            F.sum(F.col("_sk").isNull().cast("bigint")).alias("s_orph"),
        )
    )
    li_rows = fused.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_orderkey->orders").alias("fk_edge"),
                    F.col("o_orph").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_partkey->part").alias("fk_edge"),
                    F.col("p_orph").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_suppkey->supplier").alias("fk_edge"),
                    F.col("s_orph").alias("n_orphans"),
                ),
            )
        ).alias("s")
    ).select(
        F.col("s.fk_edge").alias("fk_edge"),
        F.coalesce("s.n_orphans", F.lit(0)).alias("n_orphans"),
    )
    counts = [li_rows]
    for edge, child_t, child_k, parent_t, parent_k in _FK_EDGES:
        if child_t == "lineitem":
            continue
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


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

OLD_NEW = [
    ("event_funnel", event_funnel_r10),
    ("session_funnel_conversion", session_funnel_conversion_r10),
    ("value_robust_outlier_rates", value_robust_outlier_rates_r10),
    ("rolling_p95_value_7d", rolling_p95_value_7d_r10),
    ("daily_value_ks_test", daily_value_ks_test_r10),
]

#: probe queries for the preferSortMergeJoin flip: shuffle-join
#: bearing fact shapes (chosen from the plan audit: plans whose final
#: form contains SortMergeJoin at sf0.1)
SMJ_PROBE = [
    "user_first_purchase",
    "buyer_cohort_setops",
    "customer_order_distribution",
    "part_fs_linkage",
    "skewsafe_user_join",
]


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _gc(spark) -> None:
    """bench.py's per-cell GC hygiene: without it, accumulated stage
    metadata + shuffle state in the long-lived driver JVM lands
    multi-second stop-the-world pauses inside random timed cells
    (observed in this tool's first run: buyer_cohort_setops 22.06 s
    at 64× vs 1.12 s at 256× — impossible for 4× the data — and the
    re-run with this hook reads ~1.5 s)."""
    import gc as _gcmod

    _gcmod.collect()
    spark._jvm.System.gc()


def _rows(df: DataFrame) -> list:
    return sorted(map(tuple, df.collect()))


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or FACTORS
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("tdpe-r12-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    only = os.environ.get("LADDER_EXPERIMENTS", "foldfuse,smj").split(",")

    # sanity: old shapes and the fusion reproduce the shipped results
    # on the base corpus before any timing is trusted
    if "foldfuse" in only:
        for name, old_fn in OLD_NEW:
            a = _rows(queries[name](spark, base))
            b = _rows(old_fn(spark, base))
            assert a == b, f"old/new mismatch for {name} at 1x"
        assert _rows(queries["fk_integrity_audit"](spark, base)) == _rows(
            fk_integrity_audit_fused(spark, base)
        ), "fused fk audit mismatch at 1x"
        print(json.dumps({"equivalence_1x": "pass"}), flush=True)

    report: dict = {"base": base, "scales": {}}
    for factor in factors:
        sf_dir = build_scaled(spark, base, factor)
        row: dict = {}
        if "foldfuse" in only:
            for name, old_fn in OLD_NEW:
                # interleaved: new, old, new, old — min of each
                news, olds = [], []
                for _ in range(2):
                    _gc(spark)
                    t0 = time.time()
                    _noop(queries[name](spark, sf_dir))
                    news.append(time.time() - t0)
                    _gc(spark)
                    t0 = time.time()
                    _noop(old_fn(spark, sf_dir))
                    olds.append(time.time() - t0)
                row[name] = {
                    "new": round(min(news), 2),
                    "r10_shape": round(min(olds), 2),
                }
            news, olds = [], []
            for _ in range(2):
                _gc(spark)
                t0 = time.time()
                _noop(queries["fk_integrity_audit"](spark, sf_dir))
                news.append(time.time() - t0)
                _gc(spark)
                t0 = time.time()
                _noop(fk_integrity_audit_fused(spark, sf_dir))
                olds.append(time.time() - t0)
            row["fk_integrity_audit"] = {
                "per_edge_anti": round(min(news), 2),
                "fused_one_scan": round(min(olds), 2),
            }
        if "smj" in only:
            smj_row: dict = {}
            for name in SMJ_PROBE:
                cells = {"smj_default": [], "shj_preferred": []}
                for _ in range(2):
                    _gc(spark)
                    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
                    spark.conf.set(
                        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                        "0",
                    )
                    t0 = time.time()
                    _noop(queries[name](spark, sf_dir))
                    cells["smj_default"].append(time.time() - t0)
                    _gc(spark)
                    spark.conf.set(
                        "spark.sql.join.preferSortMergeJoin", "false"
                    )
                    spark.conf.set(
                        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                        str(64 * 1024 * 1024),
                    )
                    t0 = time.time()
                    _noop(queries[name](spark, sf_dir))
                    cells["shj_preferred"].append(time.time() - t0)
                spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
                spark.conf.set(
                    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                    "0",
                )
                smj_row[name] = {
                    k: round(min(v), 2) for k, v in cells.items()
                }
            row["smj_flip"] = smj_row
        report["scales"][f"{factor}x"] = row
        print(json.dumps({f"{factor}x": row}), flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
