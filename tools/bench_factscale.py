"""Fact-table scale-up probe for the relational operators.

The corpus scale-up tool (bench_scaleup.py) stresses the
pair-producing dedup/similarity ops; this one stresses the
RELATIONAL layer the same way: materialize 4× and 16× replicas of
the FACT tables (lineitem, orders, events) under /tmp while keeping
the dimension tables fixed — exactly how a real warehouse grows
(facts accumulate, dims don't) — then time a representative
relational slice at each scale.

Replication keeps referential integrity: each replica shifts
o_orderkey / l_orderkey / event_id by r × (max key + 1) so
orders⋈lineitem joins stay 1:N with N unchanged, while per-customer
order counts, per-user event densities, and per-(part,supplier)
volumes all grow with the factor — the realistic skew direction.

Usage::

    python tools/bench_factscale.py [base_sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

from tableau_dashboard_performance_etl_automation_spark.catalog import (  # noqa: E402
    TABLES,
    load_table,
)
from tableau_dashboard_performance_etl_automation_spark.session import get_spark  # noqa: E402

SCALE_ROOT = "/tmp/tdpe-factscale"
FACTORS = [1, 4, 16]

#: Facts to replicate: table → (shifted key column, key DOMAIN the
#: shift is derived from). lineitem's l_orderkey shifts by the ORDERS
#: domain's max so replica r of both tables lands on the same key
#: offset — referential integrity holds even if the tail order has no
#: lineitems.
FACT_KEYS = {
    "orders": ("o_orderkey", ("orders", "o_orderkey")),
    "lineitem": ("l_orderkey", ("orders", "o_orderkey")),
    "events": ("event_id", ("events", "event_id")),
}

#: Representative relational slice: scan-agg, broadcast star joins,
#: fact-fact join, windows, distinct-agg, top-k.
PROBE_QUERIES = [
    "pricing_summary",
    "shipping_priority",
    "nation_market_share",
    "top_revenue_orders",
    "daily_active_users",
    "user_sessionization",
    "rolling_value_7d",
    "order_quartiles",
    # round-4 fact-table shapes
    "sole_late_suppliers",
    "market_basket_brand_pairs",
    "user_running_balance",
    "daily_value_twap",
    # round-4e interval machinery (binned range join, sweep line,
    # gap-filled spine, run-length collapse)
    "events_in_anomaly_windows",
    "daily_peak_concurrency",
    "gapfilled_daily_counts",
    "event_run_lengths",
    # round-4e session/stat analytics
    "session_path_mining",
    "session_type_pmi",
    "signup_purchase_survival",
    "value_drift_psi",
    "event_type_dow_chisq",
    # round-5e: the Space-Saving guarantee set (events-shaped
    # compaction + broadcast totals join)
    "guaranteed_heavy_hitters",
    "daily_value_autocorrelation",
    # round-5b event-table shapes: sketches (fixed-state aggregates),
    # the interval attribution join, and the quasi-identifier census
    "hll_distinct_users",
    "kmv_type_overlap",
    "purchase_click_attribution_final",
    "small_cell_suppression_report",
    # round-5d statistical testing shapes: the value-domain KS
    # cumsum window (the one global ordered window in the layer),
    # day-compaction changepoint, orders-scan Benford digits, the
    # orders⋈customer OLS trend, and the user-domain A/B aggregate
    "daily_value_ks_test",
    "daily_changepoint",
    "benford_price_digits",
    "nation_revenue_trend",
    "conversion_ab_ztest",
    # round-5f inequality/dependence shapes: per-customer compaction +
    # distinct-value windows (gini, lorenz), bounded-cell MI table
    "nation_revenue_gini",
    "customer_revenue_lorenz",
    "event_hour_mi_terms",
    # round-5f cont.: revenue-weighted cohort window, 3-level
    # erasure-cascade semi-joins
    "cohort_ltv_curve",
    "customer_erasure_audit",
    # round-5f cont.: interval-join credit buckets, integer HHI rollup
    "multi_touch_attribution",
    "part_supplier_hhi",
    # bounded (flag, quantity) compaction rank test
    "returnflag_quantity_kruskal",
    # mergeable-distribution rolling percentile (7-way fan-out join)
    "rolling_p95_value_7d",
    # round-6: the two-phase leaderboard top-k (local WindowGroupLimit
    # per split — must stay flat as per-priority row counts grow) and
    # the zero-exchange bucketed-fact cold build
    "price_rank_gaps",
    "brand_affinity_cold_bucketed",
    # round-6: value-domain range planner (flat — domain-bounded),
    # the incremental rollup merge (linear full scan), and the
    # salted skew-safe join (one fact shuffle on (key, salt))
    "range_partition_plan",
    "incremental_agg_refresh",
    "skewsafe_user_join",
    # round-7: the >2s bench heavies brought under the perf-budget
    # gate (tests/test_plans.py): TPC-H fact-fact shapes (Q9/Q20/Q21
    # analogs), the per-(part,supp) min-cost argmin, the 3-table FK
    # audit, per-supplier exact percentiles, and the events-shaped
    # Markov entropy rate
    # round-11: the events-payload JSON census (driver-box outlier in
    # r10; ladder proves the from_json scan flat through 16×)
    "props_json_key_census",
    "nation_year_profit",
    "excess_stock_suppliers",
    "order_last_shippers",
    "priority_return_orders",
    "important_parts_value",
    "fk_integrity_audit",
    "supplier_lead_time_percentiles",
    "markov_entropy_rate",
    # round-7 cont.: borderline gate heavies on the fact axis — the
    # sampled join-cardinality estimator audit and the events-shaped
    # robust outlier rates
    "join_estimate_accuracy",
    "value_robust_outlier_rates",
    # the 1.6-2.2s band noise can push over the gate budget
    "event_type_robust_stats",
    "lineitem_price_correlations",
    # round-7 cont.: two more borderline-band queries that run noise
    # pushed over the budget in a full-bench sample — the CMS-verified
    # heavy-hitter census (events-shaped fixed-width sketch + exact
    # confirm join) and the per-(part) min-cost supplier argmin
    "heavy_hitter_users_cms",
    "min_cost_supplier",
    # round-9: the driver-bench heavies the round-8 verdict flagged
    # without ladder cells — the orders profiler (one full-scan
    # aggregate), the events winsorizer (percentile pair + clamp
    # aggregate), and the CDC upsert (orders-derived change stream
    # merged onto the customer dim)
    "profile_orders",
    "winsorized_event_stats",
    "cdc_upsert_customers",
]


def build_scaled(spark, base_dir: str, factor: int) -> str:
    # symlinks below land in /tmp; a relative base_dir would make them
    # resolve relative to /tmp and dangle — normalize first
    base_dir = os.path.abspath(base_dir)
    out = f"{SCALE_ROOT}/{factor}x"
    if factor == 1:
        return base_dir
    # a cached build is only valid for the SAME base corpus and only
    # if it finished: the meta marker (written last) records the base
    # fact row count; mismatch or absence (e.g. corpus regenerated,
    # or a prior run died mid-write) forces a rebuild
    base_rows = load_table(spark, base_dir, "lineitem").count()
    meta_path = f"{out}/meta.json"
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta == {"base_lineitem_rows": base_rows, "factor": factor}:
                return out
        except (OSError, ValueError):
            pass
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # dims: same bytes, same path semantics — symlink
    for name in TABLES:
        if name in FACT_KEYS:
            continue
        os.symlink(
            f"{base_dir}/{name}.parquet", f"{out}/{name}.parquet"
        )
    shifts = {}
    for dom_table, dom_key in {d for _, d in FACT_KEYS.values()}:
        shifts[(dom_table, dom_key)] = (
            load_table(spark, base_dir, dom_table)
            .agg(F.max(dom_key))
            .collect()[0][0]
            + 1
        )
    for name, (key, domain) in FACT_KEYS.items():
        df = load_table(spark, base_dir, name)
        shift = shifts[domain]
        parts = [
            df.withColumn(key, F.col(key) + F.lit(r * shift))
            for r in range(factor)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    with open(meta_path, "w") as fh:
        json.dump({"base_lineitem_rows": base_rows, "factor": factor}, fh)
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or FACTORS
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("tdpe-factscale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    # FACTSCALE_QUERIES=a,b,c limits the probe to a subset (used for
    # deep-decade runs where the full slice would dominate wall time)
    probe = PROBE_QUERIES
    env_qs = os.environ.get("FACTSCALE_QUERIES")
    if env_qs:
        probe = [q.strip() for q in env_qs.split(",") if q.strip()]
        unknown = [q for q in probe if q not in queries]
        if unknown:
            # fail loudly BEFORE the multi-hour corpus build: a typo'd
            # name silently dropped would burn the build for nothing
            raise SystemExit(
                f"FACTSCALE_QUERIES names not registered: {unknown}"
            )
    report: dict = {"base": base, "scales": {}}
    for factor in factors:
        sf_dir = build_scaled(spark, base, factor)
        row: dict = {
            "lineitem_rows": load_table(spark, sf_dir, "lineitem").count(),
            "events_rows": load_table(spark, sf_dir, "events").count(),
        }
        for name in probe:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            row[name] = round(best, 2)
        report["scales"][f"{factor}x"] = row
        print(json.dumps({f"{factor}x": row}), flush=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
