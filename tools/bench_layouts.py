"""Measure the storage-layout wins PERF.md argues for: date-partition
pruning and bucketed (shuffle-free) joins/aggregates, on real data.

    python tools/bench_layouts.py [sf_dir]

Prints one markdown table of min-of-3 timings plus the plan evidence
(PartitionFilters / absence of hashpartitioning).
"""

from __future__ import annotations

import re
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
    from tableau_dashboard_performance_etl_automation_spark.plans import formatted_plan
    from tableau_dashboard_performance_etl_automation_spark.session import get_spark
    from tableau_dashboard_performance_etl_automation_spark.sources import warehouse

    spark = get_spark("bench-layouts")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    # pick a real date in the data for the one-day window
    day = events.select(
        F.max(F.col("ts").cast("date")).alias("d")
    ).collect()[0].d
    day_s = day.isoformat()

    rows = []

    # --- date partition pruning -------------------------------------
    part_path = tempfile.mkdtemp(prefix="tdpe-events-by-date-")
    warehouse.write_date_partitioned(events, part_path)
    part = warehouse.read_partitioned(spark, part_path)

    def q_raw():
        events.filter(F.col("ts").cast("date") == day_s).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).write.format("noop").mode(
            "overwrite"
        ).save()

    def q_part():
        part.filter(F.col("event_date") == day_s).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).write.format("noop").mode("overwrite").save()

    t_raw, t_part = _best(q_raw), _best(q_part)
    pruned_plan = formatted_plan(
        part.filter(F.col("event_date") == day_s)
    )
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", pruned_plan)
    rows.append(
        (
            "1-day window rollup",
            t_raw,
            t_part,
            f"PartitionFilters=[{pf.group(1) if pf else '??'}]",
        )
    )

    # --- bucketed join (the q_regressions baseline-vs-current shape) --
    cur = events.filter(F.col("ts").cast("date") == day_s).select(
        "user_id", F.col("value").alias("cur_value")
    )
    hist = events.filter(F.col("ts").cast("date") < day_s).select(
        "user_id", "value"
    )
    warehouse.write_bucketed(hist, "bench_hist_bucketed", "user_id", 16)
    hist_b = spark.table("bench_hist_bucketed")

    def join_raw():
        hist.groupBy("user_id").agg(F.avg("value").alias("baseline")).join(
            cur, "user_id"
        ).filter(F.col("cur_value") > F.col("baseline")).write.format(
            "noop"
        ).mode("overwrite").save()

    def join_bucketed():
        hist_b.groupBy("user_id").agg(F.avg("value").alias("baseline")).join(
            cur, "user_id"
        ).filter(F.col("cur_value") > F.col("baseline")).write.format(
            "noop"
        ).mode("overwrite").save()

    t_jraw, t_jbuck = _best(join_raw), _best(join_bucketed)
    buck_plan = formatted_plan(
        hist_b.groupBy("user_id").agg(F.avg("value").alias("baseline"))
    )
    no_shuffle = "hashpartitioning" not in buck_plan
    rows.append(
        (
            "baseline-vs-current join",
            t_jraw,
            t_jbuck,
            f"bucketed agg shuffle-free={no_shuffle}",
        )
    )

    print(f"layout bench @ {sf_dir} (min of 3, seconds)")
    print("| query | raw layout | tuned layout | plan evidence |")
    print("|---|---|---|---|")
    for name, a, b, ev in rows:
        print(f"| {name} | {a:.3f} | {b:.3f} | {ev} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
