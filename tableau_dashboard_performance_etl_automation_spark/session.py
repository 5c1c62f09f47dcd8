"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB target, tested on local[32]):

- **AQE on** (coalesce + skew-join): at cluster scale the static
  ``spark.sql.shuffle.partitions`` is only a starting point; AQE
  re-plans post-shuffle partition counts and splits skewed joins.
- **Non-ANSI mode**: the reference's Vertica SQL relies on lax
  string→number coercion guarded by ``REGEXP_LIKE(col,'^[0-9]+$')``
  filters (tabjolt_email.py:383-387). ANSI mode (Spark 4 default)
  would throw on dirty values instead of yielding NULL; we preserve
  the reference's filter-then-cast discipline and keep casts lax.
- **UTC session timezone**: all timestamp semantics (epoch→ts
  conversion, date windows) are defined in UTC so results are
  reproducible across machines and match the DuckDB oracle.
- **nanosAsLong**: the driver's ``events.parquet`` stores
  TIMESTAMP(NANOS) which Spark's vectorized reader rejects; we read
  nanos as BIGINT and convert in the catalog layer (catalog.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Default parallelism knobs, overridable via environment.
ENV_CPUS = "SPARK_GRAFT_CPUS"
ENV_SHUFFLE_PARTITIONS = "SPARK_GRAFT_SHUFFLE_PARTITIONS"
ENV_DRIVER_MEM = "SPARK_GRAFT_DRIVER_MEM"
#: Warehouse location for managed/bucketed tables and persisted
#: artifacts. Overridable so the bench's fresh-warehouse mode
#: (SPARK_GRAFT_FRESH_WAREHOUSE=1, round-11 VERDICT item 6) can point
#: one run at an empty directory and measure cold artifact builds
#: end-to-end without disturbing the shared warm warehouse.
ENV_WAREHOUSE_DIR = "SPARK_GRAFT_WAREHOUSE_DIR"
#: Extra JVM flags appended to the driver options (single local JVM =
#: driver carries the executors too). Used by the bench harness to
#: A/B JIT/GC hypotheses (e.g. -XX:ReservedCodeCacheSize) without
#: changing engine defaults.
ENV_EXTRA_JAVA = "SPARK_GRAFT_EXTRA_JAVA_OPTS"


def get_spark(app_name: str = "tdpe-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    The config block is written so the same plan scales from
    ``local[32]`` to a 1000-executor cluster: everything
    partition-count-related is AQE-adaptive, broadcast thresholds are
    explicit, and no config pins data to a single JVM.
    """
    cpus = os.environ.get(ENV_CPUS, "*")
    shuffle_parts = os.environ.get(ENV_SHUFFLE_PARTITIONS, "32")
    driver_mem = os.environ.get(ENV_DRIVER_MEM, "8g")
    extra_java = os.environ.get(ENV_EXTRA_JAVA, "")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 32 MB broadcast budget: every dimension table in the star
        # schema (region/nation/supplier/part at 100 TB lineitem
        # scale) still broadcasts; fact-fact joins shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Runtime bloom-filter join pruning (pinned on, Spark default):
        # a selective dim/fact filter semi-propagates into the big
        # fact scan as a bloom_filter_might_contain predicate. The
        # injection thresholds stay at their defaults (application
        # side >= 10 GB) — it fires exactly in the 100 TB regime it
        # exists for, not on toy scans; the plan contract is asserted
        # with lowered thresholds in tests/test_plans.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Shuffled-hash over sort-merge when the planner's size
        # conditions allow it (guide §3.1/§9): measured on the round-12
        # fact ladder (tools/bench_r12_ladder.py, GC-clean interleaved
        # A/Bs on five shuffle-join fact shapes) — geomean ≈1.06×
        # faster at 16×/64× and ≈1.26× at 256× (153.6M lineitem), the
        # gap GROWING with scale because SMJ's per-partition sorts grow
        # n log n while SHJ's build stays linear. Production-safe by
        # the planner's own gate: a side only builds a hash map when
        # its estimated per-partition size fits (canBuildLocalHashMap),
        # so 100 TB fact-fact joins still fall back to sort-merge.
        # SPARK_GRAFT_PREFER_SMJ=1 restores the Spark default for A/Bs.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "1" else "false",
        )
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # tz-naive parquet micros → TIMESTAMP (session-UTC), not NTZ;
        # keeps epoch functions valid and matches the DuckDB oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # 128 MB input splits: right-sized tasks at 100 TB (≈800k
        # tasks) without tiny-file overhead at test scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # managed-table state (bucketed tables) lives outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(ENV_WAREHOUSE_DIR, "/tmp/tdpe-warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            ("-Dderby.system.home=/tmp/tdpe-derby " + extra_java).strip(),
        )
        .config("spark.ui.enabled", "false")
        # keep stdout machine-readable: console progress bars interleave
        # with (and in captured runs truncate) the one-line JSON outputs
        # bench.py / tools emit
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
