"""Storage-layout guarantees: partition pruning prunes, bucketed
joins don't shuffle. Plan-level evidence, not assertion by analogy."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.catalog import load_table
from tableau_dashboard_performance_etl_automation_spark.plans import formatted_plan
from tableau_dashboard_performance_etl_automation_spark.sources import warehouse


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    warehouse.write_date_partitioned(events, path)
    df = warehouse.read_partitioned(spark, path).filter(
        F.col("event_date") == "2024-01-15"
    )
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1)
    # pruned read returns exactly that day's rows
    want = events.filter(F.col("ts").cast("date") == "2024-01-15").count()
    assert df.count() == want


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    warehouse.write_bucketed(
        events.select("event_id", "user_id", "value"),
        "events_bucketed_a",
        "user_id",
        n_buckets=8,
    )
    warehouse.write_bucketed(
        events.select("event_id", "user_id", "event_type"),
        "events_bucketed_b",
        "user_id",
        n_buckets=8,
    )
    a = spark.table("events_bucketed_a")
    b = spark.table("events_bucketed_b")
    joined = a.groupBy("user_id").agg(F.sum("value").alias("v")).join(
        b.groupBy("user_id").agg(F.count("*").alias("n")), "user_id"
    )
    plan = formatted_plan(joined)
    # both sides pre-distributed by user_id: no hash-partitioned
    # shuffle anywhere (a BroadcastExchange of the finished small
    # aggregate is fine — that's not a shuffle)
    assert "hashpartitioning" not in plan
    assert "Bucketed: true" in plan
    assert joined.count() > 0


def test_bucketed_aggregate_skips_shuffle(spark, sf_dir):
    unbucketed = load_table(spark, sf_dir, "events")
    agg_unbucketed = unbucketed.groupBy("user_id").agg(F.sum("value"))
    assert "hashpartitioning" in formatted_plan(agg_unbucketed)

    warehouse.write_bucketed(
        unbucketed.select("event_id", "user_id", "value"),
        "events_bucketed_agg",
        "user_id",
        n_buckets=8,
    )
    agg_bucketed = (
        spark.table("events_bucketed_agg").groupBy("user_id").agg(F.sum("value"))
    )
    assert "hashpartitioning" not in formatted_plan(agg_bucketed)


def test_compaction_shrinks_file_count_preserving_rows(spark, sf_dir, tmp_path):
    """A 64-small-file table compacts to the byte-target file count
    with identical content; a partitioned table compacts to one file
    per partition directory."""
    import os

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        compact_parquet,
    )

    events = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    events.repartition(64).write.parquet(frag)
    n_frag = sum(
        1 for n in os.listdir(frag) if n.endswith(".parquet")
    )
    assert n_frag >= 32

    out = str(tmp_path / "compacted")
    n_tasks = compact_parquet(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
    n_out = sum(1 for n in os.listdir(out) if n.endswith(".parquet"))
    assert n_out == n_tasks < n_frag
    assert spark.read.parquet(out).count() == events.count()
    # content identical: order-insensitive id multiset
    assert (
        spark.read.parquet(out).select("event_id").exceptAll(
            events.select("event_id")
        ).count()
        == 0
    )

    # partitioned compaction: one file per partition dir
    part_src = str(tmp_path / "part_src")
    events.withColumn(
        "event_date", F.col("ts").cast("date")
    ).repartition(16).write.partitionBy("event_date").parquet(part_src)
    part_out = str(tmp_path / "part_out")
    compact_parquet(
        spark, part_src, part_out, partition_col="event_date"
    )
    for d in os.listdir(part_out):
        if d.startswith("event_date="):
            files = [
                f
                for f in os.listdir(os.path.join(part_out, d))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, d


def test_parquet_schema_evolution_merges_new_column(spark, sf_dir, tmp_path):
    """A warehouse accumulates files written under evolving schemas;
    mergeSchema reads must unify them (new column NULL for old files)
    without rewriting history."""
    target = str(tmp_path / "evolving")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    e.limit(100).write.mode("append").parquet(target)
    e.limit(50).withColumn(
        "schema_version", F.lit(2)
    ).write.mode("append").parquet(target)
    merged = spark.read.option("mergeSchema", "true").parquet(target)
    assert "schema_version" in merged.columns
    assert merged.count() == 150
    # old files surface NULL for the new column, new files their value
    assert merged.filter(F.col("schema_version").isNull()).count() == 100
    assert merged.filter(F.col("schema_version") == 2).count() == 50


def test_dynamic_partition_overwrite_replaces_only_touched_day(
    spark, sf_dir, tmp_path
):
    """Re-running one day's load must replace ONLY that day's
    partition (dynamic mode), not truncate the table — the semantics
    an idempotent daily warehouse job depends on."""
    target = str(tmp_path / "daily")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "value", F.to_date("ts").alias("event_date")
    )
    days = [r.event_date for r in e.select("event_date").distinct().orderBy(
        "event_date"
    ).limit(2).collect()]
    base = e.filter(F.col("event_date").isin(days))
    base.write.partitionBy("event_date").mode("overwrite").parquet(target)
    n_day0 = base.filter(F.col("event_date") == days[0]).count()

    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # re-load day 1 only, with values doubled (the "corrected" rerun)
        base.filter(F.col("event_date") == days[1]).withColumn(
            "value", F.col("value") * 2
        ).write.partitionBy("event_date").mode("overwrite").parquet(target)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    out = spark.read.parquet(target)
    # day 0 untouched; day 1 replaced, not duplicated
    assert out.filter(F.col("event_date") == days[0]).count() == n_day0
    orig_day1 = base.filter(F.col("event_date") == days[1])
    assert out.filter(F.col("event_date") == days[1]).count() == orig_day1.count()
    s_new = out.filter(F.col("event_date") == days[1]).agg(
        F.sum("value")
    ).collect()[0][0]
    s_old = orig_day1.agg(F.sum("value")).collect()[0][0]
    assert abs(s_new - 2 * s_old) < 1e-6


def test_artifact_roundtrip_and_tag_guard(spark, sf_dir, tmp_path):
    from tableau_dashboard_performance_etl_automation_spark.sources import warehouse as wh

    df = spark.createDataFrame(
        [(1, [0.5, 1.25]), (2, [2.0, -3.5])], "k BIGINT, v ARRAY<DOUBLE>"
    )
    wh.save_artifact(df, "test_artifact/x", tag="tagA")
    back = wh.load_artifact(spark, "test_artifact/x", tag="tagA")
    assert back is not None
    assert sorted((r.k, tuple(r.v)) for r in back.collect()) == [
        (1, (0.5, 1.25)),
        (2, (2.0, -3.5)),
    ]
    # wrong tag (different inputs) must refuse, absent must refuse
    assert wh.load_artifact(spark, "test_artifact/x", tag="tagB") is None
    assert wh.load_artifact(spark, "test_artifact/missing", tag="tagA") is None


def test_ivf_codebook_persists_across_cold_session(spark, sf_dir):
    """A cold session (memos cleared) must LOAD the persisted codebook
    rather than retrain — and the loaded codebook must be bit-identical
    to the trained one (deterministic training)."""
    from tableau_dashboard_performance_etl_automation_spark.operators import similarity as sim
    from tableau_dashboard_performance_etl_automation_spark.sources import warehouse as wh

    warm = sorted(
        (r.cent_id, tuple(r.cvec))
        for r in sim._codebook(spark, sf_dir, sim._emb(spark, sf_dir)).collect()
    )
    k = sim.ivf_n_centroids(sim._emb(spark, sf_dir).count())
    art = sim._artifact_name(
        f"{sim.IVF_CODEBOOK_ARTIFACT}/k{k}", sf_dir
    )
    assert wh.load_artifact(spark, art, sf_dir) is not None

    # simulate the cold session: clear ONLY the in-process dict memo.
    # (invalidate_session_memos would be wrong here — it also revokes
    # artifact trust, which models INPUT MUTATION, not a fresh session)
    sim._CODEBOOK_CACHE.clear()
    # sabotage the trainer: a cold load must NOT call it
    orig = sim._train_centroids
    sim._train_centroids = lambda e, k: (_ for _ in ()).throw(
        AssertionError("cold session retrained instead of loading")
    )
    try:
        cold = sorted(
            (r.cent_id, tuple(r.cvec))
            for r in sim._codebook(
                spark, sf_dir, sim._emb(spark, sf_dir)
            ).collect()
        )
    finally:
        sim._train_centroids = orig
    assert cold == warm


def test_persisted_table_rebuilds_on_tag_change(spark, tmp_path):
    """A persisted corpus artifact must be trusted only for ITS
    inputs: same (name, tag) loads without rebuilding; a changed tag
    (different corpus / different dial) forces a rebuild and
    re-stamps."""
    from tableau_dashboard_performance_etl_automation_spark.sources import warehouse as wh

    calls = []

    def build_a():
        calls.append("a")
        return spark.createDataFrame([(1, "a")], "k BIGINT, v STRING")

    def build_b():
        calls.append("b")
        return spark.createDataFrame([(2, "b")], "k BIGINT, v STRING")

    name = "test_artifact/rebuild"
    out1 = wh.persisted_table(spark, name, "tag1", build_a)
    assert [tuple(r) for r in out1.collect()] == [(1, "a")]
    # same tag: loads, does NOT rebuild
    out2 = wh.persisted_table(spark, name, "tag1", build_b)
    assert [tuple(r) for r in out2.collect()] == [(1, "a")]
    assert calls == ["a"]
    # new tag (inputs changed): rebuilds and re-stamps
    out3 = wh.persisted_table(spark, name, "tag2", build_b)
    assert [tuple(r) for r in out3.collect()] == [(2, "b")]
    assert calls == ["a", "b"]
    # and the new stamp holds
    out4 = wh.persisted_table(spark, name, "tag2", build_a)
    assert [tuple(r) for r in out4.collect()] == [(2, "b")]
    assert calls == ["a", "b"]


def test_invalidate_session_memos_revokes_artifact_trust(spark):
    """After invalidate_session_memos(), disk artifacts this process
    touched must NOT be trusted (their path-based tags cannot see an
    in-place input mutation) — the next consumer rebuilds."""
    from tableau_dashboard_performance_etl_automation_spark import memo
    from tableau_dashboard_performance_etl_automation_spark.sources import warehouse as wh

    import uuid

    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(len(calls),)], "v BIGINT")

    # unique per run: the warehouse dir outlives pytest sessions, so a
    # fixed name would already be trusted on the second run
    name = f"test_artifact/invalidate_{uuid.uuid4().hex[:8]}"
    wh.persisted_table(spark, name, "t", build)
    wh.persisted_table(spark, name, "t", build)
    assert calls == [1]  # trusted, no rebuild
    memo.invalidate_session_memos()
    out = wh.persisted_table(spark, name, "t", build)
    assert calls == [1, 1]  # trust revoked -> rebuilt
    assert [r.v for r in out.collect()] == [2]


def test_corpus_slug_distinguishes_same_basename_corpora(tmp_path):
    """Round-8 ADVICE: a/sf0.1 and b/sf0.1 must land on different
    artifact paths (alternating corpora previously rebuild-thrashed
    on one shared path; the meta tag only prevented WRONG data)."""
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import corpus_slug

    a = tmp_path / "a" / "sf0.1"
    b = tmp_path / "b" / "sf0.1"
    sa, sb = corpus_slug(str(a)), corpus_slug(str(b))
    assert sa != sb
    assert sa.startswith("sf0.1_") and sb.startswith("sf0.1_")
    # stable across trailing-slash spelling
    assert corpus_slug(str(a) + "/") == sa


def test_bucketed_fact_reuses_files_across_sessions(spark, sf_dir, tmp_path):
    """Round-8 VERDICT item 4: a fresh session must NOT rewrite the
    bucketed fact layout — it re-registers an external bucketed table
    over the stamped files. Simulated end-to-end in one process by
    dropping the catalog entry (the only thing a session restart
    loses) while preserving the data files and the meta stamp, then
    dispatching through ``bucketed_fact`` again."""
    import os
    import shutil

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        BUILD_LOG,
        _FACT_BUCKET_CACHE,
        _artifact_path,
        bucketed_fact,
    )

    import hashlib

    sf = sf_dir
    # clean slate: a stamp left by a PREVIOUS session would short-
    # circuit the build this test wants to observe
    digest = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]
    name = f"fact_supplier_{digest}_by_s_suppkey_8b"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(_artifact_path(spark, name), ignore_errors=True)
    shutil.rmtree(_artifact_path(spark, name + "_meta"), ignore_errors=True)
    for k in [k for k, n in list(_FACT_BUCKET_CACHE.items()) if n == name]:
        del _FACT_BUCKET_CACHE[k]
    BUILD_LOG.pop(name, None)

    df1 = bucketed_fact(spark, sf, "supplier", "s_suppkey", n_buckets=8)
    want = df1.count()
    built_secs = BUILD_LOG.get(name)
    assert built_secs is not None  # first call paid the build

    # simulate a session restart: catalog entry gone, files + stamp
    # survive. DROP on the managed table would delete the files, so
    # stash them first and restore after the drop.
    data_dir = _artifact_path(spark, name)
    meta_dir = _artifact_path(spark, name + "_meta")
    stash = str(tmp_path / "stash")
    shutil.copytree(data_dir, os.path.join(stash, name))
    spark.sql(f"DROP TABLE {name}")
    assert not os.path.exists(data_dir)  # managed drop removed data
    assert os.path.exists(meta_dir)  # stamp untouched by the drop
    shutil.copytree(os.path.join(stash, name), data_dir)
    for k in [k for k, n in _FACT_BUCKET_CACHE.items() if n == name]:
        del _FACT_BUCKET_CACHE[k]

    df2 = bucketed_fact(spark, sf, "supplier", "s_suppkey", n_buckets=8)
    # no rebuild: BUILD_LOG unchanged, content identical
    assert BUILD_LOG.get(name) == built_secs
    assert df2.count() == want
    assert df2.exceptAll(df1).count() == 0
    # the re-registered layout still elides the shuffle
    agg = df2.groupBy("s_suppkey").count()
    plan = formatted_plan(agg)
    assert "hashpartitioning" not in plan
    assert "Bucketed: true" in plan

    # third dispatch: stamped AND registered -> pure lookup, no DDL
    df3 = bucketed_fact(spark, sf, "supplier", "s_suppkey", n_buckets=8)
    assert df3.count() == want


def test_persisted_table_events_tags_and_trust(spark, sf_dir, tmp_path):
    """Round-9 infrastructure contracts in one flow: (1) a first
    build logs a 'build' event and BUILD_LOG entry; (2) a re-read
    logs 'hit' (trust-memoized — no meta job needed); (3) a TAG
    change (dial moved) invalidates and rebuilds rather than
    silently reusing; (4) invalidate_session_memos revokes the trust
    memo AND the stamp, forcing a rebuild."""
    from tableau_dashboard_performance_etl_automation_spark.memo import (
        invalidate_session_memos,
    )
    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        ARTIFACT_EVENTS,
        BUILD_LOG,
        persisted_table,
    )

    name = "evt_probe/unit"
    builds = []

    def build():
        builds.append(1)
        return spark.range(5).withColumnRenamed("id", "v")

    def events_since(n0):
        return [e for nm, e in ARTIFACT_EVENTS[n0:] if nm == name]

    n0 = len(ARTIFACT_EVENTS)
    df = persisted_table(spark, name, "tag|dial=1", build)
    assert df.count() == 5
    assert events_since(n0) == ["build"]
    assert builds == [1]
    assert name in BUILD_LOG

    n1 = len(ARTIFACT_EVENTS)
    persisted_table(spark, name, "tag|dial=1", build).count()
    assert events_since(n1) == ["hit"]
    assert builds == [1]  # no rebuild

    # dial change -> tag change -> rebuild, never silent reuse
    n2 = len(ARTIFACT_EVENTS)
    persisted_table(spark, name, "tag|dial=2", build).count()
    assert events_since(n2) == ["build"]
    assert builds == [1, 1]

    # global invalidation revokes stamp AND trust memo
    invalidate_session_memos()
    n3 = len(ARTIFACT_EVENTS)
    persisted_table(spark, name, "tag|dial=2", build).count()
    assert events_since(n3) == ["build"]
    assert builds == [1, 1, 1]


def test_bucketed_fact_rebuilds_when_stamp_outlives_data(spark, sf_dir):
    """Round-9 ADVICE (warehouse.py bucketed_fact): DROP TABLE on the
    managed bucketed table deletes the data files but NOT the meta
    stamp. The next cold dispatch used to hit the 'stamped and not
    registered' branch and die in register_bucketed_location's
    parquet read (PATH_NOT_FOUND); it must instead revoke the stale
    stamp and rebuild."""
    import hashlib
    import os
    import shutil

    from tableau_dashboard_performance_etl_automation_spark.sources.warehouse import (
        BUILD_LOG,
        _FACT_BUCKET_CACHE,
        _artifact_path,
        bucketed_fact,
    )

    sf = sf_dir
    digest = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]
    name = f"fact_region_{digest}_by_r_regionkey_4b"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(_artifact_path(spark, name), ignore_errors=True)
    shutil.rmtree(_artifact_path(spark, name + "_meta"), ignore_errors=True)
    for k in [k for k, n in list(_FACT_BUCKET_CACHE.items()) if n == name]:
        del _FACT_BUCKET_CACHE[k]
    BUILD_LOG.pop(name, None)

    df1 = bucketed_fact(spark, sf, "region", "r_regionkey", n_buckets=4)
    want = df1.count()
    first_build = BUILD_LOG[name]

    # the asymmetry: managed drop removes data, stamp survives
    spark.sql(f"DROP TABLE {name}")
    assert not os.path.exists(_artifact_path(spark, name))
    assert os.path.exists(_artifact_path(spark, name + "_meta"))
    for k in [k for k, n in list(_FACT_BUCKET_CACHE.items()) if n == name]:
        del _FACT_BUCKET_CACHE[k]

    # must NOT raise; must rebuild (BUILD_LOG accumulates) and serve rows
    df2 = bucketed_fact(spark, sf, "region", "r_regionkey", n_buckets=4)
    assert df2.count() == want
    assert BUILD_LOG[name] > first_build  # a second build was paid
