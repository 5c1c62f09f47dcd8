"""Unit-level semantics of the reference-parity query layer, on
reference-shaped fixtures (FIXTURES.md §2): dirty numeric strings,
the zero-baseline CASE guard, and the strict alert thresholds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tableau_dashboard_performance_etl_automation_spark.functions.expressions import (
    digits_only,
    floor_int,
    guarded_pct_diff,
    ts_from_epoch_ms_string,
)
from tableau_dashboard_performance_etl_automation_spark.operators import tabjolt


def test_digits_only_gate_rejects_dirty_strings(spark):
    df = spark.createDataFrame(
        [("123",), ("0 0.00%",), ("12a3",), ("",), (None,)], ["v"]
    )
    kept = [r.v for r in df.filter(digits_only(F.col("v"))).collect()]
    assert kept == ["123"]


def test_ts_from_epoch_ms_string_matches_known_instant(spark):
    df = spark.createDataFrame([("1722333534328",)], ["ts_ms"])
    out = df.select(
        F.date_format(
            ts_from_epoch_ms_string(F.col("ts_ms")), "yyyy-MM-dd HH:mm:ss.SSS"
        ).alias("t")
    ).collect()[0]
    assert out.t == "2024-07-30 09:58:54.328"  # UTC


def test_guarded_pct_diff_zero_baseline_yields_null(spark):
    df = spark.createDataFrame([(0.0, 50.0), (100.0, 125.0)], ["a", "c"])
    rows = df.select(
        guarded_pct_diff(F.col("a"), F.col("c")).alias("p")
    ).collect()
    assert rows[0].p is None
    assert rows[1].p == 25.0


def test_floor_int_semantics(spark):
    df = spark.createDataFrame([(185.99,), (185.01,)], ["v"])
    assert [r.i for r in df.select(floor_int(F.col("v")).alias("i")).collect()] == [
        185,
        185,
    ]


def test_red_flag_threshold_is_strict(spark):
    """Exactly +20.0% must NOT be red (tabjolt_email.py:223 uses >)."""
    df = spark.createDataFrame(
        [(20.0,), (20.0001,), (19.9999,)], ["percentage_difference"]
    )
    flagged = df.withColumn(
        "alert_flag",
        F.when(F.col("percentage_difference") > 20.0, F.lit("RED")).otherwise(
            F.lit("")
        ),
    )
    out = {r.percentage_difference: r.alert_flag for r in flagged.collect()}
    assert out[20.0] == ""
    assert out[20.0001] == "RED"
    assert out[19.9999] == ""


@pytest.mark.parametrize("name", sorted(tabjolt.QUERIES))
def test_queries_run_at_smoke_sf(spark, sf_dir, name):
    df = tabjolt.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs without error, stable schema
    assert df.columns  # non-empty projection


def test_improvement_threshold_is_strict(spark, sf_dir):
    """Q8 keeps only strictly < -40.0 rows (tabjolt_email.py:387)."""
    df = tabjolt.q_improvements(spark, sf_dir)
    bad = df.filter(F.col("percentage_difference") >= -40.0).count()
    assert bad == 0


def test_regressions_only_slower_rows(spark, sf_dir):
    df = tabjolt.q_regressions(spark, sf_dir)
    bad = df.filter(
        ~(F.col("avg_elapsed_ms") < F.col("current_elapsed_ms"))
    ).count()
    assert bad == 0
