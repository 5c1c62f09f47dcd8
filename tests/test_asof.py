"""As-of join semantics on constructed cases: >= tie convention,
no-prior-match NULLs, per-key isolation."""

from __future__ import annotations

import datetime as dt

from tableau_dashboard_performance_etl_automation_spark.operators.asof import (
    asof_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "L1"),
            (1, _ts("2024-01-01T12:00:00"), "L2"),
            (2, _ts("2024-01-01T11:00:00"), "L3"),
        ],
        ["k", "ts", "left_id"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "R-early"),
            (1, _ts("2024-01-01T10:00:00"), "R-tie"),
            (1, _ts("2024-01-01T11:30:00"), "R-mid"),
            (2, _ts("2024-01-01T11:30:00"), "R-after"),
        ],
        ["k", "ts", "right_id"],
    )
    out = {
        r.left_id: r.asof_right_id
        for r in asof_join(left, right, "k", "ts", ["right_id"]).collect()
    }
    assert out["L1"] == "R-tie"  # >= semantics: same-instant row matches
    assert out["L2"] == "R-mid"  # latest before, not the earliest
    assert out["L3"] is None  # key 2's only right row is after L3


def test_asof_keys_are_isolated(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L1")], ["k", "ts", "left_id"]
    )
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01T09:00:00"), "other-key")], ["k", "ts", "right_id"]
    )
    rows = asof_join(left, right, "k", "ts", ["right_id"]).collect()
    assert rows[0].asof_right_id is None  # never borrows another key's row
