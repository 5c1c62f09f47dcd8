"""Parity against the reference's own golden data files.

Loads `/root/reference/{summary_line.csv, modified_workbook.csv,
wincounter.tsv}` (read-only golden inputs) through the compat layer
and runs the reference's nine queries pinned to the golden run date
(2024-07-30). Expected values are read off the files themselves —
e.g. summary_line.csv:1-3 records Avg/Min/Max = 12661/9534/12973.

Skipped when the reference checkout isn't present.
"""

from __future__ import annotations

import os

import pytest

from tableau_dashboard_performance_etl_automation_spark.operators import (
    tabjolt_compat,
)

REF = "/root/reference"
GOLDEN_DATE = "2024-07-30"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference golden files not available"
)


@pytest.fixture(scope="module")
def compat_tables(spark):
    return tabjolt_compat.load_tabjolt_tables(
        spark,
        {
            "summary_line": f"{REF}/summary_line.csv",
            "performance_samples": f"{REF}/modified_workbook.csv",
            "wincounter": f"{REF}/wincounter.tsv",
        },
    )


def test_golden_files_load_clean(compat_tables):
    assert compat_tables["summary_line"].count() == 4
    assert compat_tables["wincounter"].count() == 96
    # 7 lines - header = 6 samples, incl. the quoted-comma row
    assert compat_tables["performance_samples"].count() == 6


def test_summary_queries_return_golden_values(spark, compat_tables):
    q = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    # summary_line.csv:1-3 — all three metrics were 12661 that day
    assert [r[0] for r in q["summary_avg_today"].collect()] == ["12661"]
    assert [r[0] for r in q["summary_max_today"].collect()] == ["12661"]
    assert [r[0] for r in q["summary_min_today"].collect()] == ["12661"]


def test_historic_avg_coerces_strings_like_vertica(spark, compat_tables):
    q = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    # only one Avg row in the golden file → historic avg == that value;
    # the Err row ("0 0.00%") is excluded by the metrix filter, which
    # is the only reason the lax string→number AVG is well-defined
    assert q["historic_avg"].collect()[0][0] == 12661


def test_last_run_ts_from_wincounter(spark, compat_tables):
    out = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    assert out["last_run_ts"].collect()[0][0] == "2024-07-30 15:30:13"


def test_samples_today_validates_and_sorts(spark, compat_tables):
    q = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    rows = q["samples_today"].collect()
    # golden JTL rows are timestamped 2024-07-30 and all carry
    # "Site: ..." messages without "null"
    assert rows, "expected golden samples on the golden date"
    elapsed = [r.elapsed_time for r in rows]
    assert elapsed == sorted(elapsed, reverse=True)
    assert all("Site:" in r.response_message for r in rows)


def test_regressions_vs_baseline_on_golden_data(spark, compat_tables):
    q = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    for r in q["regressions"].collect():
        assert r.current_elapsed_ms > r.avg_elapsed_ms
        if r.percentage_difference is not None:
            assert r.percentage_difference > 0


def test_all_nine_queries_execute(spark, compat_tables):
    out = tabjolt_compat.run_reference_queries(spark, as_of=GOLDEN_DATE)
    assert len(out) == 9
    for name, df in out.items():
        df.collect()  # no analysis/runtime errors in any translation
