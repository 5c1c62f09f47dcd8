"""Report sinks: HTML structure, red-alert styling, chart data prep,
MIME assembly, and the end-to-end report pipeline."""

from __future__ import annotations

from tableau_dashboard_performance_etl_automation_spark import pipeline
from tableau_dashboard_performance_etl_automation_spark.reports import (
    chart,
    email_sink,
    html,
)


def test_regression_table_red_is_strictly_above_20():
    rows = [
        (100.0, 120, "key_at_boundary", 20.0),
        (100.0, 121, "key_above", 21.0),
    ]
    out = html.regression_table(rows)
    # per-cell styling like the reference (tabjolt_email.py:230):
    # all 4 cells of the >20 row are red, the boundary row has none
    boundary_row, above_row = out.split("<tr>")[2], out.split("<tr>")[3]
    assert "key_at_boundary" in boundary_row
    assert "color: red;" not in boundary_row
    assert "key_above" in above_row
    assert above_row.count("color: red;") == 4


def test_float_cells_format_two_decimal_percent():
    out = html.regression_table([(100.0, 150, "k", 50.1234)])
    assert "50.12%" in out
    assert "100.00%" in out  # avg column is float too, same rule as reference


def test_chart_data_prep_sorts_and_scales():
    dates, values = chart.trend_points([("2024-02-01", 1500), ("2024-01-01", 900)])
    assert dates == ["2024-01-01", "2024-02-01"]
    assert values == [900, 1500]
    assert chart.ytick_ceiling(12973) == 13000 + 1000


def test_chart_renderer_gated_when_matplotlib_missing(tmp_path):
    out = chart.render_trend_chart(
        [("2024-01-01", 100)], str(tmp_path / "g.png")
    )
    if chart.HAVE_MATPLOTLIB:
        assert out is not None
    else:
        assert out is None


def test_build_message_inlines_chart(tmp_path):
    png = tmp_path / "g.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\nfake")
    msg = email_sink.build_message(
        "subj", "a@x", ["b@y", "c@z"], "<html></html>", chart_path=str(png)
    )
    parts = msg.get_payload()
    assert msg["To"] == "b@y, c@z"
    assert parts[0].get_content_type() == "text/html"
    assert parts[1].get_content_type() == "image/png"
    assert parts[1]["Content-ID"] == "<graph_cid>"


def test_run_report_end_to_end(spark, sf_dir):
    res = pipeline.run_report(spark, sf_dir)
    assert len(res.metrics) == 5
    assert "<h1>" in res.html_report
    assert res.regressions and res.samples
    # every section's rows made it into the html
    assert str(res.regressions[0][1]) in res.html_report
