"""HTML report renderer — the Spark-side twin of the reference's
email body builder (tabjolt_email.py:137-333): a summary
metric/value table, the regression table with red-alert styling, the
raw-samples table, and the improvements table.

Rendering consumes *collected* rows (the reports are human-sized by
construction: per-key aggregates and alert subsets, never the raw
fact table), so this layer is plain Python on purpose — the engine
work happened upstream in the DataFrame plans.
"""

from __future__ import annotations

from collections.abc import Sequence

#: Strict red-alert rule (tabjolt_email.py:223: ``> 20.0``).
RED_ALERT_THRESHOLD = 20.0

_STYLE = """
<style>
  table { border-collapse: collapse; width: 100%;
          font-family: Roboto, sans-serif; }
  th, td { border: 1px solid #dddddd; text-align: left; padding: 8px; }
  th { background-color: #d3f9d8; color: black; }
  h1 { color: #333; }
</style>
"""


def _fmt(value: object) -> str:
    """Float → two-decimal percent string, like tabjolt_email.py:228-229."""
    if isinstance(value, float):
        return f"{value:.2f}%"
    return "" if value is None else str(value)


def _table(headers: Sequence[str], rows: Sequence[Sequence[object]],
           row_style=None) -> str:
    head = "".join(f"<th>{h}</th>" for h in headers)
    body = []
    for row in rows:
        style = row_style(row) if row_style else ""
        cells = "".join(f"<td style='{style}'>{_fmt(c)}</td>" for c in row)
        body.append(f"<tr>{cells}</tr>")
    return (
        f"<table><thead><tr>{head}</tr></thead>"
        f"<tbody>{''.join(body)}</tbody></table>"
    )


def summary_table(metrics: Sequence[tuple[str, object]]) -> str:
    return _table(["Metric", "Value"], metrics)


def regression_table(rows: Sequence[Sequence[object]],
                     pct_index: int = 3) -> str:
    """Regression rows with the strict red rule applied per row."""

    def style(row: Sequence[object]) -> str:
        pct = row[pct_index]
        return (
            "color: red;"
            if isinstance(pct, (int, float)) and pct > RED_ALERT_THRESHOLD
            else ""
        )

    return _table(
        [
            "AVG_Elapsed_time_ms",
            "Current_Elapsed_time",
            "Response message",
            "Percentage difference",
        ],
        rows,
        row_style=style,
    )


def samples_table(rows: Sequence[Sequence[object]]) -> str:
    return _table(
        [
            "Elapsed_time_ms",
            "User",
            "Request_label",
            "Response_message",
        ],
        rows,
    )


def improvements_table(rows: Sequence[Sequence[object]]) -> str:
    return _table(
        [
            "AVG_Elapsed_time_ms",
            "Current_Elapsed_time",
            "Response message",
            "Percentage difference",
        ],
        rows,
    )


def render_report(
    subject: str,
    metrics: Sequence[tuple[str, object]],
    regressions: Sequence[Sequence[object]],
    samples: Sequence[Sequence[object]],
    improvements: Sequence[Sequence[object]],
    chart_cid: str | None = "graph_cid",
) -> str:
    """Assemble the full report body in the reference's section order
    (tabjolt_email.py:137-321)."""
    chart = (
        f'<img src="cid:{chart_cid}" alt="Average Time Graph" '
        'style="display: block; margin: 20px auto;">'
        if chart_cid
        else ""
    )
    return f"""<html><head>{_STYLE}</head><body>
<h1>{subject}</h1>
<p>Hi,</p>
<p><b>Here are the results from the latest run:</b></p>
{summary_table(metrics)}
<p>Average time taken (day wise):</p>
{chart}
<p><b>Performance samples where elapsed time is more than average:</b></p>
{regression_table(regressions)}
<p><b>Performance samples data:</b></p>
{samples_table(samples)}
<p><b>Keys taking more than 40% less time than their average:</b></p>
{improvements_table(improvements)}
</body></html>"""
