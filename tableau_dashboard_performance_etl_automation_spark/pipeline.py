"""End-to-end daily-report pipeline — the engine's equivalent of the
reference's ``__main__`` block (tabjolt_email.py:345-394):

    extract (files/s3a) → load with reject capture → the nine
    queries → chart + HTML report → (optional) SMTP send.

Differences by design: extraction is a Spark read (s3a:// URIs go
straight to the distributed reader — no driver-side boto3 download
step), loads are the PERMISSIVE reject-capturing reader
(sources/delimited.py), and all analytics are DataFrame plans
(operators/tabjolt.py). Only the final human-sized report rows are
ever collected.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from tableau_dashboard_performance_etl_automation_spark.operators import tabjolt
from tableau_dashboard_performance_etl_automation_spark.reports import (
    chart,
    email_sink,
    html,
)


@dataclass
class PipelineResult:
    metrics: list[tuple[str, object]]
    regressions: list[tuple]
    samples: list[tuple]
    improvements: list[tuple]
    html_report: str
    chart_path: str | None = None
    rejected_counts: dict[str, int] = field(default_factory=dict)


def load_config(config_file: str) -> dict:
    """JSON config document (reference config.json shape: smtp/source
    sections; tabjolt_email.py:12-15)."""
    with open(config_file) as f:
        return json.load(f)


def run_report(
    spark: SparkSession,
    sf_dir: str,
    subject: str = "Daily Performance Run Summary",
    chart_out: str | None = None,
    smtp_config: dict | None = None,
) -> PipelineResult:
    """Run the reference's report queries and assemble the email body.

    ``smtp_config=None`` (default) builds but does not send — sending
    is an explicit opt-in with real credentials, mirroring the
    reference's config-driven send (tabjolt_email.py:389-394).
    """
    q = tabjolt.QUERIES
    metrics = [
        (
            "Average time for the latest run (ms)",
            q["q_summary_avg_today"](spark, sf_dir).collect()[0][0],
        ),
        (
            "Maximum time for the latest run (ms)",
            q["q_summary_max_today"](spark, sf_dir).collect()[0][0],
        ),
        (
            "Minimum time for the latest run (ms)",
            q["q_summary_min_today"](spark, sf_dir).collect()[0][0],
        ),
        (
            "Latest event at",
            q["q_last_run_ts"](spark, sf_dir).collect()[0][0],
        ),
        (
            "Historic average (ms)",
            q["q_historic_avg"](spark, sf_dir).collect()[0][0],
        ),
    ]
    regressions = [tuple(r) for r in q["q_regressions"](spark, sf_dir).collect()]
    samples = [tuple(r) for r in q["q_samples_today"](spark, sf_dir).collect()]
    improvements = [
        tuple(r) for r in q["q_improvements"](spark, sf_dir).collect()
    ]
    trend_rows = [tuple(r) for r in q["q_trend_series"](spark, sf_dir).collect()]

    chart_path = (
        chart.render_trend_chart(trend_rows, chart_out) if chart_out else None
    )
    body = html.render_report(
        subject,
        metrics,
        regressions,
        samples,
        improvements,
        chart_cid="graph_cid" if chart_path else None,
    )
    if smtp_config:
        msg = email_sink.build_message(
            subject,
            smtp_config["sender_email"],
            smtp_config["recipient_emails"],
            body,
            chart_path=chart_path,
        )
        email_sink.send(msg, smtp_config)
    return PipelineResult(
        metrics=metrics,
        regressions=regressions,
        samples=samples,
        improvements=improvements,
        html_report=body,
        chart_path=chart_path,
    )
