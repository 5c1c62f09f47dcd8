"""CLI entry point: run the daily report pipeline or a named query.

    python -m tableau_dashboard_performance_etl_automation_spark report \
        --sf-dir /root/testdata/sf0.01 --html-out /tmp/report.html
    python -m tableau_dashboard_performance_etl_automation_spark query \
        q_regressions --sf-dir /root/testdata/sf0.01 [--limit 20]
    python -m tableau_dashboard_performance_etl_automation_spark list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tdpe-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_report = sub.add_parser("report", help="run the daily report pipeline")
    p_report.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_report.add_argument("--html-out", default=None)
    p_report.add_argument("--chart-out", default=None)
    p_report.add_argument(
        "--config",
        default=None,
        help="reference-shaped config.json; its s3 section is bridged "
        "to fs.s3a.* and its smtp section is used with --send",
    )
    p_report.add_argument(
        "--send",
        action="store_true",
        help="actually send the report email (requires --config smtp)",
    )

    p_query = sub.add_parser("query", help="run one registered query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_query.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")

    args = parser.parse_args(argv)

    import __spark_entry__ as entry_mod

    if args.cmd == "list":
        for name in entry_mod.queries():
            print(name)
        return 0

    from tableau_dashboard_performance_etl_automation_spark.session import get_spark

    spark = get_spark("tdpe-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "report":
            from tableau_dashboard_performance_etl_automation_spark import pipeline

            smtp_config = None
            if args.config:
                cfg = pipeline.load_config(args.config)
                if cfg.get("s3"):
                    from tableau_dashboard_performance_etl_automation_spark.sources.s3 import (
                        configure_s3a,
                    )

                    configure_s3a(spark, cfg["s3"])
                if args.send:
                    smtp_config = cfg.get("smtp")
            res = pipeline.run_report(
                spark,
                args.sf_dir,
                chart_out=args.chart_out,
                smtp_config=smtp_config,
            )
            for metric, value in res.metrics:
                print(f"{metric}: {value}")
            print(
                f"{len(res.regressions)} regressions, "
                f"{len(res.improvements)} improvements"
            )
            if args.html_out:
                with open(args.html_out, "w") as f:
                    f.write(res.html_report)
                print(f"report written to {args.html_out}")
            return 0

        queries = entry_mod.queries()
        if args.name not in queries:
            print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
            return 2
        queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
