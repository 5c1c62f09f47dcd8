from tableau_dashboard_performance_etl_automation_spark.sources.delimited import (
    LoadResult,
    load_delimited,
    load_manifest,
)

__all__ = ["LoadResult", "load_delimited", "load_manifest"]
