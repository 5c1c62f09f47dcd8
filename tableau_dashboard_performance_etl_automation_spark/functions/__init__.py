from tableau_dashboard_performance_etl_automation_spark.functions.expressions import (
    digits_only,
    epoch_ms_string,
    floor_int,
    guarded_pct_diff,
    ts_from_epoch_ms_string,
)

__all__ = [
    "digits_only",
    "epoch_ms_string",
    "floor_int",
    "guarded_pct_diff",
    "ts_from_epoch_ms_string",
]
