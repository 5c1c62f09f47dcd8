from tableau_dashboard_performance_etl_automation_spark.plans.explain import (
    formatted_plan,
    has_broadcast_hash_join,
    has_cartesian_product,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
]
