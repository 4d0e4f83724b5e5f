from real_time_financial_market_data_pipeline_spark.plans.inspect import (
    count_shuffles,
    has_broadcast_hash_join,
    physical_plan,
    pushed_filters,
    scan_read_schemas,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "scan_read_schemas",
    "has_broadcast_hash_join",
    "count_shuffles",
]
