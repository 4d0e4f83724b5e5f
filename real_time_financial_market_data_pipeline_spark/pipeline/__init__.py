from real_time_financial_market_data_pipeline_spark.pipeline.validate import (
    split_valid,
    validation_metrics,
    with_validation_errors,
)
from real_time_financial_market_data_pipeline_spark.pipeline.medallion import to_bronze, to_silver

__all__ = [
    "with_validation_errors",
    "split_valid",
    "validation_metrics",
    "to_bronze",
    "to_silver",
]
