from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob
from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
    SinkManager,
    compact_gold_bucketed,
    compact_latest_state,
    parquet_sink,
)

__all__ = [
    "SinkManager",
    "parquet_sink",
    "MedallionStreamJob",
    "compact_latest_state",
    "compact_gold_bucketed",
]
