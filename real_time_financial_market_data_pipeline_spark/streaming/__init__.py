from real_time_financial_market_data_pipeline_spark.streaming.curation import (
    CuratedCorpusPipeline,
    curated_view,
)
from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
    LatestPricesStreamJob,
    MedallionStreamJob,
    gold_view,
    latest_prices_view,
)
from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
    SinkManager,
    compact_gold_bucketed,
    compact_latest_state,
    parquet_sink,
    read_update_sink,
)

__all__ = [
    "CuratedCorpusPipeline",
    "curated_view",
    "SinkManager",
    "parquet_sink",
    "read_update_sink",
    "MedallionStreamJob",
    "LatestPricesStreamJob",
    "latest_prices_view",
    "gold_view",
    "compact_latest_state",
    "compact_gold_bucketed",
]
