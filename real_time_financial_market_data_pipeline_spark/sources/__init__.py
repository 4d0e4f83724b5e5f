from real_time_financial_market_data_pipeline_spark.sources.bridge import (
    FeedBridge,
    ReconnectPolicy,
    subscribe_cap,
)
from real_time_financial_market_data_pipeline_spark.sources.streaming import (
    kafka_trade_stream,
    rate_trade_stream,
    read_trade_stream,
)

__all__ = [
    "read_trade_stream",
    "rate_trade_stream",
    "kafka_trade_stream",
    "FeedBridge",
    "ReconnectPolicy",
    "subscribe_cap",
]
