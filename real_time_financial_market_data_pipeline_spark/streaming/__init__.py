from real_time_financial_market_data_pipeline_spark.streaming.sinks import SinkManager, parquet_sink
from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob

__all__ = ["SinkManager", "parquet_sink", "MedallionStreamJob"]
