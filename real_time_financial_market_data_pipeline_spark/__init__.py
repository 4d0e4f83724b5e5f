"""PySpark-native analytics engine with the capability surface of
duckonthemic/Real-Time-Financial-Market-Data-Pipeline.

Brand-new Spark-first design (DataFrame/SQL/Catalyst/Structured Streaming);
blueprint in SURVEY.md. Nothing here is ported from the reference — the
reference defines WHAT to compute (medallion trade pipeline, OHLCV bars,
serving queries), this package defines HOW on Spark.
"""

from real_time_financial_market_data_pipeline_spark.session import configure, get_spark
from real_time_financial_market_data_pipeline_spark.tables import load_table, load_tables, register_views, trades_from_events

__all__ = [
    "get_spark",
    "configure",
    "load_table",
    "load_tables",
    "register_views",
    "trades_from_events",
]
