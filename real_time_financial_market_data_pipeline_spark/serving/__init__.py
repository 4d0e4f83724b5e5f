from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
