"""Batch materialization of the medallion to partitioned parquet.

The serving story at scale: silver/gold land on disk partitioned by
trade_date (the reference's Cassandra (symbol, date) partition key,
re-expressed as lake layout), so every date-ranged serving query
prunes to the matching partition directories — file-level skipping
before a single row is read. Gold is additionally sorted by
(symbol, window_start) within files so per-symbol range reads are
contiguous (parquet min/max stats make symbol predicates cheap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv


def materialize_medallion(
    spark: SparkSession,
    silver: DataFrame,
    out_dir: str,
    gold_windows: dict[str, str] | None = None,
) -> dict[str, str]:
    """Write silver + gold tables; returns table_name -> path.

    gold_windows: table name -> window duration (default the reference's
    5m/1h pair).
    """
    gold_windows = gold_windows or {"gold_5m": "5 minutes", "gold_1h": "1 hour"}
    paths: dict[str, str] = {}

    silver_path = os.path.join(out_dir, "silver")
    (
        silver.repartition("trade_date")
        .sortWithinPartitions("symbol", "event_time")
        .write.mode("overwrite")
        .partitionBy("trade_date")
        .parquet(silver_path)
    )
    paths["silver"] = silver_path

    for name, dur in gold_windows.items():
        bars = ohlcv(silver, dur).withColumn("trade_date", F.to_date("window_start"))
        path = os.path.join(out_dir, name)
        (
            bars.repartition("trade_date")
            .sortWithinPartitions("symbol", "window_start")
            .write.mode("overwrite")
            .partitionBy("trade_date")
            .parquet(path)
        )
        paths[name] = path
    return paths
