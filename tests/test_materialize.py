"""Materialized medallion layout: date partitioning on disk + proven
partition pruning on date-ranged serving reads."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.pipeline.materialize import materialize_medallion
from real_time_financial_market_data_pipeline_spark.serving.queries import _silver
from tests.conftest import SF_DIR


def test_materialize_layout_and_pruning(spark, tmp_path):
    silver = _silver(spark, SF_DIR).withColumnRenamed("ts_ms", "timestamp")
    paths = materialize_medallion(spark, silver, str(tmp_path))
    assert set(paths) == {"silver", "gold_5m", "gold_1h"}

    # on-disk layout: one dir per trade_date
    date_dirs = [d for d in os.listdir(paths["silver"]) if d.startswith("trade_date=")]
    assert len(date_dirs) == 30  # events span 2024-01-01..30

    # a date-ranged serving query must prune to matching partitions:
    # (a) the scan carries the partition filter, (b) the files actually
    # read all live under the one matching trade_date directory
    g5 = spark.read.parquet(paths["gold_5m"])
    filtered = g5.filter(F.col("trade_date") == "2024-01-15")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*trade_date", plan), plan[:500]
    files = {
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    }
    assert files and all("trade_date=2024-01-15" in f for f in files), files

    # materialized gold equals recomputed gold
    recomputed = (
        _silver(spark, SF_DIR)
        .withColumnRenamed("ts_ms", "timestamp")
        .transform(lambda df: __import__("real_time_financial_market_data_pipeline_spark.operators.ohlcv", fromlist=["ohlcv"]).ohlcv(df, "5 minutes"))
        .count()
    )
    assert g5.count() == recomputed
