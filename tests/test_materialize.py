"""Materialized medallion layout: date partitioning on disk + proven
partition pruning on date-ranged serving reads."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.pipeline.materialize import (
    latest_bars_from_bucketed,
    materialize_gold_bucketed,
    materialize_medallion,
)
from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES, _gold_5m, _silver
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


def test_bucketed_gold_serving_is_shuffle_free(spark, tmp_path):
    """Round-2 VERDICT task 5: gold_5m written bucketBy(symbol) /
    sortBy(symbol, window_start) must serve Q5 (latest 50 bars per
    symbol) with ZERO Exchange — the bucketed scan's partitioning
    satisfies the rank window's distribution — and return exactly what
    the compute-from-silver path returns."""
    bars = _gold_5m(spark, SF_DIR)
    materialize_gold_bucketed(
        spark, bars, "gold_5m_bucketed_test", n_buckets=8,
        path=str(tmp_path / "gold_5m_bucketed"),
    )
    try:
        served = latest_bars_from_bucketed(spark, "gold_5m_bucketed_test")
        plan = served._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan[:2000]

        expected = sorted(
            tuple(r) for r in QUERIES["latest_bars_per_symbol"](spark, SF_DIR).collect()
        )
        got = sorted(tuple(r) for r in served.collect())
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_5m_bucketed_test")


def test_bucketed_gold_serves_q6_q7_day_over_day_shuffle_free(spark, tmp_path):
    """Round-3 VERDICT task 7: Q6/Q7 (volume/trade_count by symbol) and
    day-over-day volume also serve off the bucketed gold layout with
    ZERO Exchange — grouping/window keys are supersets of the bucket key
    (symbol), so the scan's HashPartitioning satisfies every
    distribution in both plans — and match the recompute path."""
    from real_time_financial_market_data_pipeline_spark.pipeline.materialize import (
        day_over_day_from_bucketed,
        volume_by_symbol_from_bucketed,
    )
    from real_time_financial_market_data_pipeline_spark.serving.queries import REF_DATE

    bars = _gold_5m(spark, SF_DIR)
    materialize_gold_bucketed(
        spark, bars, "gold_5m_bucketed_t2", n_buckets=8,
        path=str(tmp_path / "gold_5m_bucketed"),
    )
    try:
        vol = volume_by_symbol_from_bucketed(spark, "gold_5m_bucketed_t2", REF_DATE)
        plan = vol._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        expected = sorted(
            tuple(r) for r in QUERIES["volume_by_symbol_on_date"](spark, SF_DIR).collect()
        )
        assert sorted(tuple(r) for r in vol.collect()) == expected

        dod = day_over_day_from_bucketed(spark, "gold_5m_bucketed_t2")
        plan = dod._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # day_over_day_volume recomputes from silver (daily sums are the
        # same through 5m bars: windows never span dates)
        expected = sorted(
            tuple(r) for r in QUERIES["day_over_day_volume"](spark, SF_DIR).collect()
        )
        assert sorted(tuple(r) for r in dod.collect()) == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_5m_bucketed_t2")
