"""Serving SQL surface (Q1-Q10) + retention + market-hours utilities."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.functions.timeutils import is_regular_market_hours
from real_time_financial_market_data_pipeline_spark.pipeline.retention import DEFAULT_TTL_DAYS, apply_retention
from real_time_financial_market_data_pipeline_spark.serving.views import SERVING_SQL, register_market_views
from tests.conftest import SF_DIR


def test_serving_queries_all_run(spark):
    register_market_views(spark, SF_DIR)
    results = {name: spark.sql(sql).collect() for name, sql in SERVING_SQL.items()}
    assert results["q1_pipeline_status"][0]["n"] > 0
    assert results["q2_trades_today"][0]["n"] == results["q1_pipeline_status"][0]["n"]
    assert results["q3_total_volume"][0]["total_volume"] > 0
    assert results["q4_last_update"][0]["last_window"].date() == dt.date(2024, 1, 15)
    assert 0 < len(results["q5_latest_bars"]) <= 50
    # Q6 aggregates gold == aggregating silver directly
    direct = {
        r["symbol"]: r["v"]
        for r in spark.sql(
            "SELECT symbol, sum(volume) AS v FROM trades_silver "
            "WHERE trade_date = DATE '2024-01-15' GROUP BY symbol"
        ).collect()
    }
    via_gold = {r["symbol"]: r["total_volume"] for r in results["q6_volume_by_symbol"]}
    assert direct == via_gold
    assert len(results["q8_latest_prices"]) == 5  # one row per symbol
    assert 0 < len(results["q10_point_lookup"]) <= 100


def test_retention_removes_only_expired(tmp_path):
    table = str(tmp_path / "silver")
    for d in ["2024-01-01", "2024-01-20", "2024-02-10"]:
        os.makedirs(os.path.join(table, f"trade_date={d}"))
    removed = apply_retention(table, keep_days=30, now=dt.date(2024, 2, 15))
    assert [os.path.basename(p) for p in removed] == ["trade_date=2024-01-01"]
    left = sorted(os.listdir(table))
    assert left == ["trade_date=2024-01-20", "trade_date=2024-02-10"]
    assert DEFAULT_TTL_DAYS["bronze"] == 7  # reference envelope preserved


def test_retention_dry_run(tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "trade_date=2020-01-01"))
    doomed = apply_retention(table, keep_days=1, now=dt.date(2024, 1, 1), dry_run=True)
    assert len(doomed) == 1
    assert os.path.isdir(doomed[0])  # nothing deleted


def test_market_hours_predicate(spark):
    rows = [
        ("2024-01-16 15:00:00", True),   # Tue 10:00 ET — open
        ("2024-01-16 13:00:00", False),  # Tue 08:00 ET — pre-market
        ("2024-01-16 21:30:00", False),  # Tue 16:30 ET — after close
        ("2024-01-13 15:00:00", False),  # Saturday
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "ts_str string").select(
        F.col("ts_str").cast("timestamp").alias("ts")
    )
    got = [r["open"] for r in df.select(is_regular_market_hours(F.col("ts")).alias("open")).collect()]
    assert got == [e for _, e in rows]
