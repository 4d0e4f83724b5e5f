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


def test_market_calendar_reference_parity(spark):
    """Holiday calendar + extended sessions vs the reference's
    MarketHours semantics (reference src/utils/time_utils.py:23-60):
    every probe is (utc_ts, expected_session)."""
    from real_time_financial_market_data_pipeline_spark.functions.timeutils import (
        MARKET_HOLIDAYS_2024_2025,
        is_extended_market_hours,
        is_market_holiday,
        is_market_open,
        market_session,
    )

    assert len(MARKET_HOLIDAYS_2024_2025) == 20  # 10 per year, 2024 + 2025

    probes = [
        # MLK Day 2024 (Mon Jan 15): holiday — closed even at 10:00 ET
        ("2024-01-15 15:00:00", "closed"),
        # New Year's Day 2024: holiday
        ("2024-01-01 15:00:00", "closed"),
        # Tue Jan 16 2024, 10:00 ET: regular
        ("2024-01-16 15:00:00", "regular"),
        # Tue Jan 16 2024, 08:00 ET: pre-market
        ("2024-01-16 13:00:00", "pre_market"),
        # Tue Jan 16 2024, 03:59 ET: before pre-market -> closed
        ("2024-01-16 08:59:00", "closed"),
        # Tue Jan 16 2024, 16:30 ET: after-hours
        ("2024-01-16 21:30:00", "after_hours"),
        # Tue Jan 16 2024, 20:00 ET: after-hours closed (half-open)
        ("2024-01-17 01:00:00", "closed"),
        # Saturday
        ("2024-01-13 15:00:00", "closed"),
        # July 4 2025 (Fri): holiday, and DST (EDT = UTC-4): 14:00 UTC = 10:00 ET
        ("2025-07-04 14:00:00", "closed"),
        # Thu July 3 2025, 10:00 ET during DST: regular
        ("2025-07-03 14:00:00", "regular"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in probes], "ts_str string").select(
        F.col("ts_str").cast("timestamp").alias("ts")
    )
    got = df.select(
        market_session(F.col("ts")).alias("session"),
        is_market_holiday(F.col("ts")).alias("holiday"),
        is_extended_market_hours(F.col("ts")).alias("ext"),
        is_market_open(F.col("ts"), include_extended=True).alias("open_ext"),
    ).collect()
    for (ts, want), row in zip(probes, got):
        assert row["session"] == want, f"{ts}: got {row['session']}, want {want}"
        assert row["ext"] == (want in ("pre_market", "after_hours")), ts
        assert row["open_ext"] == (want != "closed"), ts
    # holiday flag specifically
    assert got[0]["holiday"] and got[1]["holiday"] and not got[2]["holiday"]
