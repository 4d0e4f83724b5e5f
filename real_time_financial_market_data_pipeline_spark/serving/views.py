"""Registered-view SQL surface: the reference's Grafana/CQL serving
queries (SURVEY §2.6 Q1-Q10) as Spark SQL over temp views.

The views chain silver → gold off the events-derived trade stream, so
`spark.sql(SERVING_SQL["q5_latest_bars"])` answers exactly what the
reference's Cassandra + Grafana stack answered — partition-prunable by
trade_date, no external serving store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from real_time_financial_market_data_pipeline_spark.serving.queries import AS_OF, REF_DATE, _gold_5m, _silver
from real_time_financial_market_data_pipeline_spark.operators.latest import latest_prices
from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv
from real_time_financial_market_data_pipeline_spark.tables import register_views


def register_market_views(spark: SparkSession, sf_dir: str) -> None:
    """Register raw testdata views + derived market views
    (trades_silver, gold_5m, gold_1h, latest_prices_v)."""
    register_views(spark, sf_dir)
    silver = _silver(spark, sf_dir)
    silver.createOrReplaceTempView("trades_silver")
    _gold_5m(spark, sf_dir).createOrReplaceTempView("trades_gold_5m")
    ohlcv(silver, "1 hour").createOrReplaceTempView("trades_gold_1h")
    latest_prices(silver, tiebreaker_col="event_id").createOrReplaceTempView(
        "latest_prices_v"
    )


# Q1-Q10 per SURVEY §2.6 — `toDate(now())` pinned to REF_DATE for
# reproducibility (same substitution the oracle side makes).
SERVING_SQL: dict[str, str] = {
    "q1_pipeline_status": f"""
        SELECT count(*) AS n FROM trades_silver
        WHERE trade_date = DATE '{REF_DATE}' LIMIT 1
    """,
    "q2_trades_today": f"""
        SELECT count(*) AS n FROM trades_silver WHERE trade_date = DATE '{REF_DATE}'
    """,
    "q3_total_volume": f"""
        SELECT sum(volume) AS total_volume FROM trades_gold_5m
        WHERE to_date(window_start) = DATE '{REF_DATE}'
    """,
    "q4_last_update": f"""
        SELECT max(window_start) AS last_window FROM trades_gold_5m
        WHERE to_date(window_start) = DATE '{REF_DATE}'
    """,
    "q5_latest_bars": f"""
        SELECT window_start, open, high, low, close, volume
        FROM trades_gold_5m
        WHERE symbol = 'purchase' AND to_date(window_start) = DATE '{REF_DATE}'
        ORDER BY window_start DESC LIMIT 50
    """,
    "q6_volume_by_symbol": f"""
        SELECT symbol, sum(volume) AS total_volume FROM trades_gold_5m
        WHERE to_date(window_start) = DATE '{REF_DATE}' GROUP BY symbol
    """,
    "q7_trades_by_symbol": f"""
        SELECT symbol, sum(trade_count) AS total_trades FROM trades_gold_5m
        WHERE to_date(window_start) = DATE '{REF_DATE}' GROUP BY symbol
    """,
    "q8_latest_prices": """
        SELECT symbol, last_price, last_volume, last_trade_time,
               price_change, price_change_pct
        FROM latest_prices_v
    """,
    "q9_avg_latency_alert": f"""
        SELECT avg(unix_millis(event_time) - ts_ms) / 1000.0 AS avg_latency_s
        FROM trades_silver WHERE trade_date = DATE '{REF_DATE}'
    """,
    "q10_point_lookup": f"""
        SELECT symbol, price, volume, event_time FROM trades_silver
        WHERE symbol = 'purchase' AND trade_date = DATE '{REF_DATE}'
        ORDER BY event_time DESC LIMIT 100
    """,
}
