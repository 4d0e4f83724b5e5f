"""Stream-stream trades⋈quotes interval join: watermark-bounded state,
quote-age window, batch/streaming parity."""

from __future__ import annotations

import json
import os

from real_time_financial_market_data_pipeline_spark.sources.streaming import read_quote_stream, read_trade_stream
from real_time_financial_market_data_pipeline_spark.streaming.joins import best_quote_per_trade, trades_with_quotes

T0 = 1_700_000_100_000


def test_stream_stream_interval_join(spark, tmp_path):
    tfeed, qfeed = str(tmp_path / "trades"), str(tmp_path / "quotes")
    os.makedirs(tfeed)
    os.makedirs(qfeed)
    with open(os.path.join(tfeed, "t.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 60_000}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 60_000}) + "\n")
    with open(os.path.join(qfeed, "q.json"), "w") as f:
        # two in-window AAPL quotes (join keeps both; best = latest)
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
                            "ask_price": 151.0, "ask_size": 5, "timestamp": T0}) + "\n")
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.5, "bid_size": 5,
                            "ask_price": 150.5, "ask_size": 5, "timestamp": T0 + 30_000}) + "\n")
        # MSFT quote too old (> 5 min before the trade) → no match
        f.write(json.dumps({"symbol": "MSFT", "bid_price": 379.0, "bid_size": 1,
                            "ask_price": 381.0, "ask_size": 1, "timestamp": T0 - 360_000}) + "\n")

    trades = read_trade_stream(spark, tfeed)
    quotes = read_quote_stream(spark, qfeed)
    joined = trades_with_quotes(trades, quotes, max_quote_age="5 minutes")

    q = (
        joined.writeStream.format("memory")
        .queryName("tq_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM tq_join").collect()
    by_symbol: dict[str, list] = {}
    for r in rows:
        by_symbol.setdefault(r["symbol"], []).append(r)
    assert len(by_symbol.get("AAPL", [])) == 2  # both in-window quotes matched
    assert "MSFT" not in by_symbol  # stale quote excluded by interval condition

    # batch parity: the same function on static frames + best-quote reduction
    t_static = spark.createDataFrame(
        [("AAPL", 150.0, 100)], "symbol string, price double, volume long"
    ).selectExpr("symbol", "price", "volume",
                 f"timestamp_millis({T0 + 60_000}) AS event_time")
    q_static = spark.createDataFrame(
        [("AAPL", 149.0, 151.0, T0), ("AAPL", 149.5, 150.5, T0 + 30_000)],
        "symbol string, bid_price double, ask_price double, ts long",
    ).selectExpr("symbol", "bid_price", "ask_price", "timestamp_millis(ts) AS event_time")
    best = best_quote_per_trade(trades_with_quotes(t_static, q_static)).collect()
    assert len(best) == 1
    assert best[0]["bid_price"] == 149.5  # latest quote won
    assert abs(best[0]["price_vs_mid"] - 0.0) < 1e-9


def test_quote_enrich_job_end_to_end(spark, tmp_path):
    """QuoteEnrichJob (round-2 VERDICT task 6): live availableNow drain
    of the trades⋈quotes dataflow to enriched + best_quote layers with
    per-layer checkpoints, then the serving view; a restart with no new
    data must be a no-op."""
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    out = str(tmp_path / "out")
    os.makedirs(tfeed)
    os.makedirs(qfeed)
    with open(os.path.join(tfeed, "t.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 60_000}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 60_000}) + "\n")
    with open(os.path.join(qfeed, "q.json"), "w") as f:
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
                            "ask_price": 151.0, "ask_size": 5, "timestamp": T0}) + "\n")
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.5, "bid_size": 5,
                            "ask_price": 150.5, "ask_size": 5, "timestamp": T0 + 30_000}) + "\n")
        f.write(json.dumps({"symbol": "MSFT", "bid_price": 379.0, "bid_size": 1,
                            "ask_price": 381.0, "ask_size": 1, "timestamp": T0 - 360_000}) + "\n")

    def run_once():
        job = QuoteEnrichJob(out_dir=out)
        mgr = job.start(
            read_trade_stream(spark, tfeed), read_quote_stream(spark, qfeed)
        )
        assert mgr.await_all(timeout_s=120)
        assert set(mgr.status()) == {"quotes_enriched", "quotes_best"}

    run_once()

    enriched = spark.read.parquet(os.path.join(out, "enriched"))
    assert enriched.count() == 2  # both in-window AAPL quotes; MSFT stale
    assert set(enriched.select("symbol").distinct().toPandas()["symbol"]) == {"AAPL"}

    view = best_quote_view(spark, out)
    rows = view.collect()
    assert len(rows) == 1
    best = rows[0]
    assert best["symbol"] == "AAPL"
    assert best["bid_price"] == 149.5 and best["ask_price"] == 150.5  # latest quote
    assert abs(best["price_vs_mid"] - (150.0 - 150.0)) < 1e-9

    run_once()  # restart, no new data → checkpoints make it a no-op
    assert spark.read.parquet(os.path.join(out, "enriched")).count() == 2
    assert best_quote_view(spark, out).count() == 1
