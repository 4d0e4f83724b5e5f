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
        # single-query topology: one join query writes both layers
        assert set(mgr.status()) == {"quotes_enriched"}

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


def test_best_quote_partials_across_batches_and_compaction(spark, tmp_path):
    """The partial-reduction contract: best_quote/ holds batch-LOCAL
    maxima, and a trade's true best quote may arrive in a LATER
    micro-batch.  The view's re-reduce must pick the global best across
    partials, and compaction (same reduction) must not change the view."""
    import re

    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    out = str(tmp_path / "out")
    os.makedirs(tfeed)
    os.makedirs(qfeed)
    # batch 1: the trade + an early in-window quote
    with open(os.path.join(tfeed, "t0.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 120_000}) + "\n")
    with open(os.path.join(qfeed, "q0.json"), "w") as f:
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
                            "ask_price": 151.0, "ask_size": 5, "timestamp": T0}) + "\n")
    # batch 2: a LATER in-window quote for the same trade (the true best)
    with open(os.path.join(qfeed, "q1.json"), "w") as f:
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.8, "bid_size": 5,
                            "ask_price": 150.2, "ask_size": 5, "timestamp": T0 + 60_000}) + "\n")
    import time as _time

    base = _time.time() - 10
    os.utime(os.path.join(qfeed, "q0.json"), (base, base))
    os.utime(os.path.join(qfeed, "q1.json"), (base + 5, base + 5))

    # compact_every=None: keep raw partial dirs for inspection (the
    # default job folds them right after an availableNow drain)
    job = QuoteEnrichJob(out_dir=out, compact_every=None)
    mgr = job.start(
        read_trade_stream(spark, tfeed),
        read_quote_stream(spark, qfeed, max_files_per_trigger=1),
    )
    assert mgr.await_all(timeout_s=120)

    best_dir = os.path.join(out, "best_quote")
    n_partial_dirs = len(
        [d for d in os.listdir(best_dir) if re.fullmatch(r"batch_id=\d+", d)]
    )
    assert n_partial_dirs >= 2  # the two quotes landed in separate batches

    rows = best_quote_view(spark, out).collect()
    assert len(rows) == 1
    assert rows[0]["bid_price"] == 149.8  # later batch's quote won

    # compaction folds the partials with the same reduction: exact
    assert job.compact_best_quote(spark) == n_partial_dirs
    rows_after = best_quote_view(spark, out).collect()
    assert [tuple(r) for r in rows_after] == [tuple(r) for r in rows]


def test_quote_enrich_rocksdb_state_store_matches_default(spark, tmp_path):
    """use_rocksdb_state=True runs the stream-stream interval join on the
    RocksDB state store provider and must produce byte-identical layers
    to the default provider (the toggle exists for deployments whose
    join state outgrows executor heap; measured parity at local state
    sizes is recorded in SCALE.md)."""
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    os.makedirs(tfeed)
    os.makedirs(qfeed)
    with open(os.path.join(tfeed, "t.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 60_000}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 90_000}) + "\n")
    with open(os.path.join(qfeed, "q.json"), "w") as f:
        f.write(json.dumps({"symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
                            "ask_price": 151.0, "ask_size": 5, "timestamp": T0}) + "\n")
        f.write(json.dumps({"symbol": "MSFT", "bid_price": 379.0, "bid_size": 1,
                            "ask_price": 381.0, "ask_size": 1, "timestamp": T0 + 60_000}) + "\n")

    results = {}
    for label, rocks in [("default", False), ("rocksdb", True)]:
        out = str(tmp_path / f"out_{label}")
        job = QuoteEnrichJob(out_dir=out, use_rocksdb_state=rocks)
        mgr = job.start(
            read_trade_stream(spark, tfeed), read_quote_stream(spark, qfeed)
        )
        assert mgr.await_all(timeout_s=120)
        enriched = spark.read.parquet(os.path.join(out, "enriched")).drop("batch_id")
        results[label] = (
            sorted(tuple(r) for r in enriched.collect()),
            sorted(tuple(r) for r in best_quote_view(spark, out).collect()),
        )
    assert results["rocksdb"] == results["default"]
    assert len(results["default"][1]) == 2  # one best quote per trade
    # the toggle must not leak the provider into the shared session
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        )
        != "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
