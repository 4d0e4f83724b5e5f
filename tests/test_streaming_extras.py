"""Streaming extras: processing-time trigger, observe() metrics,
session windows on a stream, graceful shutdown, Kafka wire roundtrip."""

from __future__ import annotations

import json
import os
import signal
import time

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.schemas import TRADE_WIRE_SCHEMA
from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
from real_time_financial_market_data_pipeline_spark.streaming.jobs import observed_with_metrics
from real_time_financial_market_data_pipeline_spark.streaming.runner import GracefulRunner
from real_time_financial_market_data_pipeline_spark.streaming.sinks import SinkManager

T0 = 1_700_000_100_000


def _write_feed(feed: str, n: int = 5) -> None:
    os.makedirs(feed, exist_ok=True)
    with open(os.path.join(feed, "f.json"), "w") as f:
        for i in range(n):
            f.write(json.dumps({"s": "AAPL", "p": 100.0 + i, "v": 10, "t": T0 + i * 1000}) + "\n")


def test_processing_time_trigger_and_graceful_stop(spark, tmp_path):
    feed = str(tmp_path / "feed")
    _write_feed(feed)
    trades = read_trade_stream(spark, feed)
    q = (
        trades.writeStream.format("memory")
        .queryName("pt_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    mgr = SinkManager()
    mgr.add(q)
    deadline = time.time() + 60
    while time.time() < deadline and spark.sql("SELECT * FROM pt_mem").count() < 5:
        time.sleep(0.5)
    assert spark.sql("SELECT * FROM pt_mem").count() == 5

    runner = GracefulRunner(mgr).install()
    os.kill(os.getpid(), signal.SIGTERM)  # simulated operator shutdown
    assert runner.run(timeout_s=60)
    assert runner.stopped_by_signal == signal.SIGTERM
    assert not q.isActive
    # handlers restored: SIGTERM no longer routed to the runner
    assert signal.getsignal(signal.SIGTERM) is not runner._handler


def test_runner_timeout_without_signal_keeps_queries_alive(spark, tmp_path):
    """run(timeout) expiring with NO signal must not stop the queries
    (regression: restore() used to trip the stopper thread)."""
    feed = str(tmp_path / "feed")
    _write_feed(feed)
    q = (
        read_trade_stream(spark, feed)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    mgr = SinkManager()
    mgr.add(q)
    runner = GracefulRunner(mgr).install()
    done = runner.run(timeout_s=2)  # expires without any signal
    time.sleep(1.0)  # give a (buggy) stopper thread time to act
    try:
        assert not done
        assert runner.stopped_by_signal is None
        assert q.isActive  # still running — timeout is not a shutdown
    finally:
        q.stop()


def test_observe_metrics_surface_in_progress(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "f.json"), "w") as f:
        f.write(json.dumps({"s": "A", "p": 10.0, "v": 5, "t": T0}) + "\n")
        f.write(json.dumps({"s": "A", "p": -1.0, "v": 0, "t": T0 + 1000}) + "\n")
    trades = observed_with_metrics(read_trade_stream(spark, feed))
    q = (
        trades.writeStream.format("noop")
        .queryName("obs")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = [p["observedMetrics"]["validation"] for p in q.recentProgress
               if p.get("observedMetrics", {}).get("validation")]
    assert metrics, "no observed metrics in progress"
    m = metrics[-1]
    assert m["total"] == 2
    assert m["nonpositive_volume"] == 1
    assert m["nonpositive_price"] == 1


def test_session_window_on_stream(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "f.json"), "w") as f:
        # two bursts 90 min apart → two sessions for AAPL
        for off in [0, 60_000, 120_000]:
            f.write(json.dumps({"s": "AAPL", "p": 10.0, "v": 1, "t": T0 + off}) + "\n")
        f.write(json.dumps({"s": "AAPL", "p": 20.0, "v": 2, "t": T0 + 90 * 60_000}) + "\n")
        # sentinel far ahead: advances the watermark past session 2's close
        # (append mode only emits sessions already sealed by the watermark);
        # the sentinel's own session stays open and unemitted
        f.write(json.dumps({"s": "ZZZ", "p": 1.0, "v": 1, "t": T0 + 10 * 3600_000}) + "\n")
    trades = read_trade_stream(spark, feed).withWatermark("event_time", "10 minutes")
    sess = (
        trades.groupBy("symbol", F.session_window("event_time", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("symbol", F.col("w.start").alias("start"), "n")
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM sess_mem WHERE symbol = 'AAPL'").collect(),
        key=lambda r: r["start"],
    )
    assert [r["n"] for r in rows] == [3, 1]


def test_union_trade_streams(spark, tmp_path):
    """Multi-feed merge (the reference's trades_raw + crypto_raw): two
    file feeds union into one stream feeding the same pipeline."""
    from real_time_financial_market_data_pipeline_spark.sources.streaming import union_trade_streams

    f1, f2 = str(tmp_path / "equities"), str(tmp_path / "crypto")
    for d, sym in [(f1, "AAPL"), (f2, "BTCUSD")]:
        os.makedirs(d)
        with open(os.path.join(d, "a.json"), "w") as f:
            f.write(json.dumps({"s": sym, "p": 5.0, "v": 1, "t": T0}) + "\n")
    merged = union_trade_streams(
        read_trade_stream(spark, f1), read_trade_stream(spark, f2)
    )
    q = (
        merged.writeStream.format("memory")
        .queryName("merged_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    syms = {r["symbol"] for r in spark.sql("SELECT * FROM merged_mem").collect()}
    assert syms == {"AAPL", "BTCUSD"}


def test_kafka_wire_roundtrip_shape(spark):
    """The Kafka egress selectExpr (key = symbol, value = to_json(struct(*)))
    parsed back through the ingress from_json path — byte-level contract
    between S6 and S1 without a broker."""
    df = spark.createDataFrame(
        [("AAPL", 150.25, 100, T0, ["1", "12"])],
        "s string, p double, v long, t long, c array<string>",
    )
    wire = df.select(
        F.col("s").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )
    parsed = wire.select(
        F.from_json(F.col("value").cast("string"), TRADE_WIRE_SCHEMA).alias("trade")
    ).select("trade.*")
    row = parsed.collect()[0]
    assert (row["s"], row["p"], row["v"], row["t"], row["c"]) == (
        "AAPL",
        150.25,
        100,
        T0,
        ["1", "12"],
    )
