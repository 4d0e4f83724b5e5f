"""Stateful streaming latest_prices: state carries across micro-batches
(change vs previous trade spans batch boundaries)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
from real_time_financial_market_data_pipeline_spark.streaming.stateful import streaming_latest_prices

T0 = 1_700_000_100_000


def test_tws_variant_builds_plan(spark, tmp_path):
    """transformWithStateInPandas variant: plan construction + schema
    (execution requires a matching $SPARK_HOME python — see docstring)."""
    import json
    import os

    from real_time_financial_market_data_pipeline_spark.streaming.stateful import streaming_latest_prices_tws

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "a.json"), "w") as f:
        f.write(json.dumps({"s": "A", "p": 1.0, "v": 1, "t": T0}) + "\n")
    out = streaming_latest_prices_tws(read_trade_stream(spark, feed))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "symbol",
        "last_price",
        "last_volume",
        "last_trade_time",
        "price_change",
        "price_change_pct",
    ]


def test_latest_prices_state_across_batches(spark, tmp_path):
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    # batch files processed one per trigger (maxFilesPerTrigger=1)
    with open(os.path.join(feed, "b0.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 100.0, "v": 10, "t": T0}) + "\n")
    with open(os.path.join(feed, "b1.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 110.0, "v": 20, "t": T0 + 60_000}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 50.0, "v": 5, "t": T0 + 61_000}) + "\n")
    # the file source batches in modification-time order — pin it
    os.utime(os.path.join(feed, "b0.json"), (1_700_000_000, 1_700_000_000))
    os.utime(os.path.join(feed, "b1.json"), (1_700_000_100, 1_700_000_100))

    trades = read_trade_stream(spark, feed, max_files_per_trigger=1)
    latest = streaming_latest_prices(trades)
    q = (
        latest.writeStream.format("memory")
        .queryName("latest_prices_mem")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM latest_prices_mem").collect()
    # final emission per key: AAPL updated twice (two batches), MSFT once
    by_key = {}
    for r in rows:
        by_key.setdefault(r["symbol"], []).append(r)
    aapl_last = sorted(by_key["AAPL"], key=lambda r: r["last_trade_time"])[-1]
    assert aapl_last["last_price"] == 110.0
    assert aapl_last["price_change"] == 10.0  # vs 100.0 seen in PREVIOUS batch
    assert abs(aapl_last["price_change_pct"] - 10.0) < 1e-9
    msft = by_key["MSFT"][0]
    assert msft["last_price"] == 50.0 and msft["price_change"] is None
