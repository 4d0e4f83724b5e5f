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
    """transformWithStateInPandas variant: plan construction + schema,
    with and without the timer-based TTL (execution additionally needs
    the protobuf 6.x runtime — see tws_runtime_available docstring)."""
    import json
    import os

    from real_time_financial_market_data_pipeline_spark.streaming.stateful import streaming_latest_prices_tws

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "a.json"), "w") as f:
        f.write(json.dumps({"s": "A", "p": 1.0, "v": 1, "t": T0}) + "\n")
    for ttl_ms in (None, 30_000):
        out = streaming_latest_prices_tws(read_trade_stream(spark, feed), ttl_ms=ttl_ms)
        assert out.isStreaming
        assert [f.name for f in out.schema.fields] == [
            "symbol",
            "last_price",
            "last_volume",
            "last_trade_time",
            "price_change",
            "price_change_pct",
        ]


def test_default_dispatch_prefers_tws_when_runtime_present(spark, tmp_path, monkeypatch):
    """streaming_latest_prices routes to transformWithStateInPandas when
    the TWS protobuf runtime is importable, and to the
    applyInPandasWithState fallback when it is not."""
    import json
    import os

    from real_time_financial_market_data_pipeline_spark.streaming import stateful

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    with open(os.path.join(feed, "a.json"), "w") as f:
        f.write(json.dumps({"s": "A", "p": 1.0, "v": 1, "t": T0}) + "\n")
    trades = read_trade_stream(spark, feed)

    def plan_of(df):
        return df._jdf.queryExecution().analyzed().toString()

    monkeypatch.setattr(stateful, "_TWS_AVAILABLE", True)
    assert "TransformWithStateInPySpark" in plan_of(stateful.streaming_latest_prices(trades))
    monkeypatch.setattr(stateful, "_TWS_AVAILABLE", False)
    assert "FlatMapGroupsInPandasWithState" in plan_of(
        stateful.streaming_latest_prices(trades)
    )
    # in THIS container the probe must resolve to the fallback (no
    # protobuf runtime); if this ever flips, the eviction test below
    # starts exercising the TWS path for free
    monkeypatch.setattr(stateful, "_TWS_AVAILABLE", None)
    assert stateful.tws_runtime_available() is False


def test_idle_symbol_state_ttl_eviction(spark, tmp_path):
    """With ttl_ms set, a symbol that stays quiet for the TTL has its
    state evicted: its next trade reports price_change=None exactly like
    a never-seen symbol (state bounded by ACTIVE symbols, not all
    symbols ever seen)."""
    import time

    from real_time_financial_market_data_pipeline_spark.streaming.stateful import streaming_latest_prices

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    with open(os.path.join(feed, "b0.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 100.0, "v": 10, "t": T0}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 50.0, "v": 5, "t": T0 + 1_000}) + "\n")

    trades = read_trade_stream(spark, feed)
    latest = streaming_latest_prices(trades, ttl_ms=1_500)
    q = (
        latest.writeStream.format("memory")
        .queryName("latest_ttl_mem")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        # 1) both symbols land
        while time.time() < deadline:
            syms = {
                r["symbol"] for r in spark.sql("SELECT symbol FROM latest_ttl_mem").collect()
            }
            if {"AAPL", "MSFT"} <= syms:
                break
            time.sleep(0.25)
        assert {"AAPL", "MSFT"} <= syms
        # 2) let the TTL pass with no traffic; empty micro-batches keep
        #    running (ProcessingTimeTimeout forces them) and fire the
        #    timeouts that evict both idle keys
        expiry_wall = time.time() + 1.5 + 2.0
        while time.time() < expiry_wall:
            time.sleep(0.25)
        # 3) MSFT trades again — with state evicted this is a fresh key
        with open(os.path.join(feed, "b1.json"), "w") as f:
            f.write(json.dumps({"s": "MSFT", "p": 80.0, "v": 7, "t": T0 + 600_000}) + "\n")
        fresh = None
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM latest_ttl_mem WHERE symbol = 'MSFT' AND last_price = 80.0"
            ).collect()
            if rows:
                fresh = rows[0]
                break
            time.sleep(0.25)
        assert fresh is not None, "post-TTL MSFT trade never surfaced"
        # evicted state ⇒ no previous price ⇒ change is None (would be
        # 30.0 if the 50.0 state had survived)
        assert fresh["price_change"] is None
        assert fresh["price_change_pct"] is None
        assert fresh["last_volume"] == 7
    finally:
        q.stop()


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


def test_ttl_bounds_state_under_symbol_churn(spark, tmp_path):
    """The scale claim behind the TTL (SCALE.md): with a churning symbol
    universe, state tracks ACTIVE symbols, not symbols-ever-seen.  Eight
    waves of 5 fresh symbols each (40 distinct keys total) stream
    through with a TTL shorter than the run; after a settle period the
    state store must have evicted well below the ever-seen count, while
    every symbol's row was still emitted (eviction loses no output)."""
    import time

    from real_time_financial_market_data_pipeline_spark.streaming.stateful import streaming_latest_prices

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    trades = read_trade_stream(spark, feed)
    latest = streaming_latest_prices(trades, ttl_ms=1_200)
    q = (
        latest.writeStream.format("memory")
        .queryName("latest_churn_mem")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        n_waves, per_wave = 8, 5
        for w in range(n_waves):
            with open(os.path.join(feed, f"wave_{w}.json"), "w") as f:
                for i in range(per_wave):
                    f.write(
                        json.dumps(
                            {"s": f"CH{w}_{i}", "p": 10.0 + w, "v": 1, "t": T0 + w * 60_000}
                        )
                        + "\n"
                    )
            time.sleep(0.4)

        deadline = time.time() + 120
        # every symbol must surface (eviction is about state, not output)
        total = n_waves * per_wave
        while time.time() < deadline:
            seen = {
                r["symbol"]
                for r in spark.sql("SELECT symbol FROM latest_churn_mem").collect()
            }
            if len(seen) == total:
                break
            time.sleep(0.3)
        assert len(seen) == total, f"only {len(seen)}/{total} symbols emitted"

        # settle: no new data, TTL elapses, empty batches fire timeouts
        state_rows = None
        while time.time() < deadline:
            p = q.lastProgress or {}
            ops = p.get("stateOperators") or []
            if ops:
                state_rows = ops[0].get("numRowsTotal")
                if state_rows is not None and state_rows <= total // 2:
                    break
            time.sleep(0.4)
        assert state_rows is not None, "no state-operator metrics reported"
        assert state_rows <= total // 2, (
            f"state holds {state_rows} rows after settle — TTL eviction is not "
            f"bounding state (symbols-ever-seen = {total})"
        )
    finally:
        q.stop()


def test_latest_prices_stream_job_end_to_end(spark, tmp_path):
    """LatestPricesStreamJob: the reference's declared-but-unpopulated
    latest_prices serving table, streamed end-to-end — cross-batch
    change tracking through the update-mode sink, upsert-on-read view,
    post-drain compaction, and a replayed restart that is a no-op."""
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
        LatestPricesStreamJob,
        latest_prices_view,
    )

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    os.makedirs(feed)
    with open(os.path.join(feed, "b0.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 100.0, "v": 10, "t": T0}) + "\n")
    with open(os.path.join(feed, "b1.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 110.0, "v": 20, "t": T0 + 60_000}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 50.0, "v": 5, "t": T0 + 61_000}) + "\n")
    os.utime(os.path.join(feed, "b0.json"), (1_700_000_000, 1_700_000_000))
    os.utime(os.path.join(feed, "b1.json"), (1_700_000_100, 1_700_000_100))

    def run_once():
        job = LatestPricesStreamJob(out_dir=out)
        mgr = job.start(read_trade_stream(spark, feed, max_files_per_trigger=1))
        assert mgr.await_all(timeout_s=120)
        return job

    job = run_once()
    view = latest_prices_view(spark, out)
    rows = {r["symbol"]: r for r in view.collect()}
    assert set(rows) == {"AAPL", "MSFT"}
    # AAPL's change spans the batch boundary (state carried across)
    assert rows["AAPL"]["last_price"] == 110.0 and rows["AAPL"]["price_change"] == 10.0
    assert rows["MSFT"]["last_price"] == 50.0 and rows["MSFT"]["price_change"] is None

    # post-drain compaction folded the emissions into one snapshot;
    # deferred retirement keeps the superseded dir visible (resolved
    # away) until the next compact's grace cleanup collapses the layout
    job.compact(spark)
    dirs = [d for d in os.listdir(job.table_dir()) if d.startswith("batch_id=")]
    assert len(dirs) == 1

    run_once()  # restart with no new data: checkpointed no-op
    rows2 = {r["symbol"]: r for r in latest_prices_view(spark, out).collect()}
    assert {s: r["last_price"] for s, r in rows2.items()} == {"AAPL": 110.0, "MSFT": 50.0}

    # empty-dir contract: a never-started job yields an empty typed frame
    assert latest_prices_view(spark, str(tmp_path / "nowhere")).count() == 0


def test_latest_prices_bucketed_publish_serves_shuffle_free(spark, tmp_path):
    """publish_bucketed (round-6 VERDICT task 6): the compacted
    latest_prices snapshot republished as a symbol-bucketed serving
    table.  The snapshot is already resolved (one row per symbol), so
    the Q8 dashboard scan is a plain table read with ZERO exchanges —
    no latest_state_on_read shuffle per read — and a symbol-keyed
    aggregate over it also plans without an exchange (bucketing
    satisfies the required distribution).  Values must match the
    resolve-on-read view exactly, including after a restart appends a
    new delta and the table is republished."""
    from real_time_financial_market_data_pipeline_spark.plans.inspect import count_shuffles, physical_plan
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
        LatestPricesStreamJob,
        latest_prices_view,
    )

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    os.makedirs(feed)
    with open(os.path.join(feed, "b0.json"), "w") as f:
        f.write(json.dumps({"s": "AAPL", "p": 100.0, "v": 10, "t": T0}) + "\n")
        f.write(json.dumps({"s": "MSFT", "p": 50.0, "v": 5, "t": T0 + 1000}) + "\n")

    def run_once():
        job = LatestPricesStreamJob(out_dir=out)
        mgr = job.start(read_trade_stream(spark, feed))
        assert mgr.await_all(timeout_s=120)
        return job

    job = run_once()
    table = job.publish_bucketed(spark, table="latest_prices_serving_t")
    try:
        served = spark.table(table)
        assert count_shuffles(served) == 0  # plain scan, already resolved
        assert {r["symbol"]: r["last_price"] for r in served.collect()} == {
            "AAPL": 100.0,
            "MSFT": 50.0,
        }
        # symbol-keyed aggregate rides the bucketing: no Exchange
        agg = served.groupBy("symbol").count()
        assert count_shuffles(agg) == 0, physical_plan(agg, "simple")

        # new data -> restart appends a delta above the snapshot; the
        # view resolves it, and a republish folds + swaps the LOCATION
        with open(os.path.join(feed, "b1.json"), "w") as f:
            f.write(json.dumps({"s": "AAPL", "p": 120.0, "v": 7, "t": T0 + 60_000}) + "\n")
        job = run_once()
        assert {
            r["symbol"]: r["last_price"]
            for r in latest_prices_view(spark, out).collect()
        } == {"AAPL": 120.0, "MSFT": 50.0}
        job.publish_bucketed(spark, table="latest_prices_serving_t")
        assert {
            r["symbol"]: r["last_price"] for r in spark.table(table).collect()
        } == {"AAPL": 120.0, "MSFT": 50.0}
        assert count_shuffles(spark.table(table)) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS latest_prices_serving_t")
