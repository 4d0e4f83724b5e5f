"""Reconnecting feed bridge (S2 lifecycle parity): backoff schedule,
consecutive-failure reset, spool-file atomicity, and the bridged feed
draining through the exactly-once file source."""

from __future__ import annotations

import json
import os
import threading

from real_time_financial_market_data_pipeline_spark.sources.bridge import (
    FeedBridge,
    ReconnectPolicy,
    subscribe_cap,
)

T0 = 1_700_000_100_000


def test_backoff_schedule_matches_reference():
    """min(base * 2^n, cap) — reference finnhub_client.py:121-133 uses
    base 1 s, cap 300 s."""
    p = ReconnectPolicy()
    assert [p.delay(n) for n in range(10)] == [1, 2, 4, 8, 16, 32, 64, 128, 256, 300]
    assert p.delay(50) == 300  # capped forever after


def test_subscribe_cap_truncates_preserving_order():
    syms = [f"S{i}" for i in range(60)]
    assert subscribe_cap(syms) == syms[:50]
    assert subscribe_cap(["A", "B"]) == ["A", "B"]


def _wire(i: int) -> str:
    return json.dumps({"s": "AAPL", "p": 100.0 + i, "v": i + 1, "t": T0 + i * 1000})


def test_bridge_reconnects_with_backoff_and_loses_nothing(tmp_path):
    """A feed that drops the connection twice mid-stream: the bridge
    backs off per the policy, resets the attempt counter on the healthy
    reconnect, spools every line exactly once, and leaves no partial
    (temp) files behind."""
    chunks = [
        [_wire(i) for i in range(0, 5)],
        [_wire(i) for i in range(5, 8)],
        [_wire(i) for i in range(8, 12)],
    ]
    state = {"n": 0}

    def connect():
        idx = state["n"]
        state["n"] += 1
        yield from chunks[idx]
        if idx < 2:
            raise ConnectionError("server dropped us")

    spool = str(tmp_path / "spool")
    bridge = FeedBridge(
        connect,
        spool,
        policy=ReconnectPolicy(base_s=0.01, cap_s=0.04),
        rotate_lines=3,
    )
    stats = bridge.run()
    assert stats["connects"] == 3 and stats["failures"] == 2
    assert stats["lines"] == 12
    # healthy lines between failures reset the counter: both delays are
    # attempt-0 delays, not a growing 0.01, 0.02 sequence
    assert stats["delays"] == [0.01, 0.01]

    files = sorted(os.listdir(spool))
    assert files and all(f.startswith("feed-") and f.endswith(".json") for f in files)
    lines = []
    for f in files:
        with open(os.path.join(spool, f)) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert lines == [_wire(i) for i in range(12)]


def test_flapping_endpoint_walks_the_backoff_ladder(tmp_path):
    """Consecutive failures with no healthy lines in between must back
    off geometrically (and a failure bound stops retry-forever)."""
    import pytest

    def connect():
        raise ConnectionError("down")
        yield  # pragma: no cover — makes connect a generator

    bridge = FeedBridge(
        connect,
        str(tmp_path / "spool"),
        policy=ReconnectPolicy(base_s=0.01, cap_s=0.05),
        max_consecutive_failures=4,
    )
    with pytest.raises(ConnectionError):
        bridge.run()
    assert bridge.stats["failures"] == 4
    assert bridge.stats["delays"] == [0.01, 0.02, 0.04]  # 4th failure raises


def test_bridged_feed_drains_through_file_source(spark, tmp_path):
    """End-to-end: bridge spool → read_trade_stream (checkpointed file
    source) → memory sink; every pushed record arrives exactly once,
    normalized."""
    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream

    def connect():
        yield from (_wire(i) for i in range(7))

    spool = str(tmp_path / "spool")
    FeedBridge(connect, spool, rotate_lines=2).run()

    q = (
        read_trade_stream(spark, spool)
        .writeStream.format("memory")
        .queryName("bridge_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT symbol, price, volume, timestamp FROM bridge_mem").collect()
    assert len(rows) == 7
    assert sorted(r["price"] for r in rows) == [100.0 + i for i in range(7)]
    assert all(r["symbol"] == "AAPL" for r in rows)


def test_stop_event_interrupts_backoff_promptly(tmp_path):
    """Graceful shutdown mid-backoff: stop.wait(delay) returns early, the
    bridge flushes and exits without waiting out a capped delay."""
    import time

    def connect():
        yield _wire(0)
        raise ConnectionError("down")

    stop = threading.Event()
    bridge = FeedBridge(
        connect,
        str(tmp_path / "spool"),
        policy=ReconnectPolicy(base_s=60.0, cap_s=300.0),  # painful if waited out
    )
    t = bridge.run_in_thread(stop)
    time.sleep(0.3)  # let it take the first line and enter backoff
    stop.set()
    t.join(timeout=5)
    assert not t.is_alive()
    assert bridge.stats["lines"] >= 1


def test_bridge_restart_never_overwrites_existing_spool_files(tmp_path):
    """A bridge process restarted into an existing spool_dir must seed
    its sequence past the files already there: Spark's file source
    tracks processed files BY NAME, so re-using feed-000000.json would
    overwrite data the source considers done — lines lost silently."""

    def run_once(payloads):
        def connect():
            yield from payloads

        FeedBridge(connect, str(tmp_path / "spool"), rotate_lines=2).run()

    run_once([_wire(i) for i in range(4)])  # feed-000000/000001
    first = sorted(os.listdir(tmp_path / "spool"))
    assert first == ["feed-000000.json", "feed-000001.json"]

    run_once([_wire(i) for i in range(4, 8)])  # restart: must continue
    files = sorted(os.listdir(tmp_path / "spool"))
    assert files == [f"feed-{i:06d}.json" for i in range(4)]

    lines = []
    for f in files:
        with open(os.path.join(tmp_path / "spool", f)) as fh:
            lines += fh.read().splitlines()
    assert lines == [_wire(i) for i in range(8)]  # nothing overwritten
