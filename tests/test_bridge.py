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


def test_bridge_hard_kill_mid_file_never_promotes_tmp(tmp_path):
    """LIVE crash drill (round-8 VERDICT task 7): a bridge PROCESS is
    SIGKILLed while a spool tmp file is written but not yet promoted
    (crash injected into the rename window of the real _flush path).
    A restart into the same spool_dir must (a) never promote the
    crashed tmp's content into the visible namespace, (b) not re-use
    any VISIBLE feed index (the acknowledged files are untouched), and
    (c) continue the sequence correctly — the file source sees only
    complete, never-overwritten files."""
    import signal
    import subprocess
    import sys
    import time

    spool = str(tmp_path / "spool")
    child_src = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[2])
from real_time_financial_market_data_pipeline_spark.sources.bridge import FeedBridge

spool = sys.argv[1]
real_rename = os.rename
state = {"renames": 0}

def crashy_rename(src, dst):
    if os.path.basename(src).startswith("_feed-"):
        state["renames"] += 1
        if state["renames"] >= 3:
            time.sleep(600)  # the crash window: tmp on disk, never promoted
    real_rename(src, dst)

os.rename = crashy_rename

def connect():
    for i in range(6):
        yield json.dumps({"i": i})
    time.sleep(600)

FeedBridge(connect, spool, rotate_lines=2).run()
"""
    import real_time_financial_market_data_pipeline_spark as pkg

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src, spool, repo_root],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 60
        stranded = None
        while time.time() < deadline:
            tmps = [f for f in os.listdir(spool) if f.endswith(".tmp")] if os.path.isdir(spool) else []
            if tmps:
                stranded = tmps[0]
                break
            time.sleep(0.05)
        assert stranded == "_feed-000002.json.tmp", stranded
        # let the blocked write settle, then capture the pre-kill state
        time.sleep(0.2)
        visible_before = sorted(
            f for f in os.listdir(spool) if not f.startswith("_")
        )
        assert visible_before == ["feed-000000.json", "feed-000001.json"]
        contents_before = {}
        for f in visible_before:
            with open(os.path.join(spool, f)) as fh:
                contents_before[f] = fh.read()
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)

    # restart into the same spool_dir with fresh lines
    def connect2():
        for i in range(100, 104):
            yield json.dumps({"i": i})

    FeedBridge(connect2, spool, rotate_lines=2).run()

    visible = sorted(f for f in os.listdir(spool) if not f.startswith("_"))
    assert visible == [f"feed-{i:06d}.json" for i in range(4)]
    # acknowledged files untouched — no visible index was re-used
    for f in visible_before:
        with open(os.path.join(spool, f)) as fh:
            assert fh.read() == contents_before[f]
    # the crashed tmp's lines (4, 5) were never promoted anywhere
    all_lines = []
    for f in visible:
        with open(os.path.join(spool, f)) as fh:
            all_lines += fh.read().splitlines()
    crashed = {json.dumps({"i": 4}), json.dumps({"i": 5})}
    assert not (set(all_lines) & crashed)
    # the restart's own lines all landed, and no tmp litter remains
    assert [json.loads(l)["i"] for l in all_lines] == [0, 1, 2, 3, 100, 101, 102, 103]
    assert not [f for f in os.listdir(spool) if f.endswith(".tmp")]
