"""Uncommitted-tail-batch guard for ALL stream-stopped compaction entry
points (round-6 VERDICT task 1).

The hazard, per layer: a crash BETWEEN the sink write and the checkpoint
commit leaves the highest on-disk `batch_id=<max>` dir replayable.  A
manual compact in that state must NOT fold history into a snapshot
published under that same dir name — the restart's replay would
overwrite it with one batch's delta, silently losing everything else.
`sinks.committed_fold_bound` (hoisted from IncrementalDedupJob) proves
commit via the checkpoint commit log and bounds the fold otherwise;
these tests drive the crash → manual compact → restart-and-replay
sequence end-to-end for the gold, best-quote, and latest-prices layers
(mirroring tests/test_incremental.py::
test_compact_with_uncommitted_tail_survives_replay).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from real_time_financial_market_data_pipeline_spark.sources.streaming import read_quote_stream, read_trade_stream
from real_time_financial_market_data_pipeline_spark.streaming.sinks import committed_fold_bound, latest_state_on_read

T0 = 1_700_000_100_000  # fixed epoch ms


def _write_jsonl(dirpath: str, name: str, recs: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")


def _batch_ids(path: str) -> set[int]:
    return {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if re.fullmatch(r"batch_id=\d+", d)
    }


def _crash_before_commit(ckpt_query_dir: str, batch_id: int) -> None:
    """Rewind the checkpoint to a crash mid-`batch_id`, between the sink
    write and the checkpoint commit: commits < batch_id, offsets ≤
    batch_id (the offsets entry for a batch is written before it runs;
    the next batch's entry only after this one commits — so a real
    crash leaves offsets exactly one ahead of commits).  A restart from
    this state replays `batch_id` itself."""
    for log, keep_max in (("commits", batch_id - 1), ("offsets", batch_id)):
        d = os.path.join(ckpt_query_dir, log)
        for f in os.listdir(d):
            name = f.lstrip(".").removesuffix(".crc")
            if name.isdigit() and int(name) > keep_max:
                os.remove(os.path.join(d, f))


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# unit: the shared bound helper
# ---------------------------------------------------------------------------


def test_committed_fold_bound_unit(tmp_path):
    path = str(tmp_path / "layer")
    ck_a = str(tmp_path / "ck" / "query_a")
    ck_b = str(tmp_path / "ck" / "query_b")

    # no sink dir at all / no batch dirs → nothing to bound
    assert committed_fold_bound(path, ck_a) is None
    os.makedirs(path)
    assert committed_fold_bound(path, ck_a) is None

    for i in (0, 1, 2):
        os.makedirs(os.path.join(path, f"batch_id={i}"))

    # no commit log exists anywhere → no proof → bound the tail
    assert committed_fold_bound(path, ck_a) == 2
    assert committed_fold_bound(path, [ck_a, ck_b]) == 2

    # commit log exists but lacks the tail commit → bound
    os.makedirs(os.path.join(ck_a, "commits"))
    for i in (0, 1):
        open(os.path.join(ck_a, "commits", str(i)), "w").close()
    assert committed_fold_bound(path, ck_a) == 2

    # tail committed in the only existing log → fold everything
    open(os.path.join(ck_a, "commits", "2"), "w").close()
    assert committed_fold_bound(path, ck_a) is None
    assert committed_fold_bound(path, [ck_a, ck_b]) is None  # b doesn't exist

    # a SECOND existing log that lacks the commit → conservative bound
    os.makedirs(os.path.join(ck_b, "commits"))
    assert committed_fold_bound(path, [ck_a, ck_b]) == 2
    open(os.path.join(ck_b, "commits", "2"), "w").close()
    assert committed_fold_bound(path, [ck_a, ck_b]) is None


# ---------------------------------------------------------------------------
# e2e: gold layers (MedallionStreamJob.compact_gold)
# ---------------------------------------------------------------------------


def _run_medallion(spark, feed, out):
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob

    job = MedallionStreamJob(out_dir=out, compact_every=None)  # no auto-fold
    mgr = job.start(read_trade_stream(spark, feed))
    assert mgr.await_all(timeout_s=180)
    return job


def test_compact_gold_with_uncommitted_tail_survives_replay(spark, tmp_path):
    feed, out = str(tmp_path / "feed"), str(tmp_path / "out")
    _write_jsonl(feed, "b0.json", [
        {"s": "AAPL", "p": 150.0, "v": 100, "t": T0},
        {"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 1000},
    ])
    job = _run_medallion(spark, feed, out)
    # second drain with new data → a second gold micro-batch dir
    _write_jsonl(feed, "b1.json", [
        {"s": "AAPL", "p": 151.0, "v": 50, "t": T0 + 2000},
        {"s": "NVDA", "p": 900.0, "v": 5, "t": T0 + 3000},
    ])
    job = _run_medallion(spark, feed, out)

    gold_dir = os.path.join(out, "gold_5m")
    keys = list(job.GOLD_KEYS)
    expected = _sorted_rows(
        latest_state_on_read(spark.read.parquet(gold_dir), keys)
    )
    tail = max(_batch_ids(gold_dir))
    assert len(_batch_ids(gold_dir)) >= 2, "need a foldable prefix + tail"

    _crash_before_commit(
        os.path.join(out, "_checkpoints", "chained_gold_5m"), tail
    )
    # manual compact with the stream stopped-by-crash: must bound the fold
    job.compact_gold(spark)
    assert tail in _batch_ids(gold_dir), "uncommitted tail was folded away"

    # restart → the tail batch replays; history must be intact afterwards
    job = _run_medallion(spark, feed, out)
    assert _sorted_rows(
        latest_state_on_read(spark.read.parquet(gold_dir), keys)
    ) == expected

    # commit log complete again: a follow-up compact folds fully
    # (deferred retirement: the superseded dirs stay VISIBLE — and
    # resolve away — until the NEXT compact's grace cleanup)
    assert job.compact_gold(spark) > 0
    job.compact_gold(spark)  # grace cleanup collapses the layout
    assert len(_batch_ids(gold_dir)) == 1
    assert _sorted_rows(
        latest_state_on_read(spark.read.parquet(gold_dir), keys)
    ) == expected


# ---------------------------------------------------------------------------
# e2e: best-quote partials (QuoteEnrichJob.compact_best_quote)
# ---------------------------------------------------------------------------


def test_compact_best_quote_with_uncommitted_tail_survives_replay(spark, tmp_path):
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    out = str(tmp_path / "out")

    def drain():
        job = QuoteEnrichJob(out_dir=out, compact_every=None)
        mgr = job.start(
            read_trade_stream(spark, tfeed), read_quote_stream(spark, qfeed)
        )
        assert mgr.await_all(timeout_s=180)
        return job

    _write_jsonl(tfeed, "t0.json", [{"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 60_000}])
    _write_jsonl(qfeed, "q0.json", [{
        "symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
        "ask_price": 151.0, "ask_size": 5, "timestamp": T0,
    }])
    job = drain()
    _write_jsonl(tfeed, "t1.json", [{"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 60_000}])
    _write_jsonl(qfeed, "q1.json", [{
        "symbol": "MSFT", "bid_price": 379.0, "bid_size": 1,
        "ask_price": 381.0, "ask_size": 1, "timestamp": T0 + 30_000,
    }])
    job = drain()

    best_dir = os.path.join(out, "best_quote")
    expected = _sorted_rows(best_quote_view(spark, out))
    tail = max(_batch_ids(best_dir))
    assert len(_batch_ids(best_dir)) >= 2

    _crash_before_commit(os.path.join(out, "_checkpoints", "quotes_enriched"), tail)
    job.compact_best_quote(spark)
    assert tail in _batch_ids(best_dir), "uncommitted tail was folded away"

    job = drain()  # replay the tail batch
    assert _sorted_rows(best_quote_view(spark, out)) == expected

    assert job.compact_best_quote(spark) > 0
    job.compact_best_quote(spark)  # grace cleanup collapses the layout
    assert len(_batch_ids(best_dir)) == 1
    assert _sorted_rows(best_quote_view(spark, out)) == expected


# ---------------------------------------------------------------------------
# e2e: latest-prices serving layer (LatestPricesStreamJob.compact)
# ---------------------------------------------------------------------------


def test_latest_prices_compact_with_uncommitted_tail_survives_replay(spark, tmp_path):
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
        LatestPricesStreamJob,
        latest_prices_view,
    )

    feed, out = str(tmp_path / "feed"), str(tmp_path / "out")

    def drain():
        job = LatestPricesStreamJob(out_dir=out, compact_every=None)
        mgr = job.start(read_trade_stream(spark, feed))
        assert mgr.await_all(timeout_s=180)
        return job

    _write_jsonl(feed, "b0.json", [
        {"s": "AAPL", "p": 150.0, "v": 100, "t": T0},
        {"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 1000},
    ])
    job = drain()
    _write_jsonl(feed, "b1.json", [
        {"s": "AAPL", "p": 152.0, "v": 30, "t": T0 + 5000},
    ])
    job = drain()

    table_dir = job.table_dir()
    expected = _sorted_rows(latest_prices_view(spark, out))
    tail = max(_batch_ids(table_dir))
    assert len(_batch_ids(table_dir)) >= 2

    _crash_before_commit(os.path.join(out, "_checkpoints", "latest_prices"), tail)
    job.compact(spark)
    assert tail in _batch_ids(table_dir), "uncommitted tail was folded away"

    job = drain()  # replay
    assert _sorted_rows(latest_prices_view(spark, out)) == expected

    assert job.compact(spark) > 0
    job.compact(spark)  # grace cleanup collapses the layout
    assert len(_batch_ids(table_dir)) == 1
    assert _sorted_rows(latest_prices_view(spark, out)) == expected


# ---------------------------------------------------------------------------
# compact_gold_bucketed: guarded publish + empty-layer diagnostics
# ---------------------------------------------------------------------------


def test_compact_gold_bucketed_guards_uncommitted_tail(spark, tmp_path):
    """The bucketed publish must fold/serve only the COMMITTED frontier:
    the uncommitted tail keeps its delta dir and its rows stay out of
    the serving table until the replay commits them."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import compact_gold_bucketed

    path = str(tmp_path / "gold")
    ck = str(tmp_path / "ck" / "q")
    os.makedirs(os.path.join(ck, "commits"))
    for i, sym in enumerate(["AAPL", "MSFT", "NVDA"]):
        spark.createDataFrame(
            [(sym, float(i))], "symbol string, price double"
        ).write.parquet(os.path.join(path, f"batch_id={i}"))
    for i in (0, 1):  # batch 2 wrote its dir but never committed
        open(os.path.join(ck, "commits", str(i)), "w").close()

    folded = compact_gold_bucketed(
        spark, path, ["symbol"], "guarded_gold_serving", n_buckets=2,
        commit_log_dirs=ck,
    )
    assert folded == 2  # batches 0 and 1 only
    assert 2 in _batch_ids(path), "uncommitted tail was folded away"
    served = {r["symbol"] for r in spark.table("guarded_gold_serving").collect()}
    assert served == {"AAPL", "MSFT"}  # committed frontier only

    # replay commits batch 2 → next publish folds it in
    open(os.path.join(ck, "commits", "2"), "w").close()
    compact_gold_bucketed(
        spark, path, ["symbol"], "guarded_gold_serving", n_buckets=2,
        commit_log_dirs=ck,
    )
    assert _batch_ids(path) == {2}
    served = {r["symbol"] for r in spark.table("guarded_gold_serving").collect()}
    assert served == {"AAPL", "MSFT", "NVDA"}
    spark.sql("DROP TABLE IF EXISTS guarded_gold_serving")


def test_compact_gold_bucketed_empty_layer_clear_error(spark, tmp_path):
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import compact_gold_bucketed

    path = str(tmp_path / "never_written")
    os.makedirs(path)
    with pytest.raises(FileNotFoundError, match="no committed batch directory"):
        compact_gold_bucketed(spark, path, ["symbol"], "never_serving")


def test_staged_recovery_respects_uncommitted_tail(spark, tmp_path):
    """Crash DURING a guarded fold's publish phase (staged dir exists,
    old dirs not yet deleted) while the tail batch is still
    replayable: the re-run must finish publishing the staged snapshot
    over the in-scope dirs only, leaving the tail delta untouched —
    and a later unguarded fold (tail committed) folds everything."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        committed_fold_bound,
        compact_latest_state,
        latest_state_on_read,
    )

    path = str(tmp_path / "layer")
    ck = str(tmp_path / "ck" / "q")
    os.makedirs(os.path.join(ck, "commits"))
    for i, price in enumerate([10.0, 11.0, 12.0]):
        spark.createDataFrame(
            [("AAPL", price)], "symbol string, price double"
        ).write.parquet(os.path.join(path, f"batch_id={i}"))
    for i in (0, 1):  # batch 2 uncommitted (replayable)
        open(os.path.join(ck, "commits", str(i)), "w").close()

    # hand-build the crash state: staged snapshot of the in-scope fold
    # (batches 0-1 -> per-key latest = 11.0) exists, old dirs remain
    bound = committed_fold_bound(path, ck)
    assert bound == 2
    staged = os.path.join(path, "_compact_staged_1")
    spark.createDataFrame(
        [("AAPL", 11.0, 1)], "symbol string, price double, batch_id int"
    ).write.parquet(staged)

    folded = compact_latest_state(spark, path, ["symbol"], only_below=bound)
    assert folded == 2  # finished the staged publish over batches 0-1
    assert _batch_ids(path) == {1, 2}  # snapshot + untouched tail
    resolved = latest_state_on_read(spark.read.parquet(path), ["symbol"]).collect()
    assert resolved[0]["price"] == 12.0  # tail still wins resolve-on-read

    # tail commits (replay finished) -> full fold collapses to one dir
    open(os.path.join(ck, "commits", "2"), "w").close()
    assert committed_fold_bound(path, ck) is None
    compact_latest_state(spark, path, ["symbol"])
    assert _batch_ids(path) == {2}
    assert spark.read.parquet(path).collect()[0]["price"] == 12.0


# ---------------------------------------------------------------------------
# start-time recovery of a compaction publish a crash interrupted
# (round-10 review: the recovery added for IncrementalDedupJob must also
# cover the quote and latest-prices layers — including MANUAL compacts
# on jobs running with compact_every=None)
# ---------------------------------------------------------------------------


def _crash_mid_publish(monkeypatch, compact_call):
    """Drive the real compaction into the publish-rename hazard window.
    Round-12 snapshot-visible-first shape: the pending marker is down,
    the ORIGINAL max dir is retired aside, the staged snapshot has not
    yet been renamed visible — older batch dirs are still readable (a
    concurrent reader sees the consistent as-of-previous-batch state,
    no longer an empty dir set)."""
    real_rename = os.rename

    def crashing_rename(src, dst):
        if "_compact_staged_" in str(src) and "batch_id=" in str(dst):
            raise RuntimeError("simulated crash during publish rename")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_call()
    monkeypatch.undo()


def test_quote_enrich_start_recovers_crashed_compaction(spark, tmp_path, monkeypatch):
    """A compact_best_quote crash mid-publish leaves the only complete
    copy of the folded partials underscore-staged.  The next start()
    must finish that publish — with compact_every=None there is no
    cadence point to ever do it, and before round 10 a restart that
    appended new batches above the stage would have it discarded as
    stale AFTER its folded source dirs were deleted."""
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    out = str(tmp_path / "out")

    def drain():
        job = QuoteEnrichJob(out_dir=out, compact_every=None)
        mgr = job.start(
            read_trade_stream(spark, tfeed), read_quote_stream(spark, qfeed)
        )
        assert mgr.await_all(timeout_s=180)
        return job

    _write_jsonl(tfeed, "t0.json", [{"s": "AAPL", "p": 150.0, "v": 100, "t": T0 + 60_000}])
    _write_jsonl(qfeed, "q0.json", [{
        "symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
        "ask_price": 151.0, "ask_size": 5, "timestamp": T0,
    }])
    drain()
    _write_jsonl(tfeed, "t1.json", [{"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 60_000}])
    _write_jsonl(qfeed, "q1.json", [{
        "symbol": "MSFT", "bid_price": 379.0, "bid_size": 1,
        "ask_price": 381.0, "ask_size": 1, "timestamp": T0 + 30_000,
    }])
    job = drain()  # >= 2 partial dirs: the fold actually stages
    best_dir = os.path.join(out, "best_quote")
    assert len(_batch_ids(best_dir)) >= 2
    expected = _sorted_rows(best_quote_view(spark, out))

    _crash_mid_publish(monkeypatch, lambda: job.compact_best_quote(spark))
    dirs = os.listdir(best_dir)
    assert any(d.startswith("_compact_staged_") for d in dirs), dirs
    # round-12 crash shape: publish pending, original max dir retired
    # aside, OLDER batches still visible (consistent prior state)
    assert "_compact_publish_pending.json" in dirs, dirs
    assert max(_batch_ids(best_dir), default=-1) < 2, dirs

    job = drain()  # restart: recovery must run BEFORE the stream
    assert not any(
        d.startswith("_compact_staged_") for d in os.listdir(best_dir)
    )
    assert _sorted_rows(best_quote_view(spark, out)) == expected


def test_latest_prices_start_recovers_crashed_manual_compact(spark, tmp_path, monkeypatch):
    """Same hazard through parquet_sink: a MANUAL job.compact() crash
    mid-publish on a compact_every=None job must be finished by the
    next start() (the recovery is gated on compact_keys being known,
    not on inline compaction being enabled)."""
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
        LatestPricesStreamJob,
        latest_prices_view,
    )

    feed, out = str(tmp_path / "feed"), str(tmp_path / "out")

    def drain():
        job = LatestPricesStreamJob(out_dir=out, compact_every=None)
        mgr = job.start(read_trade_stream(spark, feed))
        assert mgr.await_all(timeout_s=180)
        return job

    _write_jsonl(feed, "b0.json", [
        {"s": "AAPL", "p": 150.0, "v": 100, "t": T0},
    ])
    drain()
    _write_jsonl(feed, "b1.json", [
        {"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 1000},
    ])
    job = drain()
    table_dir = job.table_dir()
    assert len(_batch_ids(table_dir)) >= 2  # the fold actually stages
    expected = _sorted_rows(latest_prices_view(spark, out))

    _crash_mid_publish(monkeypatch, lambda: job.compact(spark))
    assert any(
        d.startswith("_compact_staged_") for d in os.listdir(table_dir)
    )
    # round-12 crash shape: pending marker down, original max dir
    # retired aside, older batches still visible
    assert "_compact_publish_pending.json" in os.listdir(table_dir)

    # restart with NEW data for a different symbol: pre-round-10 the
    # new batch would land above the stage and the stale-check would
    # discard the folded history; now recovery runs first
    _write_jsonl(feed, "b2.json", [
        {"s": "NVDA", "p": 900.0, "v": 5, "t": T0 + 9000},
    ])
    job = drain()
    assert not any(
        d.startswith("_compact_staged_") for d in os.listdir(table_dir)
    )
    rows = {r[0]: r for r in _sorted_rows(latest_prices_view(spark, out))}
    assert set(rows) == {"AAPL", "MSFT", "NVDA"}
    for sym, row in {r[0]: r for r in expected}.items():
        assert rows[sym] == row


def test_compact_under_concurrent_reader_consistent_states(spark, tmp_path):
    """Round-12 snapshot-visible-first publish: a dashboard reader
    polling latest_state_on_read THROUGH repeated compactions always
    resolves to a consistent per-key-latest state (the value of some
    batch prefix), never an error and never an empty/partial mix — the
    old delete-then-rename order had a window where the only complete
    history sat in an invisible staged dir."""
    import threading

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _manifest_add,
        compact_latest_state,
        latest_state_on_read,
        read_update_sink,
    )

    path = str(tmp_path / "layer")

    def write_batch(i: int) -> None:
        spark.createDataFrame(
            [("AAPL", float(100 + i))], "symbol string, price double"
        ).write.mode("overwrite").parquet(os.path.join(path, f"batch_id={i}"))
        # mirror parquet_sink.write_batch's manifest contract
        _manifest_add(path, f"batch_id={i}")

    for i in range(6):
        write_batch(i)

    stop = threading.Event()
    errors: list[str] = []
    seen: set[float] = set()

    def reader() -> None:
        while not stop.is_set():
            # round-13: manifest-routed construction (read_update_sink)
            # is TOTAL — no retry loop.  The manifest is replaced
            # atomically, dirs leave it BEFORE retirement, and dropped
            # dirs stay on disk a full compaction cadence (defer_retire
            # grace), so every dir a current manifest names exists for
            # the whole construction AND resolution must always be a
            # consistent per-key-latest state.
            try:
                rows = latest_state_on_read(
                    read_update_sink(spark, path), ["symbol"]
                ).collect()
                assert len(rows) == 1
                seen.add(rows[0]["price"])
            except Exception as exc:  # noqa: BLE001 — the assertion target
                errors.append(f"{type(exc).__name__}: {exc}"[:300])
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        # dashboard posture: superseded dirs stay visible (resolved
        # away by per-key latest) until the NEXT compact's grace
        # cleanup — a reader's listing at any instant stays readable
        compact_latest_state(spark, path, ["symbol"], defer_retire=True)
        for round_start in (6, 10):
            for i in range(round_start, round_start + 4):
                write_batch(i)
            compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    finally:
        stop.set()
        t.join(timeout=120)
    assert not errors, errors
    assert seen, "reader never completed a read"
    valid = {float(100 + i) for i in range(14)}
    assert seen <= valid, (sorted(seen), "non-prefix state observed")
    assert os.path.exists(os.path.join(path, "batch_id=13"))


def test_crashed_retire_resumes_without_refold_double_count(spark, tmp_path, monkeypatch):
    """A crash DURING the retire loop (snapshot already visible, some
    superseded dirs still on disk, pending marker down) must RESUME the
    same publish — not refold.  With an exact-reduce resolve (sum of
    partials, the index_spanfps shape) a refold over snapshot + leftover
    partials would silently double-count; the pending marker prevents
    it."""
    from pyspark.sql import functions as F

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        compact_latest_state,
    )

    path = str(tmp_path / "partials")
    for i in range(3):  # three partial dirs: key "a" contributes 1 each
        spark.createDataFrame([("a", 1)], "k string, n int").write.parquet(
            os.path.join(path, f"batch_id={i}")
        )

    def sum_resolve(combined):
        return combined.groupBy("k").agg(F.sum("n").cast("int").alias("n"))

    real_rename = os.rename
    fails = {"n": 0}

    def crashing_rename(src, dst):
        if "_compact_retired" in str(dst) and "_compact_retired" not in str(src):
            fails["n"] += 1
            if fails["n"] >= 2:  # let the orig-max retire through; die mid-loop
                raise RuntimeError("simulated crash during retire")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="simulated crash during retire"):
        compact_latest_state(spark, path, ["k"], resolve=sum_resolve)
    monkeypatch.undo()

    dirs = os.listdir(path)
    assert "_compact_publish_pending.json" in dirs, dirs
    assert "batch_id=2" in dirs  # the snapshot went visible before the crash

    # resume: must finish the retire, NOT refold snapshot + leftovers
    compact_latest_state(spark, path, ["k"], resolve=sum_resolve)
    assert sorted(d for d in os.listdir(path) if d.startswith("batch_id=")) == [
        "batch_id=2"
    ]
    rows = spark.read.parquet(path).collect()
    assert [(r["k"], r["n"]) for r in rows] == [("a", 3)], rows  # not 4/5


def test_deferred_publish_crash_resume_keeps_reader_grace(spark, tmp_path, monkeypatch):
    """Round-13 ADVICE pin: a crash inside a DEFERRED publish between
    writing _compact_retire_pending.json and clearing the publish-
    pending marker must not let the next compaction sweep the
    just-deferred dirs with zero grace.  The resume (checked BEFORE the
    grace cleanup) re-defers them with the flavor RECORDED in the
    pending marker, so the superseded dirs a pre-crash reader listed
    stay on disk through the whole resuming compaction."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _read_publish_pending,
        compact_latest_state,
        latest_state_on_read,
    )

    path = str(tmp_path / "layer")
    for i in range(3):
        spark.createDataFrame(
            [("AAPL", float(100 + i))], "symbol string, price double"
        ).write.parquet(os.path.join(path, f"batch_id={i}"))

    real_remove = os.remove

    def crashing_remove(p):
        if str(p).endswith("_compact_publish_pending.json"):
            raise RuntimeError("simulated crash before marker clear")
        return real_remove(p)

    monkeypatch.setattr(os, "remove", crashing_remove)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    monkeypatch.undo()

    dirs = os.listdir(path)
    assert "_compact_publish_pending.json" in dirs, dirs
    assert "_compact_retire_pending.json" in dirs, dirs
    assert _batch_ids(path) == {0, 1, 2}, dirs  # deferred dirs visible
    # the marker recorded the publish's flavor
    assert _read_publish_pending(path) == (2, True)

    # next cadence call (the layer's normal deferred compact): the
    # pre-fix order ran the grace cleanup FIRST and deleted batches
    # 0-1 before resuming — zero grace.  Now the resume re-defers
    # them and the cleanup is skipped for this call.
    compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    dirs = os.listdir(path)
    assert "_compact_publish_pending.json" not in dirs, dirs
    assert "_compact_retire_pending.json" in dirs, dirs
    assert _batch_ids(path) == {0, 1, 2}, dirs  # grace preserved
    resolved = latest_state_on_read(
        spark.read.parquet(path), ["symbol"]
    ).collect()
    assert [(r["symbol"], r["price"]) for r in resolved] == [("AAPL", 102.0)]

    # the call AFTER that is the grace boundary: cleanup sweeps
    compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    assert _batch_ids(path) == {2}
    resolved = latest_state_on_read(
        spark.read.parquet(path), ["symbol"]
    ).collect()
    assert [(r["symbol"], r["price"]) for r in resolved] == [("AAPL", 102.0)]


def test_publish_pending_marker_records_and_defaults_flavor(tmp_path):
    """Unit pin: the pending marker round-trips the defer flavor, and a
    pre-round-13 marker (no flavor key) defaults to immediate
    retirement — the conservative reading for old crash debris."""
    import json

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _PUBLISH_PENDING,
        _read_publish_pending,
        _write_publish_pending,
    )

    path = str(tmp_path)
    _write_publish_pending(path, 7, True)
    assert _read_publish_pending(path) == (7, True)
    _write_publish_pending(path, 9, False)
    assert _read_publish_pending(path) == (9, False)
    with open(os.path.join(path, _PUBLISH_PENDING), "w") as fh:
        json.dump({"max_id": 4}, fh)  # old-format marker
    assert _read_publish_pending(path) == (4, False)


def test_reader_manifest_protocol(spark, tmp_path):
    """Round-13 task 1: the batch-dir reader manifest.  One manifest
    read names the exact live dir set — pins the full lifecycle:
    writer appends, publish rewrites (snapshot + dirs above the fold
    bound, superseded dirs OUT while their files stay on disk for the
    defer_retire grace), grace sweep deletes nothing a current
    manifest names, and a manifest-less layer falls back to the plain
    listing read."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _manifest_add,
        _read_reader_manifest,
        compact_latest_state,
        latest_state_on_read,
        read_update_sink,
    )

    path = str(tmp_path / "layer")

    def write_batch(i: int, price: float) -> None:
        spark.createDataFrame(
            [("AAPL", price)], "symbol string, price double"
        ).write.mode("overwrite").parquet(os.path.join(path, f"batch_id={i}"))
        _manifest_add(path, f"batch_id={i}")

    for i in range(4):
        write_batch(i, 100.0 + i)
    assert _read_reader_manifest(path) == [f"batch_id={i}" for i in range(4)]

    # deferred publish bounded below 3 (the uncommitted-tail shape):
    # manifest = snapshot (batch_id=2) + the excluded tail (batch_id=3);
    # superseded dirs 0-1 leave the manifest but STAY on disk (grace)
    compact_latest_state(spark, path, ["symbol"], only_below=3, defer_retire=True)
    assert _read_reader_manifest(path) == ["batch_id=2", "batch_id=3"]
    assert _batch_ids(path) == {0, 1, 2, 3}
    rows = latest_state_on_read(read_update_sink(spark, path), ["symbol"]).collect()
    assert [(r["symbol"], r["price"]) for r in rows] == [("AAPL", 103.0)]

    # next cadence point: grace sweep deletes 0-1 (they left the
    # manifest a full cadence ago) and the fold publishes batch_id=3
    write_batch(4, 104.0)
    compact_latest_state(spark, path, ["symbol"], only_below=5, defer_retire=True)
    assert _read_reader_manifest(path) == ["batch_id=4"]
    assert 0 not in _batch_ids(path) and 1 not in _batch_ids(path)
    rows = latest_state_on_read(read_update_sink(spark, path), ["symbol"]).collect()
    assert [(r["symbol"], r["price"]) for r in rows] == [("AAPL", 104.0)]

    # manifest-less layer: read_update_sink == plain listing read
    bare = str(tmp_path / "bare")
    for i in range(2):
        spark.createDataFrame(
            [("MSFT", 300.0 + i)], "symbol string, price double"
        ).write.parquet(os.path.join(bare, f"batch_id={i}"))
    assert _read_reader_manifest(bare) is None
    rows = latest_state_on_read(read_update_sink(spark, bare), ["symbol"]).collect()
    assert [(r["symbol"], r["price"]) for r in rows] == [("MSFT", 301.0)]

    # bootstrap: the first _manifest_add on an upgraded layer captures
    # the pre-existing dirs from the listing
    spark.createDataFrame(
        [("MSFT", 302.0)], "symbol string, price double"
    ).write.parquet(os.path.join(bare, "batch_id=2"))
    _manifest_add(bare, "batch_id=2")
    assert _read_reader_manifest(bare) == [f"batch_id={i}" for i in range(3)]


def test_manifest_views_match_listing_reads_after_drain(spark, tmp_path):
    """E2E: after a MedallionStreamJob drain (parquet_sink writes the
    manifest per batch; inline compaction rewrites it), the
    manifest-routed gold_view equals the raw listing read — the
    manifest names exactly the live history."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _read_reader_manifest,
        latest_state_on_read,
    )
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob, gold_view

    feed = tmp_path / "feed"
    feed.mkdir()
    _write_jsonl(feed, "b0.json", [
        {"s": "AAPL", "p": 190.0, "v": 100, "t": T0},
        {"s": "AAPL", "p": 191.0, "v": 50, "t": T0 + 60_000},
        {"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 1000},
    ])
    out = str(tmp_path / "out")
    job = MedallionStreamJob(out_dir=out, gold_window_slow=None, dead_letters=False)
    mgr = job.start(read_trade_stream(spark, str(feed)))
    assert mgr.await_all(timeout_s=300)
    job.compact_gold(spark)

    gold_dir = os.path.join(out, "gold_5m")
    manifest = _read_reader_manifest(gold_dir)
    assert manifest, "drain + compact left no reader manifest"
    # every manifest dir exists; every live dir is named
    live = {d for d in os.listdir(gold_dir) if d.startswith("batch_id=")}
    assert set(manifest) <= live
    via_manifest = _sorted_rows(gold_view(spark, out))
    via_listing = _sorted_rows(
        latest_state_on_read(
            spark.read.option("ignoreMissingFiles", "true").parquet(gold_dir),
            list(MedallionStreamJob.GOLD_KEYS),
        )
    )
    assert via_manifest == via_listing
    assert via_manifest, "gold layer empty after drain"


def test_inline_compaction_defers_retirement_for_polled_readers(spark, tmp_path):
    """Round-14 ADVICE (medium): parquet_sink's INLINE compaction must
    defer retirement.  A polling reader (read_update_sink) that loaded
    the manifest just before a mid-drain publish would otherwise pass
    just-deleted dir paths to spark.read.parquet — root-path
    PATH_NOT_FOUND, which ignoreMissingFiles does not cover.  With
    defer_retire, superseded dirs leave the manifest at publish but
    stay on disk a full compaction cadence, so every dir any current
    manifest names exists for the whole construction."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _read_reader_manifest,
        _read_retire_pending,
        compact_latest_state,
        parquet_sink,
        read_update_sink,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(6):
        _write_jsonl(feed, f"b{i}.json", [
            {"s": "AAPL", "p": 100.0 + i, "v": 10, "t": T0 + i * 1000},
        ])
        # distinct mtimes so the file source drains oldest-first
        p = os.path.join(feed, f"b{i}.json")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    path = str(tmp_path / "layer")
    q = parquet_sink(
        read_trade_stream(spark, str(feed), max_files_per_trigger=1),
        path,
        str(tmp_path / "ckpt"),
        "deferred_inline",
        output_mode="append",
        compact_every=2,
        compact_keys=["symbol"],
    )
    assert q.awaitTermination(300)

    # the last inline fold (batch 4) deferred the dirs it superseded:
    # they are recorded in retire-pending, STILL ON DISK, and OUT of
    # the reader manifest — the grace contract polled readers rely on
    deferred = _read_retire_pending(path)
    assert deferred, "inline compaction retired immediately (no deferral)"
    for d in deferred:
        assert os.path.isdir(os.path.join(path, d)), f"deferred dir {d} deleted"
    manifest = _read_reader_manifest(path)
    assert manifest and not set(deferred) & set(manifest)
    rows = latest_state_on_read(read_update_sink(spark, path), ["symbol"]).collect()
    assert [(r["symbol"], r["price"]) for r in rows] == [("AAPL", 105.0)]

    # next cadence point (stream-stopped form): the grace sweep finally
    # deletes them — deferral is a bounded window, not a leak
    compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    for d in deferred:
        assert not os.path.isdir(os.path.join(path, d))


def test_publish_never_creates_manifest_for_non_protocol_layers(spark, tmp_path):
    """Round-14 ADVICE (low): _finish_publish only REWRITES an existing
    reader manifest, never creates one.  A layer whose writer does not
    call _manifest_add (IncrementalDedupJob's index tables) must stay
    manifest-less — a publish-created manifest would silently under-name
    every dir the next drain lands, and read_update_sink would return
    stale data with no error."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _READER_MANIFEST,
        compact_latest_state,
        read_update_sink,
    )

    path = str(tmp_path / "index_like")
    for i in range(3):
        spark.createDataFrame(
            [("k", i, 100 + i)], "id string, seq int, val int"
        ).write.parquet(os.path.join(path, f"batch_id={i}"))

    compact_latest_state(spark, path, ["id"])
    assert not os.path.isfile(os.path.join(path, _READER_MANIFEST))

    # non-protocol writer lands another batch; the listing-fallback read
    # sees it immediately (a stale manifest would have hidden it)
    spark.createDataFrame(
        [("k", 3, 103)], "id string, seq int, val int"
    ).write.parquet(os.path.join(path, "batch_id=3"))
    rows = latest_state_on_read(read_update_sink(spark, path), ["id"]).collect()
    assert rows[0]["val"] == 103


def test_quote_job_inline_fold_survives_reader_hammer(spark, tmp_path):
    """Round-15 VERDICT task 5: the quote job's INLINE fold carries the
    same defer_retire flag as parquet_sink's (round-14, b4f709d) but was
    covered only by suite re-runs — this is its dedicated hammer.  A
    reader polls best_quote_view (manifest-routed, NO retry loop)
    through a QuoteEnrichJob drain whose inline compaction fires
    mid-drain; every poll must resolve to a consistent best-quote state
    of some batch prefix, never an error.  Zero retries on the quote
    layer is the done-bar."""
    import threading

    from real_time_financial_market_data_pipeline_spark.streaming.jobs import QuoteEnrichJob, best_quote_view
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import _read_retire_pending

    tfeed, qfeed = str(tmp_path / "tfeed"), str(tmp_path / "qfeed")
    out = str(tmp_path / "out")
    # one quote, consumed in batch 0 and held in join state
    _write_jsonl(qfeed, "q.json", [
        {"symbol": "AAPL", "bid_price": 149.0, "bid_size": 5,
         "ask_price": 151.0, "ask_size": 5, "timestamp": T0},
    ])
    # eight trades, one file each -> one per micro-batch
    # (max_files_per_trigger=1), each matching the held quote; inline
    # folds fire at batches 2, 4, 6 (compact_every=2)
    n_trades = 8
    for i in range(n_trades):
        _write_jsonl(tfeed, f"t{i}.json", [
            {"s": "AAPL", "p": 150.0 + i, "v": 100, "t": T0 + (i + 1) * 60_000},
        ])
        p = os.path.join(tfeed, f"t{i}.json")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stop = threading.Event()
    errors: list[str] = []
    seen_counts: set[int] = set()

    def reader() -> None:
        while not stop.is_set():
            try:
                rows = best_quote_view(spark, out).collect()
                # each trade is its own key: any batch-prefix state has
                # between 0 and n_trades rows, all from the one quote
                assert len(rows) <= n_trades
                assert all(r["bid_price"] == 149.0 for r in rows)
                seen_counts.add(len(rows))
            except Exception as exc:  # noqa: BLE001 — the assertion target
                errors.append(f"{type(exc).__name__}: {exc}"[:300])
                return

    job = QuoteEnrichJob(
        out_dir=out, compact_every=2, max_quote_age="30 minutes"
    )
    mgr = job.start(
        read_trade_stream(spark, tfeed, max_files_per_trigger=1),
        read_quote_stream(spark, qfeed, max_files_per_trigger=1),
        await_timeout_s=0,
    )
    q = mgr.queries["quotes_enriched"]
    best_dir = os.path.join(out, "best_quote")
    t = None
    try:
        # the reader starts once the writer has opted the layer into the
        # manifest protocol (batch 0's _manifest_add) — the hammer
        # targets fold-vs-read, not the pre-protocol bootstrap window
        import time as _time

        t_start = _time.time()
        manifest_file = os.path.join(best_dir, "_reader_manifest.json")
        while not os.path.isfile(manifest_file) and _time.time() - t_start < 120:
            _time.sleep(0.1)
        assert os.path.isfile(manifest_file), "manifest never appeared"
        t = threading.Thread(target=reader, daemon=True)
        t.start()
        assert q.awaitTermination(300)
        job.compact_best_quote(spark)
    finally:
        stop.set()
        if t is not None:
            t.join(timeout=120)
    assert not errors, errors
    assert seen_counts, "reader never completed a read"
    # the deferral actually engaged: the final fold recorded superseded
    # dirs in retire-pending (still on disk, out of the manifest)
    deferred = _read_retire_pending(best_dir)
    assert deferred, "no deferred retirement recorded — hammer exercised nothing"
    for d in deferred:
        assert os.path.isdir(os.path.join(best_dir, d))
    rows = best_quote_view(spark, out).collect()
    assert len(rows) == n_trades


def test_manifest_bootstrap_excludes_retire_pending_dirs(spark, tmp_path):
    """Round-14 ADVICE (low), fixed round 15: on an upgraded layer
    compacted with defer_retire BEFORE its first _manifest_add (so
    _finish_publish had no manifest to rewrite), the superseded dirs
    are still visible on disk but recorded in retire-pending.  The
    bootstrap listing must EXCLUDE them: naming them would break the
    protocol promise that dirs leave the manifest a full cadence
    before the grace sweep deletes them — the next compaction's sweep
    would delete dirs a current manifest still names, reopening the
    mid-construction PATH_NOT_FOUND race for polling readers."""
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _manifest_add,
        _read_reader_manifest,
        _read_retire_pending,
        compact_latest_state,
        latest_state_on_read,
        read_update_sink,
    )

    path = str(tmp_path / "upgraded")

    def write_batch(i: int) -> None:
        spark.createDataFrame(
            [("AAPL", float(100 + i))], "symbol string, price double"
        ).write.mode("overwrite").parquet(os.path.join(path, f"batch_id={i}"))

    # pre-protocol writer: batch dirs, NO manifest
    for i in range(4):
        write_batch(i)
    assert _read_reader_manifest(path) is None

    # deferred compaction on the manifest-less layer: snapshot at
    # batch_id=3, dirs 0-2 stay on disk in retire-pending, and
    # _finish_publish creates no manifest (non-protocol layer rule)
    compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    deferred = _read_retire_pending(path)
    assert sorted(deferred) == [f"batch_id={i}" for i in range(3)]
    assert _read_reader_manifest(path) is None

    # the writer upgrades: its first post-upgrade batch bootstraps the
    # manifest from the listing — which must exclude the deferred dirs
    write_batch(4)
    _manifest_add(path, "batch_id=4")
    assert _read_reader_manifest(path) == ["batch_id=3", "batch_id=4"]

    # the next compaction's grace sweep deletes the deferred dirs; the
    # manifest never named them, so a manifest-routed read constructed
    # at ANY point cannot have depended on them
    compact_latest_state(spark, path, ["symbol"], defer_retire=True)
    for d in deferred:
        assert not os.path.isdir(os.path.join(path, d))
    rows = latest_state_on_read(read_update_sink(spark, path), ["symbol"]).collect()
    assert [(r["symbol"], r["price"]) for r in rows] == [("AAPL", 104.0)]


# ---------------------------------------------------------------------------
# exhaustive crash-point sweep of the staged-publish protocol (round 15)
# ---------------------------------------------------------------------------
#
# The crash tests above pin hand-picked windows of compact_latest_state's
# protocol (mid-publish rename, retire loop, deferred-marker clear).  This
# sweep removes the hand-picking: it counts EVERY Python-side filesystem
# mutation of one full compaction (grace sweep -> stage -> publish-pending
# marker -> snapshot swap -> manifest rewrite -> retirement -> marker
# clear -> trash sweep) and re-runs the compaction crashing at each one,
# asserting after every crash point that
#   (a) a manifest-routed polling reader (read_update_sink, NO retry loop)
#       still constructs and resolves without error,
#   (b) the reader's resolved state is either the post-compact state or
#       the documented consistent-prior state -- and the prior state is
#       only ever observable in the protocol's ONE unprotected window
#       (the batch_id=<max> swap the read_update_sink docstring calls out,
#       absorbed by its isdir filter),
#   (c) re-running the same compaction entry point recovers to the exact
#       crash-free final state (pending markers consumed, no staged or
#       in-progress debris, manifest naming only dirs that exist).
#
# Both retirement flavors are swept: defer_retire=True (the polled-reader
# default everywhere in-repo) and the immediate flavor (sum-of-partials
# single-owner layers) -- the manifest-rewrite-before-retirement ordering
# makes even the immediate flavor reader-safe at every crash point here.


from crashsweep import _FsCrasher, _SimCrash


def _resolved_rows(spark, path: str):
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        latest_state_on_read,
        read_update_sink,
    )

    return _sorted_rows(
        latest_state_on_read(read_update_sink(spark, path), ["symbol"])
    )


@pytest.mark.parametrize("defer", [True, False], ids=["deferred", "immediate"])
def test_compaction_crash_sweep_every_fs_mutation(spark, tmp_path, defer):
    import shutil

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _manifest_add,
        _read_reader_manifest,
        _read_retire_pending,
        compact_latest_state,
        latest_state_on_read,
    )

    pristine = str(tmp_path / "pristine")

    def write_batch(layer: str, i: int, rows: list[tuple[str, float]]) -> None:
        spark.createDataFrame(rows, "symbol string, price double").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(layer, f"batch_id={i}"))
        _manifest_add(layer, f"batch_id={i}")

    # protocol-participating layer mid-life: one deferred compaction
    # already behind it (so the sweep covers the grace-sweep steps of
    # the NEXT one), two fresh batch dirs appended since
    for i, rows in enumerate(
        [
            [("AAPL", 1.0), ("MSFT", 2.0)],
            [("AAPL", 1.1)],
            [("NVDA", 3.0)],
            [("MSFT", 2.1)],
        ]
    ):
        write_batch(pristine, i, rows)
    compact_latest_state(spark, pristine, ["symbol"], defer_retire=True)
    assert sorted(_read_retire_pending(pristine)) == [
        f"batch_id={i}" for i in range(3)
    ]
    write_batch(pristine, 4, [("AAPL", 1.2)])
    write_batch(pristine, 5, [("NVDA", 3.1), ("AMZN", 4.0)])

    expected_full = _resolved_rows(spark, pristine)
    assert {r[0] for r in expected_full} == {"AAPL", "AMZN", "MSFT", "NVDA"}
    # the documented consistent-prior state: during the batch_id=<max>
    # swap the original max dir is retired one rename before the
    # snapshot replaces it; the isdir filter drops it and the reader
    # sees the as-of-previous-batch resolve (here: without batch 5)
    expected_prior = _sorted_rows(
        latest_state_on_read(
            spark.read.option("basePath", pristine).parquet(
                os.path.join(pristine, "batch_id=3"),
                os.path.join(pristine, "batch_id=4"),
            ),
            ["symbol"],
        )
    )

    work = str(tmp_path / "work")

    def restore() -> None:
        shutil.rmtree(work, ignore_errors=True)
        shutil.copytree(pristine, work)

    def debris_free() -> None:
        names = os.listdir(work)
        assert not any(n.startswith("_compact_staged_") for n in names)
        assert "_compact_inprogress" not in names
        # round-15 ADVICE (medium): a crash between _finish_publish's
        # pending-marker removal and its final rmtree strands
        # _compact_retired (full copies of superseded dirs) unless the
        # <=1-dir early return also reclaims it — assert it here so the
        # sweep detects the leak, not just staged/inprog debris
        assert "_compact_retired" not in names
        assert "_compact_publish_pending.json" not in names
        manifest = _read_reader_manifest(work)
        assert manifest, "protocol layer lost its reader manifest"
        for d in manifest:
            assert os.path.isdir(os.path.join(work, d)), (
                f"manifest names missing dir {d}"
            )
        for d in _read_retire_pending(work):
            assert os.path.isdir(os.path.join(work, d)), (
                f"retire-pending names already-deleted dir {d}"
            )

    # crash-free counted twin: N mutations + the expected final state
    restore()
    with _FsCrasher(work) as crasher:
        compact_latest_state(spark, work, ["symbol"], defer_retire=defer)
    n_mutations = crasher.count
    assert n_mutations >= 10, f"sweep saw only {n_mutations} mutations"
    assert _resolved_rows(spark, work) == expected_full
    debris_free()

    prior_windows = []
    for k in range(1, n_mutations + 1):
        restore()
        with _FsCrasher(work) as crasher:
            crasher.crash_at = k
            with pytest.raises(_SimCrash):
                compact_latest_state(spark, work, ["symbol"], defer_retire=defer)

            # (a)+(b) polling reader, NO retry: always constructs, and
            # resolves to the final or the documented prior state
            crasher.crash_at = None  # reader performs no mutations; belt
            rows = _resolved_rows(spark, work)
            assert rows in (expected_full, expected_prior), (
                f"crash at mutation {k}: reader saw an inconsistent state"
            )
            if rows == expected_prior:
                prior_windows.append(k)

        # (c) DOUBLE CRASH: the recovery run itself crashes at its own
        # k-th mutation (when it has that many — the recovery sequence
        # is shorter from late-crash states).  Every marker the resume
        # paths key on must tolerate a crash while being consumed.
        with _FsCrasher(work) as crasher2:
            crasher2.crash_at = k
            try:
                compact_latest_state(spark, work, ["symbol"], defer_retire=defer)
            except _SimCrash:
                pass
            crasher2.crash_at = None
            rows = _resolved_rows(spark, work)
            assert rows in (expected_full, expected_prior), (
                f"double crash at mutation {k}: reader saw an "
                "inconsistent state"
            )

        # (d) final recovery = re-running the same entry point
        compact_latest_state(spark, work, ["symbol"], defer_retire=defer)
        assert _resolved_rows(spark, work) == expected_full, (
            f"crash at mutation {k}: recovery did not converge"
        )
        debris_free()

    # the consistent-prior state is observable in exactly ONE window:
    # the crash that lands between the two renames of the snapshot swap
    # (original max dir retired, snapshot not yet visible)
    assert len(prior_windows) == 1, (
        f"prior-state windows at mutations {prior_windows}; the protocol "
        "documents exactly one (the batch_id=<max> swap)"
    )


def test_inline_compaction_crash_mid_drain_restart_converges(spark, tmp_path):
    """Crash-point sweep of the INLINE (mid-drain) compaction: unlike
    the stream-stopped sweep above, the crash here kills a live
    foreachBatch callback — the streaming query dies mid-drain, the
    crashed batch is replayed on restart, and parquet_sink's start-time
    finish_staged_compaction plus compact_latest_state's own pending-
    marker resume must compose with the replay.  At every mutation of
    the inline fold: (a) a manifest-routed polling reader still
    resolves to a committed batch-prefix state, (b) a plain restart
    (same sink call, same checkpoint) drains to completion, and (c) the
    final resolved state equals the crash-free twin's."""
    from crashsweep import _FsCrasher, _SimCrash

    import real_time_financial_market_data_pipeline_spark.streaming.sinks as sinks_mod
    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        latest_state_on_read,
        parquet_sink,
        read_update_sink,
    )

    feed = str(tmp_path / "feed")
    # exactly THREE files: with maxFilesPerTrigger=1 the inline fold
    # fires at batch 2 and nowhere else — availableNow drains can
    # append a trailing EMPTY batch (id 3 here), which with four files
    # would be id 4 and fire a nondeterministic SECOND fold (the
    # verify-skill gotcha; it made the first version of this test
    # flaky under load)
    batches = [
        [{"s": "AAPL", "p": 150.0, "v": 100, "t": T0}],
        [{"s": "MSFT", "p": 380.0, "v": 10, "t": T0 + 1000}],
        [{"s": "AAPL", "p": 151.0, "v": 50, "t": T0 + 2000}],
    ]
    for i, b in enumerate(batches):
        _write_jsonl(feed, f"b{i}.json", b)
        # distinct mtimes: files written within the same millisecond
        # tie in the file source's modification-time order and drain in
        # ARBITRARY order (the FIXTURES gotcha) — this test's batch-id
        # -> content mapping must be deterministic
        os.utime(os.path.join(feed, f"b{i}.json"), (1_700_000_000 + i,) * 2)

    def run_drain(out: str):
        from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream

        return parquet_sink(
            read_trade_stream(spark, feed, max_files_per_trigger=1),
            os.path.join(out, "prices"),
            os.path.join(out, "ckpt"),
            "inline_sweep",
            output_mode="update",
            compact_every=2,  # the inline fold fires at batch 2
            compact_keys=["symbol"],
        )

    def resolved(out: str):
        return _sorted_rows(
            latest_state_on_read(
                read_update_sink(spark, os.path.join(out, "prices")), ["symbol"]
            )
        )

    real_compact = sinks_mod.compact_latest_state

    # crash-free twin: final rows + the inline fold's mutation count
    twin = str(tmp_path / "twin")
    inline_counts: list[int] = []

    def counting(spark_, path_, keys, **kw):
        if kw.get("only_below") != 2:  # only the batch-2 inline fold
            return real_compact(spark_, path_, keys, **kw)
        with _FsCrasher(path_) as c:
            r = real_compact(spark_, path_, keys, **kw)
        inline_counts.append(c.count)
        return r

    sinks_mod.compact_latest_state = counting
    try:
        q = run_drain(twin)
        assert q.awaitTermination(300)
    finally:
        sinks_mod.compact_latest_state = real_compact
    assert inline_counts, "the batch-2 inline fold never fired"
    n_mutations = inline_counts[0]
    assert n_mutations >= 8, n_mutations
    twin_rows = resolved(twin)
    assert {r[0] for r in twin_rows} == {"AAPL", "MSFT"}

    # committed batch-prefix states a reader may see during the crash
    # window: as-of batch 1, or as-of batch 0 (the one-rename swap)
    allowed_prefixes = (
        {("AAPL", 150.0)},
        {("AAPL", 150.0), ("MSFT", 380.0)},
    )

    for k in range(1, n_mutations + 1):
        out = str(tmp_path / f"run_{k}")

        def crashing(spark_, path_, keys, **kw):
            if kw.get("only_below") != 2:  # crash only the batch-2 fold
                return real_compact(spark_, path_, keys, **kw)
            with _FsCrasher(path_) as c:
                c.crash_at = k
                return real_compact(spark_, path_, keys, **kw)

        sinks_mod.compact_latest_state = crashing
        try:
            q = run_drain(out)
            with pytest.raises(Exception, match="simulated crash"):
                q.awaitTermination(300)
        finally:
            sinks_mod.compact_latest_state = real_compact

        # (a) polling reader mid-crash: committed prefix, no retry
        seen = {(r[0], r[1]) for r in (
            (row["symbol"], row["price"]) for row in latest_state_on_read(
                read_update_sink(spark, os.path.join(out, "prices")), ["symbol"]
            ).collect()
        )}
        assert seen in allowed_prefixes, (
            f"crash at mutation {k}: reader saw {seen}"
        )

        # (b)+(c) plain restart on the same checkpoint: replays batch 2,
        # resumes/redoes the fold, finishes the drain
        q = run_drain(out)
        assert q.awaitTermination(300)
        assert resolved(out) == twin_rows, (
            f"crash at mutation {k}: restart did not converge"
        )


def test_gold_bucketed_relayout_crash_sweep(spark, tmp_path):
    """Crash-point sweep of compact_gold_bucketed's RE-LAYOUT branch
    (an already-plain-folded snapshot rewritten bucketed through the
    staged three-rename swap: inprog -> staged, snap -> trash,
    staged -> snap, drop trash).  The round-6 tests pin the two
    hand-picked rename windows; this sweeps every mutation, asserting
    that simply re-calling compact_gold_bucketed recovers: the final
    snapshot is bucket-spec-valid, the serving table resolves the
    exact pre-sweep rows, and no inprog/staged/trash debris survives
    — including the stranded-trash and stale-inprog cases the entry
    cleanups exist for."""
    from crashsweep import _FsCrasher, _SimCrash

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        _bucketed_layout_ok,
        compact_gold_bucketed,
        compact_latest_state,
    )
    import shutil

    T = "relayout_sweep_serving"
    spark.sql(f"DROP TABLE IF EXISTS `{T}`")
    path = str(tmp_path / "gold")
    for i, rows in enumerate(
        [[("AAPL", 1.0), ("MSFT", 2.0)], [("AAPL", 1.1), ("NVDA", 3.0)]]
    ):
        spark.createDataFrame(rows, "symbol string, price double").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(path, f"batch_id={i}"))
    # plain fold first: single NON-bucketed snapshot -> the bucketed
    # compaction below must take the re-layout branch
    compact_latest_state(spark, path, ["symbol"])
    assert _batch_ids(path) == {1}
    pristine = str(tmp_path / "pristine")
    shutil.copytree(path, pristine)

    def restore() -> None:
        shutil.rmtree(path)
        shutil.copytree(pristine, path)
        spark.sql(f"DROP TABLE IF EXISTS `{T}`")

    # crash-free counted twin
    restore()
    with _FsCrasher(path) as c:
        compact_gold_bucketed(spark, path, ["symbol"], T, n_buckets=2)
    n_mutations = c.count
    assert n_mutations >= 6, n_mutations
    snap = os.path.join(path, "batch_id=1")
    assert _bucketed_layout_ok(snap, 2, "symbol")
    twin_rows = _sorted_rows(spark.table(T))
    assert {r[0] for r in twin_rows} == {"AAPL", "MSFT", "NVDA"}

    for k in range(1, n_mutations + 1):
        restore()
        with _FsCrasher(path) as c:
            c.crash_at = k
            with pytest.raises(_SimCrash):
                compact_gold_bucketed(spark, path, ["symbol"], T, n_buckets=2)

        # DOUBLE CRASH (round-16, closing the coverage boundary noted
        # in SCALE.md): the recovery run itself crashes at its own k-th
        # mutation (when it performs that many — recovery from
        # late-crash states is shorter).  The swap is stream-stopped,
        # so the harness composes directly.
        with _FsCrasher(path) as c2:
            c2.crash_at = k
            try:
                compact_gold_bucketed(spark, path, ["symbol"], T, n_buckets=2)
            except _SimCrash:
                pass

        # recovery = the same entry point again
        compact_gold_bucketed(spark, path, ["symbol"], T, n_buckets=2)
        assert _bucketed_layout_ok(os.path.join(path, "batch_id=1"), 2, "symbol"), (
            f"crash at {k}: snapshot not bucketed after recovery"
        )
        assert _sorted_rows(spark.table(T)) == twin_rows, (
            f"crash at {k}: serving rows diverged"
        )
        leftovers = [
            d
            for d in os.listdir(path)
            if d in ("_compact_inprogress", "_compact_trash")
            or d.startswith("_compact_staged_")
        ]
        assert not leftovers, f"crash at {k}: debris {leftovers}"

    spark.sql(f"DROP TABLE IF EXISTS `{T}`")
