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


def test_socket_trade_stream_live(spark, tmp_path):
    """Drive the socket source (S2 stand-in for the WebSocket feed) with
    a real TCP server pushing line-JSON trades; rows must arrive parsed
    and normalized in the memory sink."""
    import socket
    import threading

    from real_time_financial_market_data_pipeline_spark.sources.streaming import socket_trade_stream

    records = [
        {"s": "AAPL", "p": 150.25, "v": 100, "t": T0, "c": ["1"]},
        {"s": "MSFT", "p": 380.0, "v": 200, "t": T0 // 1000},  # seconds → ms
    ]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            payload = "".join(json.dumps(r) + "\n" for r in records)
            conn.sendall(payload.encode())
            time.sleep(8)  # keep the connection up while the stream polls

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        trades = socket_trade_stream(spark, "127.0.0.1", port)
        q = (
            trades.writeStream.format("memory")
            .queryName("socket_trades")
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                if spark.sql("SELECT count(*) n FROM socket_trades").collect()[0]["n"] >= 2:
                    break
                time.sleep(0.5)
            rows = {r["symbol"]: r for r in spark.sql("SELECT * FROM socket_trades").collect()}
            assert set(rows) == {"AAPL", "MSFT"}
            assert rows["AAPL"]["price"] == 150.25 and rows["AAPL"]["conditions"] == ["1"]
            assert rows["MSFT"]["timestamp"] == (T0 // 1000) * 1000  # normalized
        finally:
            q.stop()
    finally:
        srv.close()


def test_avro_governance_and_gated_wire():
    """Avro module: schema constants mirror the reference's avsc files;
    BACKWARD compatibility rules enforced in pure Python; the wire half
    raises a clear error when spark-avro is absent (this container)."""
    import json as _json

    import pytest as _pytest

    from real_time_financial_market_data_pipeline_spark.functions.avro import (
        QUOTE_AVRO_SCHEMA,
        TRADE_AVRO_SCHEMA,
        backward_incompatibilities,
        is_backward_compatible,
    )

    trade = _json.loads(TRADE_AVRO_SCHEMA)
    assert [f["name"] for f in trade["fields"]] == [
        "symbol", "price", "volume", "timestamp", "conditions", "ingestion_time",
    ]
    assert _json.loads(QUOTE_AVRO_SCHEMA)["fields"][1]["name"] == "bid_price"

    # adding a defaulted field is BACKWARD compatible…
    evolved = dict(trade)
    evolved["fields"] = trade["fields"] + [
        {"name": "venue", "type": "string", "default": "UNKNOWN"}
    ]
    assert is_backward_compatible(trade, evolved)
    # …adding one WITHOUT a default is not
    bad = dict(trade)
    bad["fields"] = trade["fields"] + [{"name": "venue", "type": "string"}]
    assert not is_backward_compatible(trade, bad)
    # …and narrowing a type (long -> int) is not, while widening is
    narrowed = _json.loads(TRADE_AVRO_SCHEMA)
    narrowed["fields"][2]["type"] = "int"  # volume long -> int
    assert "volume" in backward_incompatibilities(trade, narrowed)[0]
    widened = _json.loads(TRADE_AVRO_SCHEMA)
    widened["fields"][1]["type"] = "double"  # price double -> double (noop ok)
    assert is_backward_compatible(trade, widened)


def test_avro_wire_raises_without_package(spark):
    import pytest as _pytest

    from real_time_financial_market_data_pipeline_spark.functions.avro import avro_available, trades_to_avro

    df = spark.createDataFrame(
        [("AAPL", 1.0, 1, T0, [], T0)],
        "symbol string, price double, volume long, timestamp long, "
        "conditions array<string>, ingestion_time long",
    )
    if avro_available(spark):
        out = df.select(trades_to_avro(df))
        assert out.schema[0].dataType.typeName() == "binary"
    else:
        with _pytest.raises(ModuleNotFoundError, match="spark-avro"):
            trades_to_avro(df)


def test_compact_latest_state(spark, tmp_path):
    """Compaction folds N batch_id dirs into one snapshot with identical
    resolve-on-read results, and resumes correctly after a simulated
    crash between staging and publish."""
    import shutil

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        compact_latest_state,
        latest_state_on_read,
    )

    path = str(tmp_path / "gold")
    # 4 micro-batch emissions: AAPL updated every batch, MSFT in 0 and 2
    emissions = {
        0: [("AAPL", 100.0), ("MSFT", 300.0)],
        1: [("AAPL", 101.0)],
        2: [("AAPL", 102.0), ("MSFT", 302.0)],
        3: [("AAPL", 103.0)],
    }
    for bid, rows in emissions.items():
        spark.createDataFrame(rows, "symbol string, price double").write.parquet(
            os.path.join(path, f"batch_id={bid}")
        )

    before = {
        r["symbol"]: r["price"]
        for r in latest_state_on_read(spark.read.parquet(path), ["symbol"]).collect()
    }
    assert before == {"AAPL": 103.0, "MSFT": 302.0}

    folded = compact_latest_state(spark, path, ["symbol"])
    assert folded == 4
    dirs = [d for d in os.listdir(path) if d.startswith("batch_id=")]
    assert dirs == ["batch_id=3"]
    after = {
        r["symbol"]: r["price"]
        for r in latest_state_on_read(spark.read.parquet(path), ["symbol"]).collect()
    }
    assert after == before

    # a later micro-batch still wins over the snapshot
    spark.createDataFrame([("AAPL", 104.0)], "symbol string, price double").write.parquet(
        os.path.join(path, "batch_id=4")
    )
    assert (
        latest_state_on_read(spark.read.parquet(path), ["symbol"])
        .filter(F.col("symbol") == "AAPL")
        .collect()[0]["price"]
        == 104.0
    )

    # crash between staging and publish: stage dir exists, batch dirs too
    path2 = str(tmp_path / "gold2")
    for bid, rows in emissions.items():
        spark.createDataFrame(rows, "symbol string, price double").write.parquet(
            os.path.join(path2, f"batch_id={bid}")
        )
    resolved = latest_state_on_read(spark.read.parquet(path2), ["symbol"])
    resolved.write.parquet(os.path.join(path2, "_compact_inprogress"))
    os.rename(
        os.path.join(path2, "_compact_inprogress"),
        os.path.join(path2, "_compact_staged_3"),
    )
    shutil.rmtree(os.path.join(path2, "batch_id=0"))  # crash mid-delete
    folded2 = compact_latest_state(spark, path2, ["symbol"])  # resume
    assert folded2 == 3
    assert [d for d in os.listdir(path2) if d.startswith("batch_id=")] == ["batch_id=3"]
    resumed = {
        r["symbol"]: r["price"]
        for r in latest_state_on_read(spark.read.parquet(path2), ["symbol"]).collect()
    }
    assert resumed == {"AAPL": 103.0, "MSFT": 302.0}


def test_compact_latest_state_discards_stale_stage(spark, tmp_path):
    """Crash in phase 2, then the STREAM restarts and appends batches
    above the staged max_id, then compaction re-runs: the stale staged
    snapshot must be discarded and recomputed — finishing the stale
    publish would delete the post-crash batches' updates forever."""
    import shutil

    from real_time_financial_market_data_pipeline_spark.streaming.sinks import (
        compact_latest_state,
        latest_state_on_read,
    )

    path = str(tmp_path / "gold")
    emissions = {
        0: [("AAPL", 100.0), ("MSFT", 300.0)],
        1: [("AAPL", 101.0)],
        2: [("AAPL", 102.0)],
    }
    for bid, rows in emissions.items():
        spark.createDataFrame(rows, "symbol string, price double").write.parquet(
            os.path.join(path, f"batch_id={bid}")
        )
    # stage a snapshot covering batches 0-2, crash before publish
    resolved = latest_state_on_read(spark.read.parquet(path), ["symbol"])
    resolved.write.parquet(os.path.join(path, "_compact_inprogress"))
    os.rename(
        os.path.join(path, "_compact_inprogress"),
        os.path.join(path, "_compact_staged_2"),
    )
    # stream restarts and lands two NEWER batches before compaction re-runs
    spark.createDataFrame([("AAPL", 103.0)], "symbol string, price double").write.parquet(
        os.path.join(path, "batch_id=3")
    )
    spark.createDataFrame([("MSFT", 304.0)], "symbol string, price double").write.parquet(
        os.path.join(path, "batch_id=4")
    )

    folded = compact_latest_state(spark, path, ["symbol"])
    assert folded == 5  # recomputed over everything, stale stage discarded
    assert [d for d in os.listdir(path) if d.startswith("batch_id=")] == ["batch_id=4"]
    assert not [d for d in os.listdir(path) if d.startswith("_compact")]
    after = {
        r["symbol"]: r["price"]
        for r in latest_state_on_read(spark.read.parquet(path), ["symbol"]).collect()
    }
    # post-crash updates survive (the bug folded back to 102.0/300.0)
    assert after == {"AAPL": 103.0, "MSFT": 304.0}


def test_doc_stream_curation(spark, tmp_path):
    """Streaming training-data curation: duplicate docs collapse (first
    arrival wins), low-quality docs are gated out, survivors carry
    metrics + a stable split, and curated/ is partitioned by split."""
    from real_time_financial_market_data_pipeline_spark.streaming.docpipeline import DocStreamJob
    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs off "
        "to the hills where it finds a quiet place to rest for a while"
    )
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    os.makedirs(feed)
    docs = [
        {"doc_id": 1, "text": good, "lang": "en", "source": "a"},
        {"doc_id": 2, "text": good, "lang": "en", "source": "b"},      # exact dup of 1
        {"doc_id": 3, "text": "!!! ??? !!!", "lang": "en", "source": "a"},  # junk
        {"doc_id": 4, "text": good + " truly unique tail email bob@example.com okay", "lang": "en", "source": "a"},
        # boilerplate: a perfectly fluent line spammed 6x — token-level
        # quality passes, the intra-doc repetition gate must catch it
        {"doc_id": 5, "text": "\n".join(["the cat sat on the mat and it was happy to rest in the sun"] * 6), "lang": "en", "source": "a"},
    ]
    with open(os.path.join(feed, "f.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    job = DocStreamJob(out_dir=out, quality_min=0.5)
    mgr = job.start(read_doc_stream(spark, feed))
    assert mgr.await_all(timeout_s=120)

    raw = spark.read.parquet(os.path.join(out, "raw"))
    assert raw.count() == 5  # audit layer keeps everything
    assert {"n_tokens", "quality", "lang_guess", "fingerprint", "repetition"} <= set(raw.columns)
    raw5 = raw.filter(F.col("doc_id") == 5).collect()[0]
    assert raw5["quality"] >= 0.5            # fluent line: quality passes...
    assert raw5["repetition"]["dup_line_ratio"] > 0.3  # ...repetition doesn't

    curated = spark.read.parquet(os.path.join(out, "curated"))
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 3 not in ids                      # junk gated by quality
    assert 5 not in ids                      # boilerplate gated by repetition
    assert len(ids & {1, 2}) == 1            # dup family collapsed to one
    assert 4 in ids
    # split is present, valued, and derived from doc_id (stable)
    splits = {r["doc_id"]: r["split"] for r in curated.select("doc_id", "split").collect()}
    assert set(splits.values()) <= {"train", "val", "test"}
    # PII redacted in curated (raw keeps the original for audit)
    cur4 = curated.filter(F.col("doc_id") == 4).collect()[0]["text"]
    assert "<EMAIL>" in cur4 and "bob@example.com" not in cur4
    raw4 = raw.filter(F.col("doc_id") == 4).collect()[0]["text"]
    assert "bob@example.com" in raw4
    # partition layout: split=<val> directories under some batch dir
    batch_dirs = [d for d in os.listdir(os.path.join(out, "curated")) if d.startswith("batch_id=")]
    assert batch_dirs
    sub = os.listdir(os.path.join(out, "curated", batch_dirs[0]))
    assert any(s.startswith("split=") for s in sub)


def test_rocksdb_state_store_executes(spark, tmp_path):
    """use_rocksdb_state=True must actually run (rocksdbjni ships with
    Spark 4) and produce the same silver/dedup results as the default
    HDFS-backed store."""
    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    os.makedirs(feed)
    with open(os.path.join(feed, "f.json"), "w") as f:
        for i in range(6):
            f.write(json.dumps({"s": "AAPL", "p": 100.0 + i, "v": 10, "t": T0 + (i % 3) * 1000}) + "\n")

    job = MedallionStreamJob(out_dir=out, use_rocksdb_state=True)
    mgr = job.start(read_trade_stream(spark, feed))
    assert mgr.await_all(timeout_s=120)
    silver = spark.read.parquet(os.path.join(out, "silver"))
    # 6 rows over 3 distinct (symbol, timestamp) keys -> dedup keeps 3
    assert silver.count() == 3
    # provider restored on the shared session after the job
    assert "RocksDB" not in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )


def test_doc_stream_excise_spans_post_drain(spark, tmp_path):
    """DocStreamJob.excise_spans: the stream-stopped span-dedup pass
    rewrites curated docs with corpus-common spans excised (keep-one
    rule), preserving every row, the metric columns, and the split
    partition layout a training job consumes."""
    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream
    from real_time_financial_market_data_pipeline_spark.streaming.docpipeline import DocStreamJob

    boiler = (
        "copyright notice all rights reserved by the example company "
        "and its subsidiaries worldwide in every region"
    )  # 16 tokens, will be shared by every doc
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    os.makedirs(feed)
    with open(os.path.join(feed, "f.json"), "w") as f:
        for i in range(8):
            text = (
                f"document {i} body talks about subject {i * 3} in detail "
                f"with several honest sentences of its own material here "
                + boiler
            )
            f.write(json.dumps({"doc_id": i, "text": text, "lang": "en", "source": "a"}) + "\n")

    job = DocStreamJob(out_dir=out)
    mgr = job.start(read_doc_stream(spark, feed))
    assert mgr.await_all(timeout_s=120)
    curated = spark.read.parquet(os.path.join(out, "curated"))
    n = curated.count()
    assert n == 8

    path = job.excise_spans(spark, k=8, min_docs=5)
    excised = spark.read.parquet(path)
    assert excised.count() == n                       # every row preserved
    assert {"split", "quality", "n_tokens", "excised_tokens"} <= set(excised.columns)
    rows = {r["doc_id"]: r for r in excised.collect()}
    keepers = [d for d, r in rows.items() if boiler in r["text"]]
    assert keepers == [0]                             # canonical rep only
    # untouched docs keep their curated bytes exactly (no gratuitous
    # token-normalization of documents the pass didn't excise)
    curated_text = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert rows[0]["text"] == curated_text[0]
    touched = [d for d, r in rows.items() if r["excised_tokens"] > 0]
    assert sorted(touched) == list(range(1, 8))
    for d in range(1, 8):                             # own material intact
        assert f"document {d} body talks about subject {d * 3}" in rows[d]["text"]
    # split partition dirs exist on disk (training-job layout)
    assert any(p.startswith("split=") for p in os.listdir(path))

    # splice-safe treatment (mode="split"): same pass, chunk-row output
    # in its own directory, the rep doc keeps the boilerplate intact and
    # every other doc's chunks contain NO 8-gram of it
    path2 = job.excise_spans(spark, k=8, min_docs=5, mode="split")
    assert path2.endswith("curated_excised_split")
    chunks = spark.read.parquet(path2)
    assert {"doc_id", "chunk_idx", "token_start", "text", "chunk_tokens", "split"} <= set(
        chunks.columns
    )
    by_doc: dict[int, list] = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(8))
    btoks = boiler.split()
    bwindows = {" ".join(btoks[i : i + 8]) for i in range(len(btoks) - 8 + 1)}
    assert any(boiler in r["text"] for r in by_doc[0])
    for d in range(1, 8):
        for r in by_doc[d]:
            ctoks = r["text"].split()
            got_windows = {
                " ".join(ctoks[i : i + 8]) for i in range(len(ctoks) - 8 + 1)
            }
            assert not (got_windows & bwindows), (d, r["text"])
        assert any(
            f"document {d} body talks about subject {d * 3}" in r["text"]
            for r in by_doc[d]
        )

    # within-document repair pass: a doc whose tail repeats its own
    # opening keeps one copy (keep-first), others untouched
    with open(os.path.join(feed, "late.json"), "w") as f:
        rep = "repeat this exact phrase again and again and again"
        f.write(
            json.dumps(
                {"doc_id": 99, "text": rep + " middle words " + rep, "lang": "en", "source": "a"}
            )
            + "\n"
        )
    mgr2 = job.start(read_doc_stream(spark, feed))
    assert mgr2.await_all(timeout_s=120)
    path3 = job.excise_internal(spark, k=8)
    assert path3.endswith("curated_excised_internal")
    fixed = {r["doc_id"]: r for r in spark.read.parquet(path3).collect()}
    assert fixed[99]["excised_tokens"] == 9
    assert fixed[99]["text"] == rep + " middle words"
    assert fixed[0]["excised_tokens"] == 0  # boiler occurs once per doc

    # splice-safe chunk-row variant of the repair
    path4 = job.excise_internal(spark, k=8, mode="split")
    assert path4.endswith("curated_excised_internal_split")
    sp = {}
    for r in spark.read.parquet(path4).collect():
        sp.setdefault(r["doc_id"], []).append(r)
    chunks99 = sorted(sp[99], key=lambda r: r["chunk_idx"])
    assert [c["text"] for c in chunks99] == [rep + " middle words"]
    assert len(sp[0]) == 1  # untouched doc: one whole-doc chunk
