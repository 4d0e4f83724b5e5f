"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed over a full materialization (count of the result)
so the whole plan executes; the session is warmed up once first so JVM
startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import time

from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES
from real_time_financial_market_data_pipeline_spark.session import get_spark

HEADLINE = [
    "silver_trades",
    "ohlcv_5m",
    "ohlcv_1h",
    "latest_prices",
    "latest_bars_per_symbol",
    "volume_by_symbol_on_date",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "priority_count_returned",
    "asof_purchase_view",
    "doc_profile",  # superset of round-1's doc_stats (adds quality + langid columns)
    "dedup_exact_docs",
    "minhash_near_dups",
    "knn_bruteforce",
]


def bench_streaming_chained(spark, sf_dir: str) -> float:
    """Single-source-scan medallion (start_chained): bronze drains from
    the feed, then silver streams the bronze TABLE, then gold streams
    silver — the one-scan shape that matters when the source is a
    100 TB topic.  Timed as a full sequential drain."""
    import shutil
    import tempfile

    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob
    from real_time_financial_market_data_pipeline_spark.tables import load_table, trades_from_events

    work = tempfile.mkdtemp(prefix="bench_chained_")
    feed = os.path.join(work, "feed")
    out = os.path.join(work, "out")
    try:
        trades = trades_from_events(load_table(spark, sf_dir, "events"))
        (
            trades.selectExpr("symbol AS s", "price AS p", "volume AS v", "timestamp AS t")
            .repartition(10)
            .write.json(feed)
        )
        t0 = time.perf_counter()
        job = MedallionStreamJob(out_dir=out, trigger={"availableNow": True})
        mgr = job.start(read_trade_stream(spark, feed), chained=True)
        mgr.await_all(timeout_s=600)
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_streaming_medallion(spark, sf_dir: str) -> tuple[float, int]:
    """End-to-end streaming envelope (BASELINE.md protocol): the events
    table replayed as a JSON trade feed through parse → validate → dedup
    → OHLCV 5m → parquet sinks in 10 micro-batches. Returns (drain
    seconds, silver rows) — the comparable number for the reference's
    'sustain a 10s trigger with <10s end-to-end latency'."""
    import shutil
    import tempfile

    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob
    from real_time_financial_market_data_pipeline_spark.tables import load_table, trades_from_events

    work = tempfile.mkdtemp(prefix="bench_stream_")
    feed = os.path.join(work, "feed")
    out = os.path.join(work, "out")
    try:
        # feed prep (not timed): wire-format JSON in 10 files = 10 batches
        trades = trades_from_events(load_table(spark, sf_dir, "events"))
        (
            trades.selectExpr(
                "symbol AS s", "price AS p", "volume AS v", "timestamp AS t"
            )
            .repartition(10)
            .write.json(feed)
        )
        t0 = time.perf_counter()
        job = MedallionStreamJob(out_dir=out, trigger={"availableNow": True})
        mgr = job.start(read_trade_stream(spark, feed, max_files_per_trigger=1))
        mgr.await_all(timeout_s=600)
        drain = time.perf_counter() - t0
        n_silver = spark.read.parquet(os.path.join(out, "silver")).count()
        return round(drain, 3), n_silver
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # warm up: JVM + parquet footer reads, not attributed to any query
    QUERIES["pricing_summary"](spark, sf_dir).count()

    # two runs per query, min taken: first run pays plan compile/codegen,
    # and the min damps interference from co-tenant load on the host
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # min-of-2 for the streaming drain too (fresh checkpoints each run) —
    # co-tenant load on this host can inflate a single drain 2-3x
    stream_s = min(bench_streaming_medallion(spark, sf_dir)[0] for _ in range(2))
    timings["streaming_medallion_10batches"] = stream_s
    timings["streaming_medallion_chained"] = min(
        bench_streaming_chained(spark, sf_dir) for _ in range(2)
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
