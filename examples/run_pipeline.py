"""Live end-to-end demo: synthetic trade feed → streaming medallion →
serving queries over the accumulating gold tables.

    python examples/run_pipeline.py [seconds] [out_dir]

Runs the rate source at ~200 trades/s through parse → watermark →
dedup → bronze/silver/gold(5m+1h) with a 2-second processing-time
trigger, then answers the reference's dashboard-style queries from the
written tables and shuts down gracefully (SIGINT-safe — Ctrl-C is the
graceful path).
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.session import get_spark
from real_time_financial_market_data_pipeline_spark.sources.streaming import rate_trade_stream
from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob, observed_with_metrics
from real_time_financial_market_data_pipeline_spark.streaming.runner import GracefulRunner
from real_time_financial_market_data_pipeline_spark.streaming.sinks import latest_state_on_read


def main() -> None:
    run_s = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_demo_")
    spark = get_spark(app_name="pipeline_demo")

    trades = observed_with_metrics(rate_trade_stream(spark, rows_per_second=200))
    job = MedallionStreamJob(
        out_dir=out_dir,
        watermark="30 seconds",
        gold_window="10 seconds",
        gold_window_slow="1 minute",
        trigger={"processingTime": "2 seconds"},
    )
    mgr = job.start(trades)
    runner = GracefulRunner(mgr).install()
    print(f"pipeline running → {out_dir} (for ~{run_s:.0f}s; Ctrl-C for graceful stop)")

    deadline = time.time() + run_s
    while time.time() < deadline and runner.stopped_by_signal is None:
        time.sleep(2.0)
        for name, q in mgr.queries.items():
            p = q.lastProgress
            if p and name == "silver":
                om = (p.get("observedMetrics") or {}).get("validation")
                om = om.asDict() if hasattr(om, "asDict") else (om or {})
                print(
                    f"  [{name}] batch={p['batchId']} rows={p['numInputRows']} "
                    f"observed_total={om.get('total')}"
                )
    if runner.stopped_by_signal is None:
        mgr.stop_all()
    runner.run(timeout_s=60)

    print("\n— serving queries over the written tables —")
    silver = spark.read.parquet(f"{out_dir}/silver")
    print("silver trades:", silver.count())
    gold = latest_state_on_read(
        spark.read.parquet(f"{out_dir}/gold_5m"), ["symbol", "window_start"]
    )
    print("gold bars (10s windows):")
    gold.orderBy(F.desc("window_start")).limit(5).show(truncate=False)
    print("volume by symbol:")
    gold.groupBy("symbol").agg(F.sum("volume").alias("total_volume")).orderBy(
        "symbol"
    ).show()

    # round-6 serving path: fold the update-mode gold sink into a
    # bucketed snapshot and serve latest bars with a zero-Exchange read
    from real_time_financial_market_data_pipeline_spark.pipeline.materialize import latest_bars_from_bucketed

    table = job.publish_gold_bucketed(spark, "gold_5m", n_buckets=4)
    print(f"bucketed serving table '{table}' (shuffle-free reads):")
    latest_bars_from_bucketed(spark, table, k=3).orderBy(
        "symbol", F.desc("window_start")
    ).limit(6).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
