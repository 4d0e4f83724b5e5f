"""Controlled repetition experiment for latest_prices_stream_drain
(round-18 VERDICT task 3): the entry measured 2.24-3.66 s across ten
round-17 runs (r16 baseline 2.012) at ZERO changed engine lines — the
round's widest unexplained band, and unlike fanout it had no SCALE.md
root-cause bullet.

Same treatment the fanout and trades-path questions got: ONE fresh
JVM, N back-to-back drain repetitions (fresh checkpoint + fresh feed
dir each rep, exactly as the bench entry runs), with BOTH host probes
(CPU shuffle + streaming drain) interleaved between reps so a
co-tenant burst is visible in the probe trace rather than ambiguous.
Classifies the band as one of:

  - first-touch: rep 1 >> reps 2+ (the LatestPricesStreamJob path is
    the run's ONLY applyInPandasWithState job — Python worker pool +
    Arrow state serde spin-up happens here and nowhere earlier) ->
    fix = one untimed warm drain in bench.py's warmup;
  - topology-intrinsic: flat probes, reps swing anyway (like fanout's
    3-concurrent-queries heavy tail) -> document, no code change;
  - single-sample artifact: reps 2+ tight, probes flat -> the band is
    just one-shot sampling luck; fix = min-of-2 like every other drain.

Usage: python scripts/latest_prices_experiment.py [n_reps]
Prints one JSON line; record the numbers in NOTES.md / SCALE.md.
"""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def one_drain(spark, sf_dir: str) -> float:
    """Exactly the bench entry's timed region (bench.py
    bench_latest_prices_bucketed): write the json feed, start
    LatestPricesStreamJob on a fresh checkpoint, await drain."""
    from real_time_financial_market_data_pipeline_spark.sources.streaming import (
        read_trade_stream,
    )
    from real_time_financial_market_data_pipeline_spark.streaming.jobs import (
        LatestPricesStreamJob,
    )
    from real_time_financial_market_data_pipeline_spark.tables import (
        load_table,
        trades_from_events,
    )

    work = tempfile.mkdtemp(prefix="lp_exp_")
    feed, out = os.path.join(work, "feed"), os.path.join(work, "out")
    try:
        trades = trades_from_events(load_table(spark, sf_dir, "events"))
        trades.selectExpr(
            "symbol AS s", "price AS p", "volume AS v", "timestamp AS t"
        ).coalesce(4).write.json(feed)
        job = LatestPricesStreamJob(out_dir=out)
        t0 = time.perf_counter()
        mgr = job.start(read_trade_stream(spark, feed))
        mgr.await_all(timeout_s=600)
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.get_spark(app_name="lp_experiment")
    # the bench run's generic warmup (lineitem + trades path), so rep 1
    # here isolates the latest-prices-job-specific first touch, not the
    # generic scan/JIT cost the r17 warmup already removed
    from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES

    for w in ("pricing_summary", "ohlcv_5m", "silver_trades"):
        QUERIES[w](spark, sf_dir).count()

    drains, cpu_probes, stream_probes = [], [], []
    cpu_probes.append(bench.bench_host_calibration(spark))
    stream_probes.append(bench.bench_host_calibration_streaming(spark))
    for i in range(n):
        drains.append(one_drain(spark, sf_dir))
        cpu_probes.append(bench.bench_host_calibration(spark))
        stream_probes.append(bench.bench_host_calibration_streaming(spark))
        print(
            f"rep {i + 1}: drain={drains[-1]} cpu_probe={cpu_probes[-1]:.3f} "
            f"stream_probe={stream_probes[-1]:.3f}",
            flush=True,
        )
    # round-18 ADVICE: true median (unbiased for even n of post-warm
    # reps; the old upper-element pick understated first_over_steady)
    steady = statistics.median(drains[1:]) if len(drains) > 1 else None
    print(
        json.dumps(
            {
                "experiment": "latest_prices_stream_drain_reps",
                "sf_dir": sf_dir,
                "drains": drains,
                "first_over_steady": (
                    round(drains[0] / steady, 3) if steady else None
                ),
                "rep_spread_excl_first": (
                    round(max(drains[1:]) / min(drains[1:]), 3)
                    if len(drains) > 2
                    else None
                ),
                "cpu_probes": [round(p, 3) for p in cpu_probes],
                "stream_probes": [round(p, 3) for p in stream_probes],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
