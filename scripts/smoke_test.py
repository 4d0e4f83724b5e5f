"""End-to-end health check — the engine's analogue of the reference's
smoke test (reference scripts/smoke_test.py: 6 service checks ending in
a "data flowed today" count).  Here the services are the engine's own
surfaces; exit code 0 iff every check passes.

    python scripts/smoke_test.py [sf_dir]

Checks:
  1. tables      — every driver table loads and has rows
  2. views       — serving views register; Q2 trades-today answers > 0
  3. gold        — OHLCV bars materialize with sane invariants
  4. latest      — latest-prices view non-empty, one row per symbol
  5. streaming   — a medallion micro-batch drains end-to-end (tmp dirs)
  6. oracle      — one differential spot-check vs DuckDB (silver_trades)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    failures: list[str] = []

    def check(name: str, fn) -> None:
        try:
            fn()
            print(f"  ok   {name}")
        except Exception as e:  # noqa: BLE001 — a smoke test reports, not raises
            failures.append(name)
            print(f"  FAIL {name}: {type(e).__name__}: {e}")

    from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL, QUERIES
    from real_time_financial_market_data_pipeline_spark.serving.views import SERVING_SQL, register_market_views
    from real_time_financial_market_data_pipeline_spark.session import get_spark
    from real_time_financial_market_data_pipeline_spark.tables import TABLE_NAMES, load_table

    spark = get_spark(app_name="smoke_test")
    print(f"smoke test against {sf_dir}")

    def tables():
        for t in TABLE_NAMES:
            assert load_table(spark, sf_dir, t).count() > 0, t

    def views():
        register_market_views(spark, sf_dir)
        n = spark.sql(SERVING_SQL["q2_trades_today"]).collect()[0][0]
        assert n > 0, f"no trades today (n={n})"

    def gold():
        bars = QUERIES["ohlcv_5m"](spark, sf_dir)
        row = bars.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("low") <= F.col("high")).alias("lh"),
        ).collect()[0]
        assert row["n"] > 0 and row["lh"], row

    def latest():
        lp = QUERIES["latest_prices"](spark, sf_dir)
        n_syms = load_table(spark, sf_dir, "events").select("event_type").distinct().count()
        assert lp.count() == n_syms

    def streaming():
        from real_time_financial_market_data_pipeline_spark.sources.streaming import read_trade_stream
        from real_time_financial_market_data_pipeline_spark.streaming.jobs import MedallionStreamJob
        from real_time_financial_market_data_pipeline_spark.tables import trades_from_events

        work = tempfile.mkdtemp(prefix="smoke_stream_")
        try:
            feed = os.path.join(work, "feed")
            trades_from_events(load_table(spark, sf_dir, "events")).limit(500).selectExpr(
                "symbol AS s", "price AS p", "volume AS v", "timestamp AS t"
            ).coalesce(1).write.json(feed)
            job = MedallionStreamJob(out_dir=os.path.join(work, "out"))
            mgr = job.start(read_trade_stream(spark, feed))
            assert mgr.await_all(timeout_s=180)
            assert spark.read.parquet(os.path.join(work, "out", "silver")).count() > 0
        finally:
            shutil.rmtree(work, ignore_errors=True)

    def oracle():
        from tests.oracle_harness import compare, duck_connection

        con = duck_connection(sf_dir)
        problems = compare(
            QUERIES["silver_trades"](spark, sf_dir), con, ORACLE_SQL["silver_trades"]
        )
        assert not problems, problems[0]

    check("tables", tables)
    check("views", views)
    check("gold", gold)
    check("latest", latest)
    check("streaming", streaming)
    check("oracle", oracle)

    print(f"{6 - len(failures)}/6 checks passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
