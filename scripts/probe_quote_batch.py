"""Per-batch segment split of QuoteEnrichJob.process (round-21, guide
§1: measure before changing): replicate bench_quote_enrich's feeds and
drain the SAME stream-stream interval join through a foreachBatch that
mirrors the job's process() but times each segment —

  persist_empty  persist() + isEmpty() (partial materialization)
  enriched_write the enriched layer write (completes materialization of
                 the stateful join into the cache)
  best_write     best_quote_per_trade agg + write (reads the cache)

The question under test (r20 VERDICT item 4): is the per-batch median
dominated by the join execution (state-store work — engine-serialized,
not overlappable) or by the two sink writes (independent, poolable like
the incremental job's index writes)?

Usage: python scripts/probe_quote_batch.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_financial_market_data_pipeline_spark.session import get_spark  # noqa: E402
from real_time_financial_market_data_pipeline_spark.sources.streaming import (  # noqa: E402
    read_quote_stream,
    read_trade_stream,
)
from real_time_financial_market_data_pipeline_spark.streaming.joins import (  # noqa: E402
    best_quote_per_trade,
    trades_with_quotes,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe_quote_batch")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe_quote_")
    tfeed, qfeed = os.path.join(work, "trades"), os.path.join(work, "quotes")
    out = os.path.join(work, "out")
    segs: list[dict] = []
    try:
        ev = load_table(spark, sf_dir, "events")
        trades_wire = ev.filter(F.col("event_id") % 2 == 1).select(
            F.col("event_type").alias("s"),
            F.col("value").alias("p"),
            F.get_json_object("props", "$.k").cast("long").alias("v"),
            F.unix_millis("ts").alias("t"),
        )
        quotes_wire = ev.filter(F.col("event_id") % 2 == 0).select(
            F.col("event_type").alias("symbol"),
            (F.col("value") - 0.05).alias("bid_price"),
            F.lit(100).alias("bid_size"),
            (F.col("value") + 0.05).alias("ask_price"),
            F.lit(100).alias("ask_size"),
            F.unix_millis("ts").alias("timestamp"),
        )
        cuts = trades_wire.approxQuantile("t", [i / 5 for i in range(1, 5)], 0.001)
        for wire, feed, tcol in [(trades_wire, tfeed, "t"), (quotes_wire, qfeed, "timestamp")]:
            lo = None
            for hi in [*cuts, None]:
                chunk = wire
                if lo is not None:
                    chunk = chunk.filter(F.col(tcol) >= lo)
                if hi is not None:
                    chunk = chunk.filter(F.col(tcol) < hi)
                chunk.coalesce(1).write.mode("append").json(feed)
                time.sleep(0.05)
                lo = hi

        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        joined = trades_with_quotes(
            read_trade_stream(spark, tfeed, max_files_per_trigger=1),
            read_quote_stream(spark, qfeed, max_files_per_trigger=1),
            watermark="10 minutes",
            max_quote_age="5 minutes",
        )

        enriched_dir = os.path.join(out, "enriched")
        best_dir = os.path.join(out, "best_quote")

        def process(batch_df, batch_id):
            t0 = time.perf_counter()
            batch_df.persist()
            try:
                empty = batch_df.isEmpty()
                t1 = time.perf_counter()
                if empty:
                    segs.append({"batch": batch_id, "persist_empty": t1 - t0, "empty": True})
                    return
                batch_df.write.mode("overwrite").parquet(
                    os.path.join(enriched_dir, f"batch_id={batch_id}")
                )
                t2 = time.perf_counter()
                best_quote_per_trade(batch_df).write.mode("overwrite").parquet(
                    os.path.join(best_dir, f"batch_id={batch_id}")
                )
                t3 = time.perf_counter()
                segs.append(
                    {
                        "batch": batch_id,
                        "persist_empty": round(t1 - t0, 3),
                        "enriched_write": round(t2 - t1, 3),
                        "best_write": round(t3 - t2, 3),
                    }
                )
            finally:
                batch_df.unpersist()

        t0 = time.perf_counter()
        q = (
            joined.writeStream.foreachBatch(process)
            .outputMode("append")
            .queryName("probe_quotes")
            .option("checkpointLocation", os.path.join(out, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        total = time.perf_counter() - t0
        spark.conf.set("spark.sql.shuffle.partitions", old)
        print(f"drain total {total:.3f}s over {len(segs)} batches")
        for s in segs:
            print(s)
        keys = ("persist_empty", "enriched_write", "best_write")
        sums = {k: round(sum(s.get(k, 0) for s in segs), 3) for k in keys}
        print("segment sums:", sums)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
