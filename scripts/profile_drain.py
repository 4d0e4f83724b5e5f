"""Per-stage breakdown of the curated-pipeline DRAIN (round-15 VERDICT
task 4): replicate bench.py::bench_curated_pipeline's streaming drain
with a StageTimer attached, so the 48 s / 10 batches bench line gets
the same per-adder visibility the finalize profile got in round 13
(which yielded the fused prune's −25%).

Usage: python scripts/profile_drain.py [sf_dir] [n_batches]
Prints one line per segment: total seconds, calls, mean per call, and
share of the summed segment time; plus the unattributed remainder
(Spark trigger overhead, checkpoint commits, planning).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_financial_market_data_pipeline_spark.session import get_spark  # noqa: E402
from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream  # noqa: E402
from real_time_financial_market_data_pipeline_spark.streaming.curation import (  # noqa: E402
    CuratedCorpusPipeline,
)
from real_time_financial_market_data_pipeline_spark.streaming.incremental import (  # noqa: E402
    StageTimer,
    build_benchmark_span_index,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # A/B lever: PROFILE_NO_PERSIST=1 neutralizes DataFrame.persist so
    # the drain runs WITHOUT the collapsed-input cache — same box, same
    # process recipe, only the persist differs
    if os.environ.get("PROFILE_NO_PERSIST"):
        from pyspark.sql import DataFrame

        DataFrame.persist = lambda self, *a, **k: self
        DataFrame.unpersist = lambda self, *a, **k: self
        print("[A/B] DataFrame.persist neutralized")
    spark = get_spark(app_name="profile_drain")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="profile_drain_")
    feed, out = os.path.join(work, "feed"), os.path.join(work, "out")
    bench_dir = os.path.join(work, "bench_fp")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        build_benchmark_span_index(docs.filter(F.col("doc_id") < 5), bench_dir, k=13)
        n_docs = docs.count()
        per = max(1, n_docs // n_batches)
        for i in range(n_batches):
            chunk = docs.filter(
                (F.col("doc_id") >= i * per)
                & (F.col("doc_id") < ((i + 1) * per if i < n_batches - 1 else n_docs))
            )
            chunk.coalesce(1).write.mode("append").json(feed)
            time.sleep(0.05)

        timer = StageTimer()
        pipe = CuratedCorpusPipeline(
            out_dir=out,
            benchmark_fp_dir=bench_dir,
            compact_every=4,
            stage_timer=timer,
        )
        t0 = time.perf_counter()
        q = pipe.start(read_doc_stream(spark, feed, max_files_per_trigger=1))
        if not q.awaitTermination(900):
            raise TimeoutError("drain did not finish in 900s")
        drain = time.perf_counter() - t0

        attributed = sum(timer.times.values())
        print(f"\ndrain total: {drain:.2f}s over {n_batches} data batches "
              f"({n_docs} docs, sf_dir={sf_dir})")
        print(f"{'segment':<28}{'total_s':>9}{'calls':>7}{'mean_s':>9}{'share':>8}")
        for name, total, calls in timer.report():
            print(f"{name:<28}{total:>9.2f}{calls:>7}{total / calls:>9.3f}"
                  f"{total / attributed:>8.1%}")
        print(f"{'(attributed)':<28}{attributed:>9.2f}")
        print(f"{'(unattributed overhead)':<28}{drain - attributed:>9.2f}"
              f"  <- trigger/commit/planning")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
