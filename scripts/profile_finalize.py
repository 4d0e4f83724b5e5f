"""Profile the stream-stopped FULL finalize at sf0.1 (round-11 VERDICT
task 1: curated_pipeline_finalize regressed 4.6 -> 8.7 s when the
generational protocol landed; target <= 6.5 s).

Reuses one drained corpus across runs (pass --keep / an existing
--work dir) so finalize iterations don't pay the ~40 s drain, and
times each phase of finalize() separately:

    recover | spans ckpt | frame write | spans write | docs write | spec

NOTE: this hand-mirrors finalize()'s FULL-cut phase sequence and must
be kept in sync with it — it deliberately omits the flat-layout reset,
the delta branch, and the generation fold (none run on the profiled
full-cut path with curated_max_gens at its default).  If finalize()
grows or reorders phases, update profile_finalize below.

Usage: python scripts/profile_finalize.py [--work DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_corpus(spark, sf_dir: str, work: str, n_batches: int = 10) -> None:
    from pyspark.sql import functions as F

    from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream
    from real_time_financial_market_data_pipeline_spark.streaming.curation import CuratedCorpusPipeline
    from real_time_financial_market_data_pipeline_spark.streaming.incremental import (
        build_benchmark_span_index,
    )
    from real_time_financial_market_data_pipeline_spark.tables import load_table

    feed, out = os.path.join(work, "feed"), os.path.join(work, "out")
    bench_dir = os.path.join(work, "bench_fp")
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
    pipe = CuratedCorpusPipeline(out_dir=out, benchmark_fp_dir=bench_dir, compact_every=4)
    t0 = time.perf_counter()
    q = pipe.start(read_doc_stream(spark, feed, max_files_per_trigger=1))
    assert q.awaitTermination(600)
    print(f"drain: {time.perf_counter() - t0:.2f}s")


def profile_finalize(spark, work: str) -> dict[str, float]:
    """One FULL finalize with per-phase timers (mirrors finalize())."""
    from real_time_financial_market_data_pipeline_spark.streaming.curation import CuratedCorpusPipeline
    from real_time_financial_market_data_pipeline_spark.streaming.incremental import corpus_view

    out = os.path.join(work, "out")
    bench_dir = os.path.join(work, "bench_fp")
    pipe = CuratedCorpusPipeline(out_dir=out, benchmark_fp_dir=bench_dir, compact_every=4)
    # fresh-cut conditions every run: drop prior curated state
    shutil.rmtree(pipe.curated_dir(), ignore_errors=True)
    shutil.rmtree(os.path.join(out, "finalize_state"), ignore_errors=True)

    t = {}
    t0 = time.perf_counter()
    pipe.job().recover(spark)
    t["recover"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    spans_now = pipe._qualifying_spans(spark).localCheckpoint(eager=True)
    t["spans_ckpt"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    frame = pipe.finalize_frame(spark, _spans=spans_now)
    frame.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(pipe.curated_dir(), "gen=0")
    )
    t["frame_write"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    spans_now.write.mode("overwrite").parquet(pipe._state_dir("spans", "gen=0"))
    t["spans_write"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    corpus_view(spark, out).select("doc_id").write.mode("overwrite").parquet(
        pipe._state_dir("docs", "gen=0")
    )
    t["docs_write"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pipe._write_finalize_spec()
    t["spec"] = time.perf_counter() - t0
    t["TOTAL"] = sum(t.values())
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/profile_finalize_work")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from real_time_financial_market_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile-finalize")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(os.path.join(args.work, "out", "corpus")):
        shutil.rmtree(args.work, ignore_errors=True)
        os.makedirs(args.work, exist_ok=True)
        build_corpus(spark, args.sf_dir, args.work)

    for i in range(args.runs):
        t = profile_finalize(spark, args.work)
        print(f"run {i}: " + "  ".join(f"{k}={v:.2f}" for k, v in t.items()))


if __name__ == "__main__":
    main()
