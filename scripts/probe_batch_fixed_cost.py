"""Quantify the micro-batch FIXED cost of the curated drain's dominant
serial segment (round-20 closing measurement; OPTIMIZATION_r20.md §6
item 1): replicate the repair+excise chain of
IncrementalDedupJob.process() on one bench-shaped 500-doc micro-batch
and split its per-batch cost into

  build — Python-side DataFrame/expression construction (py4j round
          trips + incremental analyzer runs),
  plan  — Catalyst analysis/optimization/physical planning of the
          final tree,
  exec  — execution (the chain's ~13 tiny shuffle stages + ~10
          broadcast builds at shuffle_partitions=8; the actual data
          work at sf0.1 is milliseconds).

Two A/B levers that looked promising and measured as WASHES (recorded
so they are not re-tried):
  --track-cols       maintain column lists in Python instead of asking
                     deep DataFrames for .columns (analyzer results are
                     cached per frame, so the deep accesses were never
                     the cost);
  --no-constraints   spark.sql.constraintPropagation.enabled=false
                     (saves ~40 ms of optimizer time per chain — noise
                     against the 0.85 s build floor).

Usage: python scripts/probe_batch_fixed_cost.py [sf_dir] [--track-cols]
       [--no-constraints]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from real_time_financial_market_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _internal_covered,
    _rebuild_excised,
    excise_contaminated_spans_from_index,
)
from real_time_financial_market_data_pipeline_spark.session import get_spark  # noqa: E402
from real_time_financial_market_data_pipeline_spark.streaming.incremental import (  # noqa: E402
    build_benchmark_span_index,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    track_cols = "--track-cols" in sys.argv
    spark = get_spark(app_name="probe_batch_fixed_cost")
    spark.sparkContext.setLogLevel("ERROR")
    if "--no-constraints" in sys.argv:
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    work = tempfile.mkdtemp(prefix="probe_fixed_")
    bench_dir = os.path.join(work, "bench_fp")
    feed = os.path.join(work, "feed")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        # limit() rather than doc_id<N predicates (round-20 ADVICE):
        # sparse/offset ids would silently skew the advertised batch
        # size; the actual row counts are printed so the "500-doc
        # batch" in committed docs is verifiable
        build_benchmark_span_index(docs.limit(5), bench_dir, k=13)
        docs.limit(500).coalesce(1).write.mode("overwrite").json(feed)
        # the per-batch shuffle sizing the job itself applies
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        # read the feed ONCE with an explicit schema (round-20 ADVICE):
        # schema inference launches a real scan job per read.json, which
        # contaminated the 'build' segment with executor-side file-scan
        # time — the real process() receives the micro-batch frame from
        # the stream and never pays a scan at build time.  The cached
        # schema makes build measure ONLY DataFrame/expression
        # construction, matching the attribution the docs quote.
        feed_schema = spark.read.json(feed).schema
        print(
            "batch rows:",
            spark.read.schema(feed_schema).json(feed).count(),
            "| bench index seed docs: 5 (limit)",
        )

        def chain():
            batch_df = spark.read.schema(feed_schema).json(feed).select("doc_id", "text")
            cols = batch_df.columns
            one_per_id = Window.partitionBy("doc_id").orderBy(
                F.col("text").asc_nulls_last()
            )
            batch_df = (
                batch_df.withColumn("_idrn", F.row_number().over(one_per_id))
                .filter(F.col("_idrn") == 1)
                .drop("_idrn")
            )
            covered = _internal_covered(
                batch_df.select("doc_id", "text"), "doc_id", "text", 8, 2
            )
            rewritten = _rebuild_excised(
                batch_df.select("doc_id", "text"), covered, "doc_id", "text"
            ).select(
                "doc_id",
                F.col("text").alias("_repaired"),
                F.col("excised_tokens").alias("internal_excised_tokens"),
            )
            cur = cols if track_cols else batch_df.columns
            batch_df = batch_df.join(rewritten, "doc_id").select(
                *[c for c in cur if c != "text"],
                F.when(F.col("internal_excised_tokens") > 0, F.col("_repaired"))
                .otherwise(F.col("text"))
                .alias("text"),
                "internal_excised_tokens",
            )
            cols = [c for c in cur if c != "text"] + [
                "text",
                "internal_excised_tokens",
            ]
            bench_fps = spark.read.parquet(bench_dir)
            rewritten2 = excise_contaminated_spans_from_index(
                batch_df.select("doc_id", "text"), bench_fps, k=13
            ).select(
                "doc_id",
                F.col("text").alias("_cleaned"),
                F.col("excised_tokens").alias("decontam_excised_tokens"),
            )
            cur = cols if track_cols else batch_df.columns
            batch_df = batch_df.join(rewritten2, "doc_id").select(
                *[c for c in cur if c != "text"],
                F.when(F.col("decontam_excised_tokens") > 0, F.col("_cleaned"))
                .otherwise(F.col("text"))
                .alias("text"),
                "decontam_excised_tokens",
            )
            return batch_df

        for rep in range(6):  # rep 0-1 are JVM/JIT warm-up; read 2-5
            t0 = time.perf_counter()
            out = chain()
            t1 = time.perf_counter()
            out._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            out.localCheckpoint(eager=True)
            t3 = time.perf_counter()
            print(
                f"rep{rep}: build {t1 - t0:.3f}s  plan {t2 - t1:.3f}s  "
                f"exec {t3 - t2:.3f}s  total {t3 - t0:.3f}s"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
