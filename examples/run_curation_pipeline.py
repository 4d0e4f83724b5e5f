"""Live demo: the COMPOSED curated-corpus pipeline (round 9) — the one
flow a training-data team would actually run.

    python examples/run_curation_pipeline.py [out_dir]

Where examples/run_doc_pipeline.py demos the curation operators piece
by piece, this runs `streaming.curation.CuratedCorpusPipeline`
end-to-end over a synthetic feed with every pathology salted in:

  - an exact duplicate and a near duplicate        (dedup at the index)
  - a doc quoting a benchmark question verbatim    (surgical decontam)
  - two docs sharing a boilerplate footer          (cross-doc excision)
  - a doc repeating itself internally              (keep-first repair)
  - a junk doc                                     (quality gate)
  - a PII-laden doc                                (redaction)

and then prints the curated chunk table the way a training job would
read it, plus the provenance columns that make every removal auditable.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.session import get_spark
from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream
from real_time_financial_market_data_pipeline_spark.streaming.curation import (
    CuratedCorpusPipeline,
    curated_view,
)
from real_time_financial_market_data_pipeline_spark.streaming.incremental import (
    build_benchmark_span_index,
    corpus_view,
)

QUESTION = (
    "which ancient city stood at the mouth of the river crossing "
    "seven hills beneath the old citadel walls"
)
BOILER = "all rights reserved by the example company"
STORY = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "where it finds a quiet place to rest for a while before returning"
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="curation_")
    feed = os.path.join(out_dir, "feed")
    os.makedirs(feed, exist_ok=True)

    spark = get_spark(app_name="curation_demo")

    bench_dir = os.path.join(out_dir, "benchmark_fp")
    bench = spark.createDataFrame(
        [(0, QUESTION + " choose the best answer")], "doc_id long, text string"
    )
    n_fp = build_benchmark_span_index(bench, bench_dir, k=13)
    print(f"benchmark index: {n_fp} fingerprints (k=13)")

    docs = [
        {"doc_id": 1, "text": STORY + " first telling tonight"},
        {"doc_id": 2, "text": STORY + " first telling tonight"},        # exact dup
        {"doc_id": 3, "text": STORY.replace("quiet", "silent") + " first telling tonight"},  # near dup
        {"doc_id": 4, "text": " ".join(f"page{i} item{i * 3} of the run" for i in range(10))
                              + " " + QUESTION + " "
                              + " ".join(f"tail{i} coda{i * 7} and so" for i in range(10))},  # contaminated
        {"doc_id": 5, "text": "the annual report opens with strong results before " + BOILER
                              + " and then details the quarter by segment"},
        {"doc_id": 6, "text": "an entirely different newsletter closes its final page with "
                              + BOILER + " printed beneath the signature block today"},
        {"doc_id": 7, "text": "chorus alpha beta gamma alpha beta gamma verse with many "
                              "more unique following words to keep the quality gate happy"},
        {"doc_id": 8, "text": "$$$ !!! ???"},                           # junk
        {"doc_id": 9, "text": "for access to the archived datasets please contact me at "
                              "alice@example.com and mention the spring release files"},
    ]
    for i, d in enumerate(docs):
        with open(os.path.join(feed, f"batch{i // 3}.json"), "a") as f:
            f.write(json.dumps(d) + "\n")
    # distinct mod-times: the file source drains oldest-first, so
    # originals arrive BEFORE their duplicates (the dedup direction
    # this demo narrates)
    import time as _time

    base = _time.time() - 10
    for b in range(3):
        p = os.path.join(feed, f"batch{b}.json")
        os.utime(p, (base + b, base + b))

    pipe = CuratedCorpusPipeline(
        out_dir=os.path.join(out_dir, "tables"),
        benchmark_fp_dir=bench_dir,
        decontam_k=13,
        internal_k=3,
        span_k=6,
        span_min_docs=2,
        compact_every=4,
    )
    q = pipe.start(read_doc_stream(spark, feed, max_files_per_trigger=1))
    q.awaitTermination(300)

    corpus = corpus_view(spark, pipe.out_dir)
    print(f"\ncorpus after ingest: {corpus.count()} docs "
          "(dups collapsed, benchmark text excised at the door)")
    corpus.orderBy("doc_id").select(
        "doc_id", "internal_excised_tokens", "decontam_excised_tokens"
    ).show()

    pipe.finalize(spark)
    cur = curated_view(spark, pipe.out_dir)
    print("curated chunk table (what a training job reads):")
    cur.orderBy("doc_id", "chunk_idx").select(
        "doc_id", "chunk_idx", "split", "chunk_tokens", "excised_tokens", "text"
    ).show(truncate=56)
    print("split sizes:")
    cur.groupBy("split").agg(
        F.count(F.lit(1)).alias("chunks"), F.sum("n_tokens").alias("tokens")
    ).orderBy("split").show()
    print("redaction check (doc 9):")
    cur.filter(F.col("doc_id") == 9).select("text").show(truncate=80)

    # --- incremental cut (round 10): a late batch arrives whose doc
    # shares doc 5/6's boilerplate footer — finalize(auto) runs in
    # DELTA mode, re-curating only the fresh doc and the footer
    # holders whose span state changed, and merges generationally
    late = {"doc_id": 10, "text": "a third unrelated mailing also ends with "
                                  + BOILER + " right above the postal permit line"}
    with open(os.path.join(feed, "batch_late.json"), "w") as f:
        f.write(json.dumps(late) + "\n")
    q = pipe.start(read_doc_stream(spark, feed, max_files_per_trigger=1))
    q.awaitTermination(300)
    pipe.finalize(spark)  # auto -> delta
    gens = pipe._committed_gens()
    redo = spark.read.parquet(
        os.path.join(pipe.out_dir, "finalize_state", "docs", f"gen={gens[-1]}")
    )
    print(f"\ndelta cut: generation {gens[-1]} re-curated only docs "
          f"{sorted(r['doc_id'] for r in redo.collect())} "
          "(everything else served from the prior generation)")
    curated_view(spark, pipe.out_dir).orderBy("doc_id", "chunk_idx").select(
        "doc_id", "chunk_idx", "split", "chunk_tokens", "excised_tokens", "text"
    ).show(truncate=56)
    spark.stop()


if __name__ == "__main__":
    main()
