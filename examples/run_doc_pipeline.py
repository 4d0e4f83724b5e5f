"""Live demo: streaming training-data curation end-to-end.

    python examples/run_doc_pipeline.py [out_dir]

Feeds a small synthetic document corpus (with duplicates, junk, and
PII salted in) through DocStreamJob — text metrics → exact dedup →
quality gate → PII redaction → train/val/test split — then reports
what the curated table looks like, the way a training job would read it.
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
from real_time_financial_market_data_pipeline_spark.streaming.docpipeline import DocStreamJob

LOREM = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "where it finds a quiet place to rest for a while before returning"
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="doc_pipeline_")
    feed = os.path.join(out_dir, "feed")
    os.makedirs(feed, exist_ok=True)

    docs = []
    for i in range(40):
        text = f"{LOREM} variant {i} with some extra words number {i * 7}"
        docs.append({"doc_id": i, "text": text, "lang": "en", "source": "web"})
    docs += [
        {"doc_id": 100, "text": docs[0]["text"], "lang": "en", "source": "mirror"},  # dup
        {"doc_id": 101, "text": "$$$ !!! ???", "lang": "en", "source": "spam"},      # junk
        {"doc_id": 102, "text": LOREM + " contact me at alice@example.com today", "lang": "en", "source": "forum"},
    ]
    with open(os.path.join(feed, "batch0.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    spark = get_spark(app_name="doc_pipeline_demo")
    job = DocStreamJob(out_dir=os.path.join(out_dir, "tables"))
    mgr = job.start(read_doc_stream(spark, feed))
    mgr.await_all(timeout_s=300)

    raw = spark.read.parquet(os.path.join(out_dir, "tables", "raw"))
    curated = spark.read.parquet(os.path.join(out_dir, "tables", "curated"))
    print(f"\nraw docs:      {raw.count()}")
    print(f"curated docs:  {curated.count()} (dups collapsed, junk gated)")
    print("\nsplit sizes:")
    curated.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    ).orderBy("split").show()
    print("redaction check (doc 102):")
    curated.filter(F.col("doc_id") == 102).select("doc_id", "text").show(truncate=60)

    # substring-span dedup treatment (round 7): every doc shares the
    # LOREM boilerplate prefix — find it corpus-wide (no pair
    # enumeration) and excise all but the canonical occurrence, the
    # Lee et al. 2022 "train on each span once" rule
    from real_time_financial_market_data_pipeline_spark.operators.dedup import common_spans, excise_common_spans

    spans = common_spans(curated, k=8, min_docs=5)
    excised = excise_common_spans(curated.select("doc_id", "text"), spans, k=8)
    print("span excision (shared boilerplate collapsed to one occurrence):")
    excised.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("excised_tokens").alias("tokens_excised"),
        F.sum(F.when(F.col("excised_tokens") > 0, 1).otherwise(0)).alias("docs_touched"),
    ).show()
    excised.orderBy("doc_id").select("doc_id", "text").show(3, truncate=60)

    # round-8 variants of the treatment, side by side:
    #  - merged_common_spans answers "what IS the shared chrome" as
    #    whole blocks instead of k-window fragments;
    #  - split excision cuts at the boundaries (no spliced k-grams),
    #    fanning docs out to chunk rows;
    #  - the within-doc repair keeps the FIRST copy of any text a
    #    document repeats internally.
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        excise_internal_repeats,
        merged_common_spans,
        split_excise_common_spans,
    )

    print("merged maximal shared blocks:")
    merged_common_spans(curated, k=8, min_docs=5).orderBy(
        F.desc("span_tokens")
    ).select("rep_id", "span_start", "span_tokens", "n_windows", "span_text").show(
        3, truncate=60
    )
    print("splice-safe split excision (chunk rows):")
    split_excise_common_spans(
        curated.select("doc_id", "text"), spans, k=8
    ).orderBy("doc_id", "chunk_idx").show(5, truncate=60)
    print("within-doc keep-first repair:")
    excise_internal_repeats(curated.select("doc_id", "text"), k=8).agg(
        F.sum("excised_tokens").alias("tokens_excised"),
        F.sum(F.when(F.col("excised_tokens") > 0, 1).otherwise(0)).alias("docs_repaired"),
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
