"""Curated-serving publish cost probe (round-12 VERDICT task 3):
measure FULL republish vs DELTA republish of the doc_id-bucketed
serving table after a delta cut, and certify both against
curated_view.

Builds a corpus from the documents table (replicated like
curation_scale.py but without pathologies — publish cost is the
variable here), finalizes, publishes FULL, ingests a small late batch,
delta-finalizes, then times:

  - publish_bucketed(mode="full")   — re-read + re-shuffle + rewrite
    of every bucket
  - publish_bucketed(mode="delta")  — rebuild ONLY the buckets holding
    redo docs; every other bucket file hardlinked from the previous
    snapshot (zero read/shuffle/write)

    python scripts/publish_scale.py [base_sf_dir] [out_json] \
        [n_replicas] [n_buckets] [late_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.session import get_spark
from real_time_financial_market_data_pipeline_spark.sources.streaming import read_doc_stream
from real_time_financial_market_data_pipeline_spark.streaming.curation import (
    CuratedCorpusPipeline,
    curated_view,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table

BOILER = (
    "this material is provided as is without warranty of any kind "
    "express or implied"
)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    n_replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    late_docs = int(sys.argv[5]) if len(sys.argv) > 5 else 50

    spark = get_spark(app_name="publish_scale")
    work = tempfile.mkdtemp(prefix="publish_scale_")
    feed, out = os.path.join(work, "feed"), os.path.join(work, "out")
    table = "publish_scale_serving"
    try:
        docs = load_table(spark, base, "documents").select("doc_id", "text")
        stride = 10_000_000
        parts = []
        for i in range(n_replicas):
            salted = F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(
                    F.lit(f"u{i}x"),
                    F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                    F.lit("$1"),
                ),
            )
            carrier = F.pmod(F.xxhash64(F.col("doc_id") + F.lit(i)), F.lit(5)) == 0
            text = F.when(carrier, F.concat_ws(" ", salted, F.lit(BOILER))).otherwise(
                salted
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                    text.alias("text"),
                )
            )
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        os.makedirs(feed, exist_ok=True)
        corpus.coalesce(4).write.mode("append").json(feed)

        pipe = CuratedCorpusPipeline(out_dir=out, span_k=8, span_min_docs=5)
        q = pipe.start(read_doc_stream(spark, feed).select("doc_id", "text"))
        assert q.awaitTermination(1800)
        pipe.finalize(spark)

        t0 = time.perf_counter()
        pipe.publish_bucketed(spark, table=table, n_buckets=n_buckets)
        first_publish_s = round(time.perf_counter() - t0, 3)

        # small late batch -> delta cut -> the redo set is tiny
        time.sleep(0.1)
        late = [
            {
                "doc_id": (n_replicas + 1) * stride + j,
                "text": f"late arrival number {j} brings fresh unique reporting "
                + BOILER,
            }
            for j in range(late_docs)
        ]
        with open(os.path.join(feed, "late_0.json"), "w") as fh:
            for rec in late:
                fh.write(json.dumps(rec) + "\n")
        q = pipe.start(read_doc_stream(spark, feed).select("doc_id", "text"))
        assert q.awaitTermination(1800)
        pipe.finalize(spark)  # auto -> delta

        t0 = time.perf_counter()
        pipe.publish_bucketed(spark, table=table, n_buckets=n_buckets, mode="delta")
        delta_publish_s = round(time.perf_counter() - t0, 3)

        key_cols = ["doc_id", "chunk_idx"]
        served = spark.table(table)
        view = curated_view(spark, out)
        diff = (
            served.exceptAll(view).count() + view.exceptAll(served).count()
        )

        # price the alternative: a full republish of the same state
        t0 = time.perf_counter()
        pipe.publish_bucketed(spark, table=table, n_buckets=n_buckets, mode="full")
        full_publish_s = round(time.perf_counter() - t0, 3)

        summary = {
            "corpus_docs": corpus.count(),
            "late_docs": late_docs,
            "n_buckets": n_buckets,
            "first_publish_s": first_publish_s,
            "delta_publish_s": delta_publish_s,
            "full_publish_s": full_publish_s,
            "delta_over_full": round(delta_publish_s / full_publish_s, 3),
            "served_vs_view_diff_rows": diff,
        }
        print(json.dumps(summary), flush=True)
        assert diff == 0, "served table != curated_view after delta publish"
        if out_json:
            with open(out_json, "w") as f:
                json.dump(summary, f, indent=1)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
