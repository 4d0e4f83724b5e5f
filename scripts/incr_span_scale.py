"""Incremental span-index flat-cost evidence (round-8 VERDICT task 3):
the claim behind `IncrementalDedupJob(span_index=True)` is that
maintaining the corpus's span-fp frequency table costs O(batch) per
micro-batch — one map-side fingerprint pass + one hash-agg — no matter
how much history has accumulated, and that `common_spans_view` answers
from the index without re-fingerprinting that history.

    python scripts/incr_span_scale.py [base_sf_dir] [out_json] \
        [n_replicas] [n_batches] [legs] [compact_every]

Defaults (6 replicas / 18 batches / 3 legs / stream-stopped compact
between legs) reproduce the round-8 evidence.  The round-9 AGING run
(VERDICT task 3) is `... 12 54 6 9`: 12 replicas drained over 54
batches in 6 legs with the INLINE compact_every=9 cadence instead of
the leg-stopped compact() — the operational policy under test — and
the view latency sampled at every leg boundary as the index triples
past its round-8 size.

Corpus generator (deterministic, no randomness): N_REPLICAS copies of
the documents table, every token salted per replica so the docs are
unique (nothing deduped — the corpus and index GROW monotonically), and
a fixed 14-token boilerplate block appended to every doc whose
pmod(xxhash64(doc_id), 5) == 0, so ~20% of the corpus carries genuine
common spans for the view to find.

The stream drains in LEGS legs with `.compact()` between them (folding
the span partials with the sum/min re-reduce).  Measured:
  - per-batch drain durations: flat (last5/first5 <= ~1.2) even though
    the on-disk index is several times larger by the end;
  - `common_spans_view` latency after each leg: grows with DISTINCT
    fingerprints (the real data size), not with batch count —
    compaction keeps the dir listing O(1);
  - exactness: after the final leg the view is row-identical to a full
    `common_spans` recompute over the corpus.
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
from real_time_financial_market_data_pipeline_spark.streaming.incremental import (
    IncrementalDedupJob,
    common_spans_view,
    corpus_view,
)
from real_time_financial_market_data_pipeline_spark.tables import load_table

N_REPLICAS = 6  # overridable via argv
ID_STRIDE = 10_000_000
N_BATCHES = 18  # overridable via argv
LEGS = 3  # overridable via argv
SPAN_K = 8
BOILER = (
    "this material is provided as is without warranty of any kind "
    "express or implied"
)


def make_corpus(spark, base_dir: str):
    docs = load_table(spark, base_dir, "documents").select("doc_id", "text")
    n_base = docs.count()
    parts = []
    for i in range(N_REPLICAS):
        salted = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(
                F.lit(f"s{i}x"),
                F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                F.lit("$1"),
            ),
        )
        carrier = F.pmod(F.xxhash64(F.col("doc_id") + F.lit(i * ID_STRIDE)), F.lit(5)) == 0
        text = F.when(carrier, F.concat_ws(" ", salted, F.lit(BOILER))).otherwise(salted)
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                text.alias("text"),
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    return corpus.persist(), n_base


def write_batch_files(corpus, n_base: int, feed: str, batches: range) -> None:
    n = n_base * N_REPLICAS
    per = (n + N_BATCHES - 1) // N_BATCHES
    rank = (F.col("doc_id") / ID_STRIDE).cast("long") * n_base + (
        F.col("doc_id") % ID_STRIDE
    )
    for b in batches:
        chunk = corpus.filter((rank >= b * per) & (rank < (b + 1) * per))
        chunk.coalesce(1).write.mode("append").json(feed)
        time.sleep(0.05)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    global N_REPLICAS, N_BATCHES, LEGS
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    if len(sys.argv) > 3:
        N_REPLICAS = int(sys.argv[3])
    if len(sys.argv) > 4:
        N_BATCHES = int(sys.argv[4])
    if len(sys.argv) > 5:
        LEGS = int(sys.argv[5])
    compact_every = int(sys.argv[6]) if len(sys.argv) > 6 else None
    spark = get_spark(app_name="incr_span_scale")
    work = tempfile.mkdtemp(prefix="incr_span_")
    feed, out = os.path.join(work, "feed"), os.path.join(work, "out")
    try:
        corpus, n_base = make_corpus(spark, base)
        n_in = n_base * N_REPLICAS
        print(
            json.dumps(
                {
                    "input_docs": n_in,
                    "batches": N_BATCHES,
                    "compact_every": compact_every,
                }
            ),
            flush=True,
        )

        # near_dup off so the timings isolate exact dedup + span index
        job = IncrementalDedupJob(
            out_dir=out,
            near_dup=False,
            span_index=True,
            span_k=SPAN_K,
            compact_every=compact_every,
        )
        durs: list[float] = []
        legs: list[dict] = []
        per_leg = N_BATCHES // LEGS
        t_all = time.perf_counter()
        for leg in range(LEGS):
            write_batch_files(
                corpus, n_base, feed, range(leg * per_leg, (leg + 1) * per_leg)
            )
            q = job.start(
                read_doc_stream(spark, feed, max_files_per_trigger=1)
                .select("doc_id", "text")
            )
            assert q.awaitTermination(900), "leg did not drain"
            leg_durs = [
                p["batchDuration"] / 1000.0
                for p in q.recentProgress
                if p.get("numInputRows", 0) > 0
            ]
            durs.extend(leg_durs)
            # compact_every=None reproduces the round-8 protocol
            # (stream-stopped fold per leg); with an inline cadence the
            # job already compacts itself mid-drain — measure what the
            # POLICY leaves behind instead of folding here
            folded = job.compact(spark) if compact_every is None else 0
            import re as _re

            span_dirs = len(
                [
                    d
                    for d in os.listdir(os.path.join(out, "index_spanfps"))
                    if _re.fullmatch(r"batch_id=\d+", d)
                ]
            )
            t0 = time.perf_counter()
            n_common = common_spans_view(
                spark, out, min_docs=2, k=SPAN_K
            ).count()
            view_s = round(time.perf_counter() - t0, 3)
            legs.append(
                {
                    "leg": leg,
                    "batches": len(leg_durs),
                    "folded_dirs": folded,
                    "span_dirs": span_dirs,
                    "index_spanfps_mb": round(
                        dir_bytes(os.path.join(out, "index_spanfps")) / 1e6, 2
                    ),
                    "corpus_docs": corpus_view(spark, out).count(),
                    "common_spans_view_s": view_s,
                    "common_span_fps": n_common,
                }
            )
            print(json.dumps(legs[-1]), flush=True)

        # exactness: view ≡ full recompute over the final corpus
        from real_time_financial_market_data_pipeline_spark.operators.dedup import common_spans

        t0 = time.perf_counter()
        view_rows = sorted(
            tuple(r)
            for r in common_spans_view(spark, out, min_docs=2, k=SPAN_K).collect()
        )
        view_collect_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        recompute_rows = sorted(
            tuple(r)
            for r in common_spans(
                corpus_view(spark, out).select("doc_id", "text"),
                k=SPAN_K,
                min_docs=2,
            ).collect()
        )
        recompute_s = round(time.perf_counter() - t0, 3)
        assert view_rows == recompute_rows, "view != batch recompute"

        total = round(time.perf_counter() - t_all, 2)
        srt = sorted(durs)
        _eps = lambda t: max(t, 1e-3)
        summary = {
            "total_drain_s": total,
            "n_batches": len(durs),
            "first_batch_s": round(durs[0], 3),
            "median_batch_s": round(srt[len(srt) // 2], 3),
            "last_batch_s": round(durs[-1], 3),
            "max_batch_s": round(srt[-1], 3),
            "first5_mean_s": round(sum(durs[:5]) / 5, 3),
            "last5_mean_s": round(sum(durs[-5:]) / 5, 3),
            "last5_over_first5": round(
                _eps(sum(durs[-5:]) / 5) / _eps(sum(durs[:5]) / 5), 3
            ),
            "per_batch_s": [round(d, 3) for d in durs],
            "legs": legs,
            "view_matches_recompute": True,
            "view_collect_s": view_collect_s,
            "full_recompute_s": recompute_s,
            "final_corpus_docs": legs[-1]["corpus_docs"],
            "input_docs": n_in,
        }
        print(json.dumps(summary), flush=True)
        if out_json:
            with open(out_json, "w") as f:
                json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
