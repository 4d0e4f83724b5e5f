"""Measured scaling evidence for the substring-span dedup family
(round 7): run repeated_span_pairs (capped) and common_spans over the
REAL documents corpora at sf0.001 / sf0.01 / sf0.1 — three genuinely
different corpora, 10x apart — and report rows, output sizes, wall
time, and the t ~ rows^alpha scaling exponent over the largest span.

Replicating one corpus k-fold would be the WRONG probe here: replicas
share almost every window with their source, so pair output grows
quadratically in the replication factor by construction — genuine
repetition, not operator cost.  Distinct corpora isolate the
operator's own scaling.

Usage: python scripts/span_scale_probe.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_financial_market_data_pipeline_spark.operators.dedup import (
    common_spans,
    excise_internal_repeats,
    merged_common_spans,
    repeated_span_pairs,
    split_excise_common_spans,
)
from real_time_financial_market_data_pipeline_spark.session import get_spark
from real_time_financial_market_data_pipeline_spark.tables import load_table


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(app_name="span_scale_probe")
    results = []
    try:
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            docs = load_table(spark, f"/root/testdata/{sf}", "documents")
            n_docs = docs.count()

            t0 = time.perf_counter()
            n_pairs = repeated_span_pairs(docs, k=8, max_fp_docs=50).count()
            pairs_s = round(time.perf_counter() - t0, 3)

            t0 = time.perf_counter()
            n_common = common_spans(docs, k=8, min_docs=2).count()
            common_s = round(time.perf_counter() - t0, 3)

            # round-8 treatments over the same corpus
            t0 = time.perf_counter()
            n_merged = merged_common_spans(docs, k=8, min_docs=2).count()
            merged_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n_chunks = split_excise_common_spans(
                docs.select("doc_id", "text"),
                common_spans(docs, k=8, min_docs=2),
                k=8,
            ).count()
            split_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            excise_internal_repeats(docs.select("doc_id", "text"), k=8).count()
            internal_s = round(time.perf_counter() - t0, 3)

            rec = {
                "sf": sf,
                "docs": n_docs,
                "span_pairs": n_pairs,
                "pairs_s": pairs_s,
                "common_rows": n_common,
                "common_s": common_s,
                "merged_rows": n_merged,
                "merged_s": merged_s,
                "split_chunks": n_chunks,
                "split_s": split_s,
                "internal_excise_s": internal_s,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        # ---- worst-case-repetition leg: replicate sf0.01 docs K-fold
        # (distinct ids).  Every window is now in >= K docs — the regime
        # where pair enumeration explodes O(K²) per window BY DESIGN of
        # the data.  The designed behavior: the frequency cap excludes
        # such windows from pair generation (flat cost), and the
        # aggregate form scales ~linearly in corpus size no matter how
        # common the spans are.
        from pyspark.sql import functions as F

        base = load_table(spark, "/root/testdata/sf0.01", "documents")
        for reps in (4, 16):
            repl = base
            for i in range(1, reps):
                repl = repl.unionByName(
                    base.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
                    )
                )
            repl = repl.localCheckpoint(eager=True)
            n_docs = repl.count()

            t0 = time.perf_counter()
            n_pairs = repeated_span_pairs(repl, k=8, max_fp_docs=3).count()
            capped_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n_common = common_spans(repl, k=8, min_docs=2).count()
            common_s = round(time.perf_counter() - t0, 3)
            # merged form under the same adversarial repetition: must
            # stay aggregate-shaped (≈ common_s + the run-merge window)
            t0 = time.perf_counter()
            n_merged = merged_common_spans(repl, k=8, min_docs=2).count()
            merged_s = round(time.perf_counter() - t0, 3)
            rec = {
                "variant": f"replicated_{reps}x_worst_case_repetition",
                "docs": n_docs,
                "capped_pairs": n_pairs,
                "capped_pairs_s": capped_s,
                "common_rows": n_common,
                "common_s": common_s,
                "merged_rows": n_merged,
                "merged_s": merged_s,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        r_small, r_big = results[1], results[2]  # 10x span, past fixed overhead
        # timings are rounded to 3 decimals, so a sub-ms stage reads 0.0
        # — clamp before log() or the exponent crashes after all the
        # measurements already succeeded
        _eps = lambda t: max(t, 1e-3)
        rec = {
            "variant": "scaling_exponent_sf0.01_sf0.1",
            "pairs_alpha": round(
                math.log(_eps(r_big["pairs_s"]) / _eps(r_small["pairs_s"]))
                / math.log(r_big["docs"] / r_small["docs"]),
                3,
            ),
            "common_alpha": round(
                math.log(_eps(r_big["common_s"]) / _eps(r_small["common_s"]))
                / math.log(r_big["docs"] / r_small["docs"]),
                3,
            ),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    finally:
        spark.stop()
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
