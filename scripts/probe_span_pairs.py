"""Profile span_dedup_pairs (round-21, r20 VERDICT item 7; guide §1):
split `repeated_span_pairs(documents, k=8, max_fp_docs=50)` — the
heaviest batch bench entry — into its cost components and A/B the one
plausible structural lever before touching the operator:

  fps_once      one span_fingerprints pass (tokenize + posexplode),
                noop-sunk — the map-side floor
  pairs_base    the operator as shipped: the fps subtree appears in
                THREE places (the max_fp_docs cap agg, and both sides
                of the self-join), and Catalyst does not CSE across
                joins, so tokenize+explode re-executes per instance
  pairs_ckpt    same operator with the (anti-joined) fps frame
                localCheckpoint'd before the self-join: one explode
                pass + one materialization, join reads the blocks

Also prints the skew picture for the pair join: top fingerprint doc
frequencies under the cap (a hot fp with f docs yields f(f-1)/2 rows
in ONE task's key group — the salting candidate the VERDICT names).

Usage: python scripts/probe_span_pairs.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from real_time_financial_market_data_pipeline_spark.operators.dedup import (  # noqa: E402
    repeated_span_pairs,
    span_fingerprints,
)
from real_time_financial_market_data_pipeline_spark.session import get_spark  # noqa: E402
from real_time_financial_market_data_pipeline_spark.tables import load_table  # noqa: E402


def timed(label: str, fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: best-of-{reps} {best:.3f}s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="probe_span_pairs")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm scan

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    fps = span_fingerprints(docs, k=8)
    timed("fps_once (noop)", lambda: noop(fps), reps)
    timed(
        "pairs_base (count)",
        lambda: repeated_span_pairs(docs, k=8, max_fp_docs=50).count(),
        reps,
    )

    def pairs_ckpt() -> int:
        from pyspark.sql import Window

        k = 8
        f = span_fingerprints(docs, k=k)
        common = (
            f.groupBy("fp")
            .agg(F.count_distinct("id").alias("_df"))
            .filter(F.col("_df") > 50)
            .select("fp")
        )
        kept = f.join(common, "fp", "left_anti").localCheckpoint(eager=True)
        l = kept.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "fp")
        r = kept.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "fp")
        cand = (
            l.join(r, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "pos_a", "pos_b")
            .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
        )
        w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
        runs = cand.withColumn("_island", F.col("pos_a") - F.row_number().over(w))
        return (
            runs.groupBy("id_a", "id_b", "diag", "_island")
            .agg(
                F.min("pos_a").alias("start_a"),
                F.min("pos_b").alias("start_b"),
                (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
            )
            .filter(F.col("span_tokens") >= k)
            .count()
        )

    timed("pairs_ckpt (count)", pairs_ckpt, reps)

    # result equivalence of the two forms at this SF
    base_n = repeated_span_pairs(docs, k=8, max_fp_docs=50).count()
    ckpt_n = pairs_ckpt()
    print(f"rows: base {base_n} ckpt {ckpt_n} equal={base_n == ckpt_n}")

    # skew picture under the cap
    freq = (
        span_fingerprints(docs, k=8)
        .groupBy("fp")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") <= 50)
    )
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, 0.999)").alias("p999"),
        F.avg("df").alias("mean_df"),
    ).first()
    print(
        f"capped fp doc-freq: n={stats['n_fps']} max={stats['max_df']} "
        f"p999={stats['p999']} mean={stats['mean_df']:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
