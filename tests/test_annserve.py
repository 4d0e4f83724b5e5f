"""Streaming ANN serving (streaming/annserve.py): per-micro-batch top-k
answers must equal the batch operator's output on the same queries —
one code path, zero batch/stream drift."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.similarity import lsh_bucketed_knn
from real_time_financial_market_data_pipeline_spark.streaming.annserve import AnnServeJob, results_view
from real_time_financial_market_data_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


def _write_query_feed(spark, dirpath, corpus, id_batches):
    os.makedirs(dirpath, exist_ok=True)
    base = time.time() - len(id_batches)
    for i, ids in enumerate(id_batches):
        rows = (
            corpus.filter(F.col("vec_id").isin(ids))
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .collect()
        )
        p = os.path.join(dirpath, f"queries_{i}.json")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps({"query_id": r["query_id"], "embedding": list(r["embedding"])}) + "\n")
        os.utime(p, (base + i, base + i))


def test_streaming_ann_matches_batch_operator(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings")
    feed, out = str(tmp_path / "feed"), str(tmp_path / "out")
    id_batches = [[0, 1, 2], [3, 4]]
    _write_query_feed(spark, feed, corpus, id_batches)

    queries = (
        spark.readStream.schema("query_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    job = AnnServeJob(out_dir=out, strategy="lsh")
    q = job.start(queries, corpus)
    assert q.awaitTermination(180)

    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in results_view(spark, out).collect()
    }
    all_q = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    expected = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in lsh_bucketed_knn(corpus, all_q, dim=64, k=10, n_planes=4, n_tables=8).collect()
    }
    assert got == expected


def test_streaming_ann_exact_strategy_dispatch(spark, tmp_path):
    """The exact-strategy dispatch answers with brute_force_knn output."""
    from real_time_financial_market_data_pipeline_spark.operators.similarity import brute_force_knn

    corpus = load_table(spark, SF_DIR, "embeddings")
    feed, out = str(tmp_path / "feed"), str(tmp_path / "out")
    _write_query_feed(spark, feed, corpus, [[0, 1]])
    queries = (
        spark.readStream.schema("query_id long, embedding array<double>")
        .json(feed)
    )
    q = AnnServeJob(out_dir=out, strategy="exact", k=5).start(queries, corpus)
    assert q.awaitTermination(120)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in results_view(spark, out).collect()
    }
    two_q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    expected = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in brute_force_knn(corpus, two_q, k=5).collect()
    }
    assert got == expected
