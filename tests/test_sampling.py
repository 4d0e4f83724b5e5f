"""Deterministic sampling invariants: partitioning-independence,
split disjointness/stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.sampling import deterministic_sample, train_val_test_split
from real_time_financial_market_data_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


def test_sample_is_partitioning_independent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.1).collect()
    }
    assert a == b  # membership is a pure function of the key
    n = docs.count()
    assert 0.05 * n < len(a) < 0.15 * n  # roughly the requested rate


def test_split_disjoint_and_stable_under_append(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full = train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in full.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # simulate incremental arrival: first half's assignments unchanged
    half = train_val_test_split(docs.filter(F.col("doc_id") < 250), "doc_id")
    full_map = {r["doc_id"]: r["split"] for r in full.collect()}
    for r in half.collect():
        assert full_map[r["doc_id"]] == r["split"]
