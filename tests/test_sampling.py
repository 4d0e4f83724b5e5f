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


def test_stratified_sample_rates_and_nesting(spark):
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "code").when(F.col("id") % 3 == 1, "web").otherwise("forum").alias("src"),
    )
    from real_time_financial_market_data_pipeline_spark.operators.sampling import stratified_sample

    out = stratified_sample(docs, "doc_id", "src", {"code": 1.0, "web": 0.2})
    by_src = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("forum") is None                  # default_frac=0 drops
    assert by_src["code"] == 1334                       # 100% of code kept
    assert abs(by_src["web"] / 1333 - 0.2) < 0.06       # ~20% of web

    # determinism under repartition + monotone nesting of rates
    again = stratified_sample(docs.repartition(13), "doc_id", "src", {"code": 1.0, "web": 0.2})
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}
    small = {r["doc_id"] for r in stratified_sample(docs, "doc_id", "src", {"web": 0.1}).collect()}
    large = {r["doc_id"] for r in stratified_sample(docs, "doc_id", "src", {"web": 0.3}).collect()}
    assert small <= large


def test_token_budget_sample_exact_and_scalable_phases(spark):
    from real_time_financial_market_data_pipeline_spark.operators.sampling import token_budget_sample

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n_tokens")
    )
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]

    budget = 5000
    kept = token_budget_sample(docs, "doc_id", "n_tokens", budget, n_buckets=16)
    rows = kept.collect()
    kept_tokens = sum(r["n_tokens"] for r in rows)
    assert kept_tokens >= budget  # budget met, not undershot

    # exactness: equals a Python reimplementation of the operator's own
    # deterministic order — (bucket, md5(key), key) — cumsum to budget
    import hashlib

    def order_key(did):
        h = hashlib.md5(str(did).encode()).hexdigest()
        return (int(h[:8], 16) % 16, h, did)

    ordered = sorted(
        [(r["doc_id"], r["n_tokens"]) for r in docs.collect()],
        key=lambda x: order_key(x[0]),
    )
    want, acc = set(), 0
    for did, nt in ordered:
        if acc >= budget:
            break
        want.add(did)
        acc += nt
    assert {r["doc_id"] for r in rows} == want
    assert kept_tokens == acc  # minimal overshoot: stop at first crossing
    # determinism under repartition (same ids exactly)
    again = token_budget_sample(docs.repartition(7), "doc_id", "n_tokens", budget, n_buckets=16)
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again.collect()}

    # budget >= corpus keeps everything
    all_kept = token_budget_sample(docs, "doc_id", "n_tokens", total + 1, n_buckets=16)
    assert all_kept.count() == 500


def test_token_budget_sample_null_tokens(spark):
    """NULL token counts are treated as 0 — no TypeError from a bucket
    whose F.sum is NULL, and NULL-token docs are kept when their hash
    position falls inside the budget."""
    from real_time_financial_market_data_pipeline_spark.operators.sampling import token_budget_sample

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(F.col("id") % 50 + 10).alias("n_tokens"),
    )
    kept = token_budget_sample(docs, "doc_id", "n_tokens", 1500, n_buckets=8)
    rows = kept.collect()
    assert sum(r["n_tokens"] or 0 for r in rows) >= 1500
    assert any(r["n_tokens"] is None for r in rows)  # NULL docs not silently excluded
    # all-NULL corpus: zero budget spend, everything below boundary kept,
    # and no crash from totals.get(b) being None
    nulls = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("long").alias("n_tokens")
    )
    assert token_budget_sample(nulls, "doc_id", "n_tokens", 100, n_buckets=8).count() == 40


def test_stratified_threshold_rounding(spark):
    """frac * n_buckets float artifacts must not truncate: 0.29 * 10000
    = 2899.9999... is threshold 2900, not 2899."""
    from real_time_financial_market_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        stratified_sample,
    )

    docs = spark.range(30000).select(F.col("id").alias("doc_id"), F.lit("web").alias("src"))
    out = stratified_sample(docs, "doc_id", "src", {"web": 0.29}, n_buckets=10_000)
    # exact expected membership at the intended threshold of 2900
    expect = docs.filter(hash_bucket(F.col("doc_id"), 10_000) < 2900).count()
    assert out.count() == expect
