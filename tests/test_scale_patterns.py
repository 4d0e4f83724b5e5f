"""Scale-pattern tests: salted aggregation equivalence, bucketed
co-located joins (shuffle-free), IVF recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.similarity import brute_force_knn, ivf_knn
from real_time_financial_market_data_pipeline_spark.operators.skew import salted_agg
from real_time_financial_market_data_pipeline_spark.plans.inspect import count_shuffles
from real_time_financial_market_data_pipeline_spark.tables import load_table, trades_from_events
from tests.conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    trades = trades_from_events(load_table(spark, SF_DIR, "events"))
    plain = {
        r["symbol"]: (r["volume"], r["high"], r["n"])
        for r in trades.groupBy("symbol")
        .agg(
            F.sum("volume").alias("volume"),
            F.max("price").alias("high"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        r["symbol"]: (r["volume"], r["high"], r["n"])
        for r in salted_agg(
            trades,
            ["symbol"],
            {
                "volume": (F.col("volume"), "sum"),
                "high": (F.col("price"), "max"),
                "n": (F.lit(1), "count"),
            },
        ).collect()
    }
    assert plain == salted


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plan has NO shuffle exchange — the layout answer to
    fact-fact joins at 100 TB."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS od_bucketed")
    # a previously-failed run may leave orphan managed-table dirs behind
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("li_bucketed", "od_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "li_bucketed"
    )
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "od_bucketed"
    )
    # disable broadcast so the plan exercises the bucketed (sort-merge)
    # path — at real fact-fact scale neither side broadcasts anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_bucketed")
            .join(
                spark.table("od_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        # bucket co-location: the join does NOT shuffle, and the aggregate
        # (keyed by a superset of the bucket key) reuses the distribution
        n = count_shuffles(joined)
        assert n == 0, f"expected 0 shuffles on bucketed join+agg, got {n}"
        expected = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "o_orderpriority")
            .distinct()
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS od_bucketed")


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_knn(emb, queries, k=10).collect()
    }
    approx_rows = ivf_knn(emb, queries, k=10, n_lists=16, n_probe=8).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # every query answered with k results, and reasonable overlap with exact
    assert len(approx_rows) == 50
    assert len(exact & approx) / len(exact) > 0.3


def test_correlated_series_blocking_recall(spark):
    """Sign-LSH blocked correlation search vs the exact all-pairs query:
    precision is exact by construction (candidates re-scored with true
    correlation), and recall matches the documented operating points —
    defaults on sparse sf0.001 series >= 0.6, and the sparse-tuned
    k=2 config >= 0.9."""
    from real_time_financial_market_data_pipeline_spark.operators.timeseries import correlated_series_pairs
    from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES, _silver
    from tests.conftest import SF_DIR

    exact_rows = QUERIES["price_path_correlation"](spark, SF_DIR).collect()
    high = {
        tuple(sorted((f"{r['symbol_a']}|{r['date_a']}", f"{r['symbol_b']}|{r['date_b']}")))
        for r in exact_rows
        if r["correlation"] >= 0.8
    }
    assert high  # testdata must actually contain high-corr pairs

    s = _silver(spark, SF_DIR)

    def run(**kw):
        return {
            tuple(sorted((r["id_a"], r["id_b"])))
            for r in correlated_series_pairs(
                s, ["symbol", "trade_date"], "event_time", "price", min_corr=0.8, **kw
            ).collect()
        }

    default = run()
    assert not (default - high)  # exact-verify => zero spurious pairs
    assert len(default & high) / len(high) >= 0.6

    sparse_tuned = run(n_planes=2, n_tables=8)
    assert not (sparse_tuned - high)
    assert len(sparse_tuned & high) / len(high) >= 0.9


def test_aqe_skew_split_activates_on_hot_key_join(spark):
    """Plan-asserted skew handling (round-3 VERDICT task 5): a join
    whose fact side is 90% one hot key gets its skewed partition SPLIT
    by AQE (executed plan carries the `skew=true` SMJ marker) under the
    engine's documented skew posture: broadcast disabled (the
    dim-doesn't-fit case) + forceOptimizeSkewedJoin (without force, AQE
    declines to split any join whose output partitioning a downstream
    agg could reuse — measured 3x slower than naive at 32x sf0.1; see
    SCALE.md 'Skewed joins').  Thresholds are scaled down so the ~2 MB
    test partition counts as skewed; production partition sizes trip the
    256 MB default the same way."""
    ev = load_table(spark, SF_DIR, "events")
    base = trades_from_events(ev).withColumn(
        "symbol",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 9, F.lit("hot")).otherwise(
            F.col("symbol")
        ),
    )
    fact = base
    for _ in range(5):  # 32x: the hot partition must exceed the skew threshold
        fact = fact.unionByName(fact)
    dim = base.groupBy("symbol").agg(F.avg("price").alias("avg_price"))
    dim_path_free = dim.localCheckpoint(eager=True)  # break lineage: dim reads != fact scan
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
    }
    old = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        j = (
            fact.join(dim_path_free, "symbol")
            .groupBy("symbol", "user_id")
            .agg(F.sum(F.col("price") - F.col("avg_price")).alias("x"))
        )
        rows = j.collect()  # execute THIS plan (count() builds its own)
        assert rows
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_repeated_span_pairs_plan_is_equijoin_only(spark):
    """The span-dedup plan must generate candidates through the fp
    equi-join (shuffle hash/sort-merge), never a cross product, and
    stay within its shuffle budget: fingerprint join (2 exchanges) +
    frequency-cap anti-join (reuses the fp key) + run-merge window +
    final span aggregate.  Pinned so a refactor that degrades the join
    to a nested loop or adds an accidental exchange fails here."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import repeated_span_pairs
    from real_time_financial_market_data_pipeline_spark.plans.inspect import count_shuffles, physical_plan
    from real_time_financial_market_data_pipeline_spark.tables import load_table
    from tests.conftest import SF_DIR

    from real_time_financial_market_data_pipeline_spark.operators.dedup import common_spans, excise_common_spans

    docs = load_table(spark, SF_DIR, "documents")
    spans = repeated_span_pairs(docs, k=8, max_fp_docs=50)
    plan = physical_plan(spans)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count_shuffles(spans) <= 6

    # the aggregate + treatment forms share the budget discipline
    cs = common_spans(docs, k=8, min_docs=2)
    assert "CartesianProduct" not in physical_plan(cs)
    assert count_shuffles(cs) <= 3  # fp agg + representative equi-join
    ex = excise_common_spans(docs, cs, k=8)
    assert "CartesianProduct" not in physical_plan(ex)
    assert count_shuffles(ex) <= 7  # spans input + fp join + per-doc agg
