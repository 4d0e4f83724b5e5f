"""Plan-quality assertions: the scale posture, machine-checked.

Every headline operator must (a) push its filters into the parquet
scan, (b) prune the read schema to referenced columns, (c) broadcast
genuinely small dimensions, (d) not shuffle more than the algorithm
requires."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_financial_market_data_pipeline_spark.operators.asof import asof_join
from real_time_financial_market_data_pipeline_spark.operators.ohlcv import ohlcv
from real_time_financial_market_data_pipeline_spark.plans.inspect import (
    count_shuffles,
    has_broadcast_hash_join,
    pushed_filters,
    scan_read_schemas,
)
from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES
from real_time_financial_market_data_pipeline_spark.tables import load_table, trades_from_events
from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")).select(
        "l_orderkey", "l_quantity"
    )
    pushed = " ".join(pushed_filters(q))
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed}"


def test_column_pruning_reaches_scan(spark):
    q = QUERIES["pricing_summary"](spark, SF_DIR)
    schemas = scan_read_schemas(q)
    assert schemas, "no scan found"
    # 16-col lineitem pruned to the 7 referenced columns
    assert all(s.count(",") <= 7 for s in schemas), schemas
    assert all("l_orderkey" not in s for s in schemas), "unreferenced col read"


def test_small_dims_broadcast(spark):
    q = QUERIES["nation_revenue"](spark, SF_DIR)
    assert has_broadcast_hash_join(q)


def test_ohlcv_is_single_shuffle(spark):
    trades = trades_from_events(load_table(spark, SF_DIR, "events"))
    bars = ohlcv(trades, "5 minutes")
    # one hash aggregate = one exchange on (symbol, window)
    assert count_shuffles(bars) == 1


def test_asof_join_is_single_shuffle(spark):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("event_time"), "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("event_time"), F.col("value").alias("view_value")
    )
    out = asof_join(purchases, views, on=["user_id"])
    # union + one window over user_id: exactly one exchange, NO range/cross join
    assert count_shuffles(out) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_topk_uses_window_group_limit(spark):
    q = QUERIES["latest_bars_per_symbol"](spark, SF_DIR)
    from real_time_financial_market_data_pipeline_spark.plans.inspect import physical_plan

    plan = physical_plan(q, "simple")
    # rank pushdown: per-partition top-k before the final window sort
    assert "WindowGroupLimit" in plan


def test_metadata_query_prunes_unused_columns(spark):
    # distinct_users_by_type reads props since round 5 (it absorbed the
    # props_json_extract slot) but still never touches ts/event_id —
    # the scan must prune both
    q = QUERIES["distinct_users_by_type"](spark, SF_DIR)
    schemas = " ".join(scan_read_schemas(q))
    assert "ts" not in schemas and "event_id" not in schemas
    # the sketch twin reads neither props nor ts/event_id
    schemas2 = " ".join(scan_read_schemas(QUERIES["approx_distinct_users"](spark, SF_DIR)))
    assert "props" not in schemas2 and "ts" not in schemas2


def test_interval_join_is_equi_join_not_nested_loop(spark):
    """Without ANY equality key, a raw time-range join can only run as
    nested-loop; the bucketized interval join must plan as a hash/merge
    EQUI-join on the bucket key."""
    from datetime import datetime, timedelta

    from real_time_financial_market_data_pipeline_spark.operators.rangejoin import interval_join
    from real_time_financial_market_data_pipeline_spark.plans.inspect import physical_plan

    t0 = datetime(2024, 1, 15, 12, 0, 0)
    left = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=i * 10)) for i in range(100)],
        "lid int, event_time timestamp",
    )
    right = spark.createDataFrame(
        [(i, t0 + timedelta(seconds=i * 7)) for i in range(100)],
        "rid int, event_time timestamp",
    )
    plan = physical_plan(interval_join(left, right, max_gap_seconds=60), "simple")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # it IS a join — an equi hash/sort-merge one


def test_jvm_knn_has_partial_group_limit(spark):
    """brute_force_knn (JVM strategy): the shuffle must carry only
    O(k x queries x partitions) rows — Spark's InferWindowGroupLimit
    plants a PARTIAL WindowGroupLimit below the rank exchange (one
    above it finishes).  Two nodes in the plan == the per-partition
    partial top-k is real (round-2 VERDICT task 7)."""
    from real_time_financial_market_data_pipeline_spark.operators.similarity import brute_force_knn
    from real_time_financial_market_data_pipeline_spark.plans.inspect import physical_plan

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = physical_plan(brute_force_knn(emb, q, k=10), "simple")
    assert plan.count("WindowGroupLimit") == 2, plan[:1500]
    # and the partial one sits BELOW the exchange: the plan tree prints
    # top-down, so the pattern Exchange ... WindowGroupLimit must occur
    # after the first WindowGroupLimit
    first_wgl = plan.index("WindowGroupLimit")
    exchange = plan.index("Exchange", first_wgl)
    assert "WindowGroupLimit" in plan[exchange:], plan[:1500]


def test_span_treatments_add_no_unnecessary_shuffles(spark):
    """Round-8 span operators, plan-pinned: merged_common_spans costs
    exactly ONE exchange over common_spans (the rep_id window — the
    island groupBy reuses its partitioning, since HashPartitioning on
    rep_id satisfies clustering on (rep_id, _island)); the splice-safe
    split excision's segmentation is pure map-side array work, so it
    shuffles exactly as much as the concatenating form."""
    from real_time_financial_market_data_pipeline_spark.operators.dedup import (
        common_spans,
        excise_common_spans,
        merged_common_spans,
        split_excise_common_spans,
    )

    docs = load_table(spark, SF_DIR, "documents")
    cs = common_spans(docs, k=8, min_docs=2)
    n_cs = count_shuffles(cs)
    assert count_shuffles(merged_common_spans(docs, k=8, min_docs=2)) == n_cs + 1
    ex = excise_common_spans(docs.select("doc_id", "text"), cs, k=8)
    sp = split_excise_common_spans(docs.select("doc_id", "text"), cs, k=8)
    assert count_shuffles(sp) == count_shuffles(ex)
    for df in (ex, sp):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
