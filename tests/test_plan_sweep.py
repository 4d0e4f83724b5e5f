"""Catalog-wide plan sweep: every one of the 50+ queries must compile
to a plan free of accidental cross products, and metadata-ish queries
must not read unreferenced wide columns.

Quadratic-by-contract operators (exact all-pairs baselines) are the
only allowed nested-loop plans."""

from __future__ import annotations

import pytest

from real_time_financial_market_data_pipeline_spark.plans.inspect import physical_plan
from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES
from tests.conftest import SF_DIR

# exact all-pairs ground-truth operators: quadratic by contract
# (near_dup_clusters inherits the cross join from its ngram-pairs input —
# the clustering itself is equi-join + hash-agg rounds)
ALLPAIRS_OK = {
    "ngram_jaccard_pairs",
    "embedding_near_dups",
    "fuzzy_name_pairs",
    "near_dup_clusters",
    # certificate-time exact all-pairs reference for the simhash
    # equivalence check (operators/certify.py::simhash_certificate) —
    # quadratic by declared design, never the operator's own plan
    "approx_soundness_certificates",
}


# Per-query plan budget, pinned at sf0.001 (plan shapes are
# SF-independent pre-AQE): (max_shuffles, requires_broadcast_hash_join,
# min_scans_with_pushed_filters).  A refactor that adds an exchange,
# drops a dim-join broadcast, or loses a pushed-down filter fails here
# before it ships — and ADDING a query without pinning its budget fails
# the completeness check below (round-2 VERDICT task 8).
PLAN_BUDGET: dict[str, tuple[int, bool, int]] = {
    "silver_trades": (1, False, 1),
    "validation_metrics": (1, False, 0),
    "dead_letters": (0, False, 0),
    "ohlcv_5m": (2, False, 1),
    "ohlcv_1h": (2, False, 1),
    "latest_prices": (2, False, 1),
    "pipeline_status": (5, False, 2),
    "volume_by_symbol_on_date": (3, False, 1),
    "latest_bars_per_symbol": (3, False, 1),
    "avg_ingest_latency": (2, False, 1),
    "market_hours_trades": (2, False, 1),
    "pricing_summary": (1, False, 1),
    "top_revenue_orders": (1, True, 3),
    "nation_revenue": (1, True, 5),
    "customers_without_orders": (0, True, 1),
    "priority_count_returned": (1, True, 2),
    "top_customers_per_nation": (1, True, 2),
    "supplier_part_stats": (2, True, 2),
    "asof_purchase_view": (1, False, 2),
    "doc_profile": (0, False, 0),
    "dedup_exact_docs": (1, False, 0),
    "ngram_jaccard_pairs": (0, False, 1),
    "near_dup_clusters": (0, False, 0),
    "doc_chunks": (0, False, 0),
    "knn_bruteforce": (2, False, 1),
    "monthly_order_stats": (1, False, 0),
    "orders_vs_avg": (1, False, 1),
    "supplier_customer_balance": (4, True, 1),
    "best_quote_per_trade": (2, True, 2),
    "part_name_analysis": (2, False, 0),
    "signup_purchase_funnel": (2, False, 0),
    "weekly_cohort_retention": (3, True, 2),
    "rolling_features": (2, False, 1),
    "fuzzy_name_pairs": (0, False, 2),
    "daily_price_path": (2, False, 1),
    "price_path_correlation": (5, True, 2),
    "sessionize_events": (1, False, 1),
    "ohlcv_5m_sliding": (2, False, 1),
    "multidim_aggregates": (2, False, 0),
    "pivot_status_by_priority": (2, False, 0),
    "running_revenue_per_customer": (1, False, 0),
    "day_over_day_volume": (3, False, 1),
    "price_percentiles": (2, False, 1),
    "active_buyer_segments": (4, True, 2),
    "distinct_users_by_type": (2, False, 0),
    "media_metadata": (1, True, 0),
    "dataset_split": (0, False, 0),
    "embedding_near_dups": (0, False, 2),
    "bpe_token_stats": (0, False, 0),
    # re-pinned round 5 (+22 shuffles, +24 pushed scans): the recall-floor,
    # planted-duplicate and decontamination completeness legs added five
    # certificate pipelines to the union; re-pinned round 6 (+7 shuffles,
    # +11 pushed scans): the repetition_metrics leg re-derives three
    # ratios relationally (explode + positional self-join + two-level
    # groupBy)
    # re-pinned round 7 (twice): +2 exchanges / +2 filtered scans from
    # the span_certificate leg (fp equi-join + run-merge window on the
    # bounded planted subcorpus), then +4/+3 from the span-level
    # decontamination leg (two fp fingerprint sides + flag agg +
    # anti-join, bounded planted pages)
    "approx_soundness_certificates": (74, True, 65),  # r8: +7 surgical-decontam legs (excise + residue re-detect)
    "decontaminated_docs": (4, True, 3),
    "minhash_near_dups": (1, True, 0),
    "simhash_near_dups": (1, True, 2),
    "fuzzy_name_pairs_blocked": (0, True, 2),
    "price_path_correlation_blocked": (17, True, 6),
    "approx_distinct_users": (1, False, 0),
    "media_decode_features": (0, False, 0),
    "embedding_near_dups_lsh": (1, True, 4),
    "knn_ivf": (2, True, 1),
    "knn_lsh": (2, True, 1),
}


def test_every_query_has_a_plan_budget():
    missing = sorted(set(QUERIES) - set(PLAN_BUDGET))
    stale = sorted(set(PLAN_BUDGET) - set(QUERIES))
    assert not missing, f"new queries without a pinned plan budget: {missing}"
    assert not stale, f"budget entries for removed queries: {stale}"


@pytest.mark.parametrize("name", sorted(PLAN_BUDGET))
def test_plan_within_budget(spark, name):
    from real_time_financial_market_data_pipeline_spark.plans.inspect import count_shuffles, pushed_filters

    if name not in QUERIES:
        pytest.skip("covered by test_every_query_has_a_plan_budget")
    max_shuffles, needs_bhj, min_pushed = PLAN_BUDGET[name]
    df = QUERIES[name](spark, SF_DIR)
    n = count_shuffles(df)
    assert n <= max_shuffles, (
        f"{name}: {n} shuffles > pinned budget {max_shuffles} — a refactor "
        "added an exchange; either remove it or consciously re-pin"
    )
    if needs_bhj:
        assert "BroadcastHashJoin" in physical_plan(df, "simple"), (
            f"{name}: dimension join lost its broadcast"
        )
    pushed = [p for p in pushed_filters(df) if p.strip()]
    assert len(pushed) >= min_pushed, (
        f"{name}: only {len(pushed)} scans carry pushed filters "
        f"(pinned minimum {min_pushed}) — a filter stopped reaching the scan"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cross_products(spark, name):
    plan = physical_plan(QUERIES[name](spark, SF_DIR), "simple")
    if name in ALLPAIRS_OK:
        return
    # CartesianProduct / BroadcastNestedLoopJoin are legitimate only when
    # one side is bounded-tiny by construction: the knn query-vector set,
    # or a 1-row scalar aggregate (orders_vs_avg, pipeline_status)
    one_row_side_ok = {"knn_bruteforce", "orders_vs_avg", "pipeline_status"}
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        assert name in one_row_side_ok, f"{name} has an unbounded non-equi join"


def test_text_queries_do_not_read_unused_doc_columns(spark):
    from real_time_financial_market_data_pipeline_spark.plans.inspect import scan_read_schemas

    # doc_profile needs doc_id/lang/n_chars/text — `source` pruned
    schemas = " ".join(scan_read_schemas(QUERIES["doc_profile"](spark, SF_DIR)))
    assert "source" not in schemas


def test_allpairs_whitelist_entries_are_documented():
    """Growth guard (round-3 VERDICT task 9): ALLPAIRS_OK is the ONLY
    escape hatch from the cross-product sweep, so every entry must (a)
    still exist and (b) declare its quadratic contract in its own query
    source — adding a name here without documenting why it may go
    all-pairs fails this test, and an undocumented quadratic plan fails
    test_no_accidental_cross_products.  Together: no silent quadratic
    growth in either direction."""
    import inspect
    import re

    stale = sorted(ALLPAIRS_OK - set(QUERIES))
    assert not stale, f"ALLPAIRS_OK entries for removed queries: {stale}"
    undocumented = [
        n
        for n in sorted(ALLPAIRS_OK)
        if not re.search(
            r"quadratic|all-pairs|all pairs", inspect.getsource(QUERIES[n]), re.I
        )
    ]
    assert not undocumented, (
        "ALLPAIRS_OK entries whose query source does not declare the "
        f"quadratic contract: {undocumented}"
    )


# ---------------------------------------------------------------------------
# recorded plan snapshots (round-5 VERDICT task 7): exact Exchange count +
# per-scan ReadSchema for every oracle-backed query, diffed against
# tests/plan_snapshots.json.  The budgets above catch regressions past a
# bound; the snapshot catches ANY drift — a scan that silently widens, an
# exchange that appears below the budget line, a scan added or dropped.
# Regenerate intentionally with: PLAN_SNAPSHOT_UPDATE=1 pytest
#   tests/test_plan_sweep.py::test_plan_snapshots
# and review the JSON diff like any other code change.
# ---------------------------------------------------------------------------

import json
import os

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")


def _current_plan_snapshot(spark) -> dict:
    from real_time_financial_market_data_pipeline_spark.plans.inspect import (
        count_shuffles,
        scan_tables_and_schemas,
    )
    from real_time_financial_market_data_pipeline_spark.serving.queries import ORACLE_SQL

    out = {}
    for name in sorted(ORACLE_SQL):
        df = QUERIES[name](spark, SF_DIR)
        out[name] = {
            "exchanges": count_shuffles(df),
            "scans": sorted(f"{t}: {s}" for t, s in scan_tables_and_schemas(df)),
        }
    return out


def test_plan_snapshots(spark):
    current = _current_plan_snapshot(spark)
    if os.environ.get("PLAN_SNAPSHOT_UPDATE") == "1":
        with open(SNAPSHOT_PATH, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
            fh.write("\n")
        return
    assert os.path.exists(SNAPSHOT_PATH), (
        "no recorded snapshot; run PLAN_SNAPSHOT_UPDATE=1 pytest "
        "tests/test_plan_sweep.py::test_plan_snapshots"
    )
    with open(SNAPSHOT_PATH) as fh:
        recorded = json.load(fh)
    missing = sorted(set(current) - set(recorded))
    stale = sorted(set(recorded) - set(current))
    assert not missing, f"oracle-backed queries without a recorded plan snapshot: {missing}"
    assert not stale, f"snapshot entries for removed queries: {stale}"
    diffs = []
    for name in sorted(current):
        rec, cur = recorded[name], current[name]
        if rec == cur:
            continue
        lines = [f"{name}:"]
        if rec["exchanges"] != cur["exchanges"]:
            lines.append(f"  exchanges: recorded {rec['exchanges']} -> now {cur['exchanges']}")
        for s in sorted(set(rec["scans"]) - set(cur["scans"])):
            lines.append(f"  -scan {s}")
        for s in sorted(set(cur["scans"]) - set(rec["scans"])):
            lines.append(f"  +scan {s}")
        diffs.append("\n".join(lines))
    assert not diffs, (
        "plan drift vs recorded snapshot (re-pin with PLAN_SNAPSHOT_UPDATE=1 "
        "only if the change is intentional):\n" + "\n".join(diffs)
    )
