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
