from __future__ import annotations

import pytest

from real_time_financial_market_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"

# --- two-tier suite (round-21, r20 VERDICT item 2) ---------------------
# The driver's verify budget truncated the ~33-40 min full suite at ~78%
# with zero failures shown (r20), so the long tier is opt-in via
# `-m heavy` (pytest.ini deselects it by default; `-m ""` runs all).
#
# Selection criteria, auditable here in one place (measured durations:
# /tmp/pytest_r21_full.out, full run 463 passed in 1974 s on the r21
# round-start HEAD): every test that measured >= 8 s EXCEPT the
# correctness gates that must stay in the default tier (oracle parity,
# plan sweep/snapshots, driver contract, certificate-firing tests, the
# curated-pipeline end-to-end, and the core exact-dedup property), plus
# every live processingTime-trigger test regardless of duration (they
# flake under co-tenant contention — the one r20 driver "failure" class).
# Default tier measured sum ≈ 13 min on this box.
#
# Parametrized tests are matched by their base id (everything before
# the "[").
HEAVY_TESTS = {
    "test_annserve.py::test_streaming_ann_matches_batch_operator",
    "test_compaction_guard.py::test_compact_best_quote_with_uncommitted_tail_survives_replay",
    "test_compaction_guard.py::test_compact_gold_with_uncommitted_tail_survives_replay",
    "test_compaction_guard.py::test_compaction_crash_sweep_every_fs_mutation",
    "test_compaction_guard.py::test_inline_compaction_crash_mid_drain_restart_converges",
    "test_compaction_guard.py::test_quote_job_inline_fold_survives_reader_hammer",
    "test_curation_pipeline.py::test_auto_delta_high_affected_fraction_falls_back_to_full",
    "test_curation_pipeline.py::test_auto_publish_serving_never_stale_across_cuts_and_fold",
    "test_curation_pipeline.py::test_curated_pipeline_crash_replay_reproduces_state",
    "test_curation_pipeline.py::test_curated_view_ignores_uncommitted_generation",
    "test_curation_pipeline.py::test_delta_cut_refuses_changed_finalize_settings",
    "test_curation_pipeline.py::test_delta_publish_after_refinalize_full_cut",
    "test_curation_pipeline.py::test_delta_publish_filename_guard_falls_back_to_full",
    "test_curation_pipeline.py::test_eager_prune_crash_sweep_per_dir_swap_atomic",
    "test_curation_pipeline.py::test_finalize_recovers_crashed_compaction_before_reading_history",
    "test_curation_pipeline.py::test_flat_layout_reset_also_clears_stale_commit_markers",
    "test_curation_pipeline.py::test_fold_crash_state_enumeration_reader_invariant",
    "test_curation_pipeline.py::test_fold_under_concurrent_reader_and_grace_sweep",
    "test_curation_pipeline.py::test_fused_prune_applied_mark_skips_repeat_compactions",
    "test_curation_pipeline.py::test_fused_prune_rides_compaction_and_stays_equivalent",
    "test_curation_pipeline.py::test_incremental_finalize_equals_full_recompute",
    "test_curation_pipeline.py::test_monotone_ids_postings_pruning_sound_and_bounded",
    "test_curation_pipeline.py::test_postings_compaction_crash_sweep_recovers_fused_prune",
    "test_curation_pipeline.py::test_publish_and_prune_crash_recovery_paths",
    "test_curation_pipeline.py::test_publish_bucketed_delta_reuses_untouched_buckets",
    "test_curation_pipeline.py::test_publish_bucketed_republish_under_concurrent_reader",
    "test_curation_pipeline.py::test_refinalize_applies_new_policy_like_a_fresh_corpus",
    "test_curation_pipeline.py::test_refinalize_lower_min_docs_reprunes_despite_applied_mark",
    "test_curation_pipeline.py::test_refinalize_restores_policy_on_failed_cut",
    "test_curation_pipeline.py::test_replayed_uncommitted_batch_settled_rows_linger_soundly",
    "test_curation_pipeline.py::test_serving_publish_crash_sweep_catalog_reads_survive",
    "test_incremental.py::test_auto_compaction_cadence",
    "test_incremental.py::test_compact_with_uncommitted_tail_survives_replay",
    "test_incremental.py::test_incremental_span_index_matches_batch_recompute",
    "test_incremental.py::test_ingest_time_span_decontamination",
    "test_incremental.py::test_repair_internal_index_matches_recompute",
    "test_properties.py::test_asof_join_invariants",
    "test_properties.py::test_delta_finalize_unaffected_docs_are_invariant",
    "test_properties.py::test_excise_common_spans_invariants",
    "test_properties.py::test_excise_internal_repeats_invariants",
    "test_properties.py::test_excise_verify_subset_is_sound",
    "test_properties.py::test_hamming_pairs_multi_segment_equivalence",
    "test_properties.py::test_merge_span_stats_is_exact_for_any_batching",
    "test_properties.py::test_merged_common_spans_coverage_identity",
    "test_properties.py::test_signature_jaccard_estimator_properties",
    "test_properties.py::test_split_excise_common_spans_invariants",
    "test_properties.py::test_star_components_match_union_find",
    "test_properties.py::test_streaming_near_dup_keeps_footer_sharers",
    "test_stateful.py::test_idle_symbol_state_ttl_eviction",
    "test_stateful.py::test_ttl_bounds_state_under_symbol_churn",
    "test_streaming.py::test_checkpoint_restart_with_added_nullable_column",
    "test_streaming.py::test_exactly_once_across_mid_drain_crash_chained",
    "test_streaming.py::test_inline_compaction_bounds_dirs_on_live_processing_time_stream",
    "test_streaming_extras.py::test_doc_stream_excise_spans_post_drain",
    "test_streaming_extras.py::test_processing_time_trigger_and_graceful_stop",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        base = base.removeprefix("tests/")
        if base in HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
