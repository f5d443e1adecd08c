from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Tests measured at >=6s call time on the reference host (full-suite profile:
# 613 passed in 31:20; this set is ~1,310s of it). They are auto-marked `slow`
# below and excluded by the default `-m "not slow"` (pytest.ini) so the
# driver-budget gate finishes; run everything with `pytest -m ""`.
# Keys are `<file basename>::<test name>` so they match from any rootdir.
SLOW_TESTS = frozenset({
    "test_api.py::test_batch_fast_path_mixed_narrator_filtered_zero_jobs",
    "test_api.py::test_engine_borrows_store_resident_matrix",
    "test_api.py::test_hybrid_search_batch_synonyms_and_fallback",
    "test_api.py::test_hybrid_search_batch_tier_matches_single_calls",
    "test_api.py::test_hybrid_search_returns_ranked_results",
    "test_api.py::test_interactive_mode_equals_batch_path",
    "test_api.py::test_local_tail_adversarial_corpus_equals_batch",
    "test_api.py::test_metadata_filters_restrict_candidates_on_every_tier",
    "test_api.py::test_narrator_intent_uses_narrator_field_leg",
    "test_api.py::test_narrator_leg_fresh_after_upsert",
    "test_api.py::test_sql_tail_still_serves_without_doc_map",
    "test_api.py::test_synonym_groups_local_twin_equals_batch",
    "test_api.py::test_upsert_delta_equals_fresh_enable",
    "test_api.py::test_upsert_delta_skips_recollect",
    "test_api.py::test_upsert_documents_equals_fresh_engine",
    "test_api.py::test_upsert_documents_refreshes_interactive_tiers",
    "test_api.py::test_upsert_past_bound_releases_interactive_tiers",
    "test_bm25.py::test_batch_matches_single_query",
    "test_bm25.py::test_refresh_index_chained_plans_stay_flat",
    "test_bm25.py::test_refresh_index_equals_rebuild",
    "test_bm25.py::test_refresh_index_randomized_rebuild_equivalence",
    "test_bm25.py::test_refresh_index_remove_only_and_base_untouched",
    "test_bm25.py::test_refresh_index_scoring_stays_lazy_without_base_view",
    "test_dedup_textstats.py::test_boilerplate_collapse_bounds_band_state",
    "test_dedup_textstats.py::test_containment_prefix_filter_is_lossless_randomized",
    "test_embedder.py::test_eval_semantic_quality_script_runs_when_model_available",
    "test_embedder.py::test_fake_st_end_to_end_through_executors",
    "test_frame_store.py::test_textsignals_store_matches_in_session",
    "test_index_geometry.py::test_derived_bq_publish_stamps_governed_rerank",
    "test_index_geometry.py::test_derived_ivfadc_publish_stamps_governed_rerank",
    "test_index_geometry.py::test_governed_probe_report_matches_bruteforce",
    "test_index_geometry.py::test_hot_cell_split_re_governs_probe_stamp",
    "test_index_geometry.py::test_publish_derives_and_stamps_geometry",
    "test_index_store.py::test_publish_after_crashed_refresh_discards_stale_journal",
    "test_index_store.py::test_refresh_published_doc_norm_serves_tfidf",
    "test_index_store.py::test_write_refresh_all_buckets_emptied_keeps_store_openable",
    "test_index_store.py::test_write_refresh_crash_before_commit_rolls_back",
    "test_index_store.py::test_write_refresh_crash_mid_commit_rolls_forward",
    "test_index_store.py::test_write_refresh_emptied_bucket_dir_removed",
    "test_index_store.py::test_write_refresh_touches_only_affected_buckets",
    "test_ingest_cli.py::test_book_selection_and_cli_main",
    "test_ingest_cli.py::test_cli_export_vectors_binary",
    "test_ingest_cli.py::test_cli_store_ships_full_quantization_ladder",
    "test_ingest_cli.py::test_index_manifest_gating_and_force",
    "test_ingest_cli.py::test_ingest_delta_manifest_counts_tokenless_docs",
    "test_ingest_cli.py::test_ingest_delta_refresh_equals_rebuild",
    "test_ingest_cli.py::test_ingest_end_to_end_and_idempotent_rerun",
    "test_ingest_cli.py::test_ingest_lsh_delta_on_capped_planes_keeps_identity",
    "test_ingest_cli.py::test_ingest_lsh_store_discriminates_on_offset_doc_ids",
    "test_ingest_cli.py::test_ingest_split_hot_cells_flag_threads_through",
    "test_ingest_cli.py::test_ingest_store_carries_consistent_ivfadc_codes",
    "test_layout.py::test_plan_shape_invariant_across_scale_factors",
    "test_lifecycle_streaming.py::test_drop_duplicates_within_watermark_bounds_state",
    "test_lifecycle_streaming.py::test_matches_oracle[embed_documents_preview]",
    "test_pipeline.py::test_clean_cli_module",
    "test_pipeline.py::test_materialize_clean_corpus_end_to_end",
    "test_plan_hygiene.py::test_no_row_at_a_time_python_and_no_cartesian",
    "test_serving_stdio.py::test_stdio_session_end_to_end",
    "test_vector.py::test_recall_report_scaled_equals_full_form_at_covered_sf",
    "test_vector_store.py::test_bq_batch_parity_with_point_path",
    "test_vector_store.py::test_bq_pack_multiword_and_manifest_identity",
    "test_vector_store.py::test_bq_publish_reopen_pack_and_refresh",
    "test_vector_store.py::test_bq_resident_point_tier_row_identity",
    "test_vector_store.py::test_incremental_split_byte_invariance_and_republish_parity",
    "test_vector_store.py::test_ivfpq_probing_all_cells_degenerates_to_flat_pq",
    "test_vector_store.py::test_ivfpq_publish_then_open_matches_in_session_compose",
    "test_vector_store.py::test_ivfpq_refresh_updates_both_tables_in_one_commit",
    "test_vector_store.py::test_ivfpq_resident_point_tier_row_identity",
    "test_vector_store.py::test_ivfpq_residual_store_matches_in_session_and_refreshes",
    "test_vector_store.py::test_lsh_publish_then_open_matches_in_session_operators",
    "test_vector_store.py::test_lsh_refresh_crash_mid_commit_rolls_forward",
    "test_vector_store.py::test_lsh_refresh_equals_rebuild_and_untouched_buckets_invariant",
    "test_vector_store.py::test_point_batch_row_identical_to_singles",
    "test_vector_store.py::test_refresh_detects_and_splits_hot_cell",
    "test_vector_store.py::test_split_crash_mid_commit_recovers_whole_epoch",
    "test_vector_store.py::test_sq8_manifest_identity_and_split_preserves_tier",
    "test_vector_store.py::test_sq8_multi_refresh_equals_from_scratch_publish",
    "test_vector_store.py::test_sq8_resident_point_tier_row_identity",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{os.path.basename(str(item.fspath))}::{item.name}"
        if key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from hadith_vector_search_spark.session import get_spark

    # Fewer cores/partitions for fast test startup; semantics identical.
    spark = get_spark("pytest", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    from hadith_vector_search_spark.testing import duckdb_connect_views

    return duckdb_connect_views(SF_SMOKE)
