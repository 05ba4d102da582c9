"""Registry ordering invariants.

The correctness driver hash-checks only the FIRST 50 entries of
``queries()`` against ``oracle_sql()``, so dict order is load-bearing:
every window slot must be oracle-backed, and rows-only queries must
never displace a checkable one. Rounds 1–2 lost 29 oracle-backed
queries to this (they sat past position 50); these tests pin the fix.
"""

from __future__ import annotations

from market_data_pipeline_databricks_spark.plans import registry

WINDOW = 50

# The round-8 rotation, as an EXPLICIT literal (not
# list(registry.DRIVER_WINDOW)): the point of this guard is that an
# accidental edit to DRIVER_WINDOW must be mirrored deliberately here —
# aliasing the registry value made the lockstep check trivially true
# (round-6 advice). 2 never-driver-checked names lead, then the 48
# stalest-green queries (last green r02/r03/r04) — see registry.py.
PREVIOUSLY_UNCHECKED = [
    "sample_perplexity_mixture",
    "multimodal_image_near_dup",
    "vector_kmeans_assign",
    "sample_token_budget_mixture",
    "text_chunk_sliding",
    "multimodal_image_dedup_groups",
    "multimodal_image_dedup_incremental",
    "stream_image_dedup_incremental",
    "text_cross_source_contamination",
    "text_bm25_topk",
    "sample_soft_dedup_weights",
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "scale_zorder_clustering",
    "multimodal_audio_near_dup",
    "warehouse_erase_rtbf",
    "source_schema_evolution",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "stream_snapshot_commits",
    "dedup_lsh_recall_report",
    "vector_ann_ivf_fixed_topk",
    "quality_psi_drift",
    "warehouse_snapshot_cdc",
    "scale_bucketed_join",
    "vector_ann_pq_fixed_topk",
    "agg_conditional_counts",
    "agg_coverage_report",
    "agg_cube_order_stats",
    "agg_distinct_suppliers",
    "agg_monthly_revenue",
    "agg_rollup_revenue",
    "dedup_ngram_jaccard",
    "filter_date_interval",
    "filter_greatest_least",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "pivot_qty_by_status",
    "sample_stratified_events",
    "scalar_json_extract",
    "scalar_string_kitchen",
    "set_except_intersect_buyers",
    "text_fingerprint_groups",
    "text_lang_id",
    "window_gap_detection",
    "window_jump_check",
    "window_latest_event_per_user",
    "window_lead_gap_to_next",
    "window_rank_family",
    "window_stale_check",
]


def test_window_literal_lockstep():
    # Both directions: every pinned name is in the registry window and
    # the window contains nothing unpinned.
    assert list(registry.DRIVER_WINDOW) == PREVIOUSLY_UNCHECKED


def test_driver_window_fully_oracle_backed():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    window = names[:WINDOW]
    assert all(n in oracle for n in window), [
        n for n in window if n not in oracle
    ]


def test_previously_unchecked_families_in_window():
    window = list(registry.all_queries())[:WINDOW]
    missing = [n for n in PREVIOUSLY_UNCHECKED if n not in window]
    assert not missing, missing


def test_rows_only_queries_sort_last():
    names = list(registry.all_queries())
    oracle = registry.all_oracle_sql()
    flags = [n in oracle for n in names]
    # Once the first rows-only query appears, no oracle-backed query may
    # follow it.
    if False in flags:
        first_rows_only = flags.index(False)
        assert True not in flags[first_rows_only:], names[first_rows_only:]


def test_window_names_exist_and_exact():
    q = registry.all_queries()
    assert len(registry.DRIVER_WINDOW) == WINDOW
    unknown = [n for n in registry.DRIVER_WINDOW if n not in q]
    assert not unknown, unknown


def test_every_query_runnable_signature():
    # Each registry value is a (spark, sf_dir) callable; catch accidental
    # registration of partials/strings at import time.
    for name, fn in registry.all_queries().items():
        assert callable(fn), name
