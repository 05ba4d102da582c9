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

# The round-13 rotation, as an EXPLICIT literal (not
# list(registry.DRIVER_WINDOW)): the point of this guard is that an
# accidental edit to DRIVER_WINDOW must be mirrored deliberately here —
# aliasing the registry value made the lockstep check trivially true
# (round-6 advice). The two new r14 queries lead (streaming
# incremental materialized-aggregate maintenance, composite-spec
# conjunctive pruning — a new oracle-backed query takes a window slot
# the round it lands), then the stalest-green cohort computed over
# CORRECTNESS_r01..r13: the 7-query r07 cohort tail
# (text_bpe_train_merges onward), the 40-query r08 cohort, then the
# alphabetical head of the r09 cohort (1 slot) — see registry.py.
PREVIOUSLY_UNCHECKED = [
    "stream_agg_maintenance",
    "warehouse_composite_spec_pruning",
    "text_bpe_train_merges",
    "text_kneser_ney_bigram",
    "text_tokenizer_fertility",
    "vector_ann_near_dup_lsh",
    "vector_sign_ann_topk",
    "window_dedup_latest_wins",
    "window_supplier_daily_gold",
    "agg_conditional_counts",
    "agg_coverage_report",
    "agg_cube_order_stats",
    "agg_distinct_suppliers",
    "agg_monthly_revenue",
    "agg_rollup_revenue",
    "dedup_lsh_recall_report",
    "dedup_ngram_jaccard",
    "filter_date_interval",
    "filter_greatest_least",
    "join_anti_customers_without_orders",
    "join_semi_customers_with_orders",
    "multimodal_audio_near_dup",
    "multimodal_image_dedup_groups",
    "multimodal_image_dedup_incremental",
    "multimodal_image_near_dup",
    "pivot_qty_by_status",
    "quality_psi_drift",
    "sample_perplexity_mixture",
    "sample_soft_dedup_weights",
    "sample_stratified_events",
    "sample_token_budget_mixture",
    "scalar_json_extract",
    "scalar_string_kitchen",
    "set_except_intersect_buyers",
    "stream_image_dedup_incremental",
    "text_bm25_topk",
    "text_chunk_sliding",
    "text_cross_source_contamination",
    "text_fingerprint_groups",
    "text_lang_id",
    "vector_ann_ivf_fixed_topk",
    "vector_ann_pq_fixed_topk",
    "vector_kmeans_assign",
    "window_gap_detection",
    "window_jump_check",
    "window_latest_event_per_user",
    "window_lead_gap_to_next",
    "window_rank_family",
    "window_stale_check",
    "agg_dup_grain_detector",
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
