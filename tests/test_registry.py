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

# The round-10 rotation, as an EXPLICIT literal (not
# list(registry.DRIVER_WINDOW)): the point of this guard is that an
# accidental edit to DRIVER_WINDOW must be mirrored deliberately here —
# aliasing the registry value made the lockstep check trivially true
# (round-6 advice). The 10 never-hash-green EAGER queries lead
# (never-hash-green beats stalest-green; converted to lazy
# checked_lazy returns this round), then the 5 never-checked round-10
# additions, then the 35 stalest-green queries (24 last green r04,
# 11 last green r05) — see registry.py.
PREVIOUSLY_UNCHECKED = [
    "source_orc_roundtrip",
    "source_json_roundtrip",
    "source_schema_evolution",
    "scale_zorder_clustering",
    "warehouse_time_travel",
    "warehouse_compact_small_files",
    "stream_snapshot_commits",
    "warehouse_snapshot_cdc",
    "scale_dynamic_partition_pruning",
    "stream_state_store_audit",
    "warehouse_vacuum_audit",
    "warehouse_write_audit_publish",
    "quality_benford_audit",
    "funcs_pairwise_correlation",
    "scale_global_rank_twopass",
    "join_range_volatility_expansion",
    "join_revenue_by_nation",
    "multimodal_frame_sample",
    "sample_source_cap",
    "sample_split_leakage",
    "sample_training_shuffle",
    "scale_exact_percentiles",
    "scale_winsorized_stats",
    "sort_topk_orders",
    "stream_dedup_within_watermark",
    "stream_static_enrich_nation",
    "text_bigram_vocab",
    "text_chunk_overlap",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "union_all_check_streams",
    "unpivot_part_price_bands",
    "vector_label_centroids",
    "vector_label_noise_screen",
    "vector_near_dup_pairs",
    "vector_quantize_int8",
    "window_latest_snapshot_per_supplier",
    "window_sessionization",
    "agg_q11_important_stock",
    "agg_q13_customer_distribution",
    "agg_q14_promo_revenue_pct",
    "agg_q16_supplier_part_counts",
    "agg_q6_forecast_revenue",
    "dedup_component_survivors",
    "dedup_representative_survivors",
    "events_ab_test_lift",
    "events_conversion_survival",
    "events_cuped_adjustment",
    "events_markov_transitions",
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
